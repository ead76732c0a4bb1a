package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs graft_dot into a fresh session via the
  * spark.sql.extensions mechanism, and the native expression computes
  * the exact sequential left fold.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft_dot is available via SparkSessionExtensions in SQL") {
    // the shared test session (if any) must step aside so the builder
    // actually constructs a session with the extension applied
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s.sql("SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(v == 32.0)
      val n = s.sql("SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS d")
        .collect()(0)
      assert(n.isNullAt(0), s"expected null, got row: $n schema=${n.schema}")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketing demonstrates the co-located-join scale path (SURVEY.md
  * §7 / builder mandate): two tables bucketed on the join key join
  * WITHOUT a shuffle exchange — the layout that matters when both
  * sides are 100 TB facts and a broadcast is impossible.
  */
class BucketingSpec extends SparkSpec {

  test("join of tables bucketed on the key plans without a shuffle exchange") {
    val warehouse = Files.createTempDirectory("bucket").toString
    val o = Tables.orders(spark, Sf0001)
    val l = Tables.lineitem(spark, Sf0001)
    o.write.mode("overwrite").option("path", s"$warehouse/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").option("path", s"$warehouse/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      // disable broadcast so the bucketed layout (not a broadcast)
      // must carry the join
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("lineitem_b")
          .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        // the join itself needs no Exchange: both sides are pre-bucketed
        // on the key (the later groupBy may still shuffle)
        val joinSection = plan.split("HashAggregate").last
        assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
          s"expected a non-broadcast join:\n$plan")
        assert(!joinSection.contains("Exchange"),
          s"expected bucket-co-located join without Exchange below the join:\n$plan")
        // and it still computes the right answer
        val viaBuckets = joined.orderBy("o_orderpriority").collect().toSeq
        val direct = l.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority").collect().toSeq
        assert(viaBuckets == direct)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}

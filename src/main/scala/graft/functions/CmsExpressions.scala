package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg

/** SQL-name registration for Spark's OWN Count-Min-Sketch aggregate.
  *
  * `CountMinSketchAgg` ships in every Spark distribution (it backs the
  * public `DataFrameStatFunctions.countMinSketch`) but, like the Bloom
  * pair in [[BloomExpressions]], OSS Spark does not expose it in the
  * SQL function registry. The frequency-sketch pattern it enables is
  * the 100 TB answer to "how often does each of THESE keys occur"
  * without a corpus-wide groupBy: one pass folds the whole stream into
  * a kilobyte-scale (depth × width) counter grid whose merge is
  * element-wise addition (order-independent, safe at any parallelism),
  * and any key's count is then readable from the sketch alone with the
  * classic CM guarantees — never an undercount, and an overcount of at
  * most eps·N with probability ≥ confidence.
  *
  *  - graft_cms_agg(key, eps, confidence, seed) → BINARY sketch
  *    (eps/confidence/seed must be foldable literals; fixed seed keeps
  *    the sketch — and everything derived from it — deterministic).
  *
  * Point queries against the sketch are driver-side model-state reads
  * (`CountMinSketch.readFrom(bytes).estimateCount`), the same class of
  * collect as a Lloyd centroid fetch — the sketch is ~100 KB however
  * big the data was.
  */
object CmsExpressions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_agg",
      exprs => new CountMinSketchAgg(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
}

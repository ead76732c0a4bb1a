package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-name registration for Spark's OWN Bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` ship in every
  * Spark distribution — they are what AQE's InjectRuntimeFilter plants
  * under join builds — but OSS Spark does not expose them in the
  * public function registry. The membership-prefilter pattern they
  * enable is a first-class 100 TB technique in its own right (ship a
  * kilobyte-scale sketch of a huge key set to every executor instead
  * of shuffling the key set; Bloom "no" answers are DEFINITE, so only
  * the "maybe" residue needs the exact join), so the engine registers
  * them under graft_ names the same way it registers its native
  * vector expressions — no new sketch implementation, Spark's own
  * battle-tested one (deterministic hashing, order-independent
  * bitwise-OR merge: the aggregate is safe for any parallelism).
  *
  *  - graft_bloom_agg(xxhash64(key), estItems, numBits) → BINARY sketch
  *  - graft_might_contain(sketch, xxhash64(key)) → BOOLEAN
  */
object BloomExpressions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks / ntiles WITHOUT a corpus-sized single-partition
  * sort.
  *
  * The classic scale-killer in quantile queries is `row_number()` /
  * `ntile(k)` `OVER (ORDER BY …)`: Spark satisfies the global order by
  * moving EVERY row to one partition — at 100 TB that is one executor
  * sorting the corpus. This helper computes the identical 1-based
  * global rank with the two-level technique q_concurrency introduced
  * (Windows.scala): a DETERMINISTIC coarse bucket, monotone in the
  * sort key, splits the corpus into parallel groups; each bucket ranks
  * locally (a WindowExec PARTITIONED by bucket — parallel); and the
  * per-bucket row counts — bucket-grain, ≤ `buckets` rows per
  * dimension, i.e. model state like the IVF codebooks — are collected
  * once, prefix-summed on the driver, and broadcast back as each
  * bucket's rank offset:
  *
  *   global_rank = offset(bucket) + local_rank_within_bucket
  *
  * Correctness does NOT depend on partition placement: the bucket is a
  * pure function of the row value (no spark_partition_id, no sampled
  * RangePartitioner boundaries), so the counts pass and the rank pass
  * agree under any scheduling, and re-computation of a multi-consumer
  * plan can never skew. Equal-width buckets over [min, max] keep the
  * expected bucket size at N/B for value-uniform columns; a skewed
  * column degrades to its biggest bucket's size, never to N.
  */
object ScaleRank {

  /** One rank dimension: (bucketing value, full tie-broken ascending
    * order, output rank column). For a DESCENDING metric pass `.desc`
    * order columns and the NEGATED metric as `value`, so the bucket
    * stays monotone with the order. `value` must be non-null and
    * numeric (orderable through a double cast — monotone for
    * ints/decimals). The non-null contract is ENFORCED: the model
    * aggregate counts each dim alongside the row total and the call
    * fails loudly on any NULL (a silently dropped null bucket would
    * make ranks a non-permutation with no visible error). */
  type Dim = (Column, Seq[Column], String)

  // (observability for the bucket-skew edge — the worst-bucket mass
  // fraction — is reported through the per-call `skewSink` parameter
  // of withGlobalRanks; a former object-level `lastMaxBucketFraction`
  // var raced under concurrent queries and was overwritten per call
  // within multi-rank queries, so a reader could observe another
  // query's value)

  /** A dimension whose equal-width worst bucket exceeds this multiple
    * of the ideal N/B mass gets boundary REFINEMENT (below): the
    * outlier-stretched-range failure — one huge value inflates
    * [min,max] so every real row lands in bucket 0 — collapses back
    * to ~even buckets. The irreducible floor that remains is a single
    * VALUE carrying a large mass fraction: the bucket is a pure
    * function of the value (that is what makes the two passes agree
    * under any scheduling), so equal sort-key rows cannot be split —
    * they rank within one bucket, and the `skewSink` callback of
    * `withGlobalRanks` reports it. */
  private val SkewFactor = 8L

  /** Bucket id from ascending boundary literals: number of boundaries
    * ≤ value — monotone in the value, pure, O(|bounds|) codegen'd
    * HOF (bounds stay ≤ a few thousand literals). */
  private def boundaryBucket(value: Column, bounds: Array[Double]): Column =
    if (bounds.isEmpty) lit(0L)
    else size(filter(lit(bounds), b => b <= value.cast("double"))).cast("long")

  /** Skew refinement — EXACT and sample-free (a hash-gated sample
    * cannot see value mass: every row of a heavy value hashes alike,
    * so the value gets one vote regardless of holding half the
    * corpus). Up to 3 rounds; each round is ONE aggregate scan
    * returning per-bucket (count, min, max) — ≤ |bounds| rows of
    * driver model state. A bucket above the skew bar whose range
    * spans >1 value gets (a) a boundary at nextUp(min) — a heavy
    * MINIMUM value is isolated into its own bucket immediately (the
    * zipf head) — and (b) 15 equal-width sub-boundaries over its
    * OBSERVED [min,max] — zooming into the dense range and shedding
    * outlier stretch geometrically. Single-value buckets are the
    * documented irreducible floor and stop refining. Ranks are exact
    * under ANY pure monotone bucketing (the counts and rank passes
    * share the same literal boundaries), so all of this affects
    * parallelism only.
    * @return (bucket expression, (bucketId, count) rows) */
  private def refineBuckets(df: DataFrame, value: Column, total: Long,
      buckets: Int, lo: Double, hi: Double): (Column, Array[(Long, Long)]) = {
    val idealMax = SkewFactor * math.max(total / buckets, 1L)
    var bounds: Array[Double] =
      if (hi == lo) Array.empty
      else (1 until buckets).map(i => lo + (hi - lo) * i / buckets).toArray
    var rounds = 0
    while (true) {
      val bexpr = boundaryBucket(value, bounds)
      val stats = df.groupBy(bexpr.as("__b"))
        .agg(count(lit(1)).as("c"), min(value.cast("double")).as("mn"),
          max(value.cast("double")).as("mx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      val heavy = stats.filter(s => s._2 > idealMax && s._3 < s._4)
      if (heavy.isEmpty || rounds >= 3)
        return (bexpr, stats.map(s => (s._1, s._2)))
      val extra = heavy.flatMap { case (_, _, mn, mx) =>
        Math.nextUp(mn) +: (1 until 16).map(i => mn + (mx - mn) * i / 16)
      }
      bounds = (bounds ++ extra).distinct.sorted
      rounds += 1
    }
    sys.error("unreachable")
  }

  /** Adds one exact 1-based global-rank column per dimension, plus
    * `nCol` = total row count — with ALL model state gathered in two
    * jobs regardless of how many dimensions rank (one combined min/max
    * aggregate, one exploded (dim, bucket) count pass), so ranking k
    * metrics costs k parallel window passes and exactly two cheap
    * column-pruned scans, never 2k.
    *
    * No global sort, no unpartitioned WindowExec anywhere in the plan
    * (PlanAuditSpec pins the call sites).
    */
  def withGlobalRanks(df: DataFrame, dims: Seq[Dim], nCol: String,
      buckets: Int = 256, skewSink: Double => Unit = _ => ()): DataFrame = {
    val aggs = dims.zipWithIndex.flatMap { case ((v, _, _), i) =>
      Seq(min(v.cast("double")).as(s"__lo$i"), max(v.cast("double")).as(s"__hi$i"),
        count(v).as(s"__nn$i"))
    } :+ count(lit(1)).as("__rows")
    val mm = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val rows = mm.getLong(3 * dims.size)
    if (rows == 0L)
      return dims.foldLeft(df) { case (d, (_, _, rc)) =>
        d.withColumn(rc, lit(0L))
      }.withColumn(nCol, lit(0L))
    dims.zipWithIndex.foreach { case ((_, _, rc), i) =>
      val nn = mm.getLong(3 * i + 2)
      require(nn == rows, s"ScaleRank.withGlobalRanks: dim '$rc' has " +
        s"${rows - nn} NULL value(s) out of $rows rows — the rank value " +
        "must be non-null (a silently dropped null bucket would make " +
        "ranks a non-permutation)")
    }
    val bExprs = dims.zipWithIndex.map { case ((v, _, _), i) =>
      val (lo, hi) = (mm.getDouble(3 * i), mm.getDouble(3 * i + 1))
      if (hi == lo) lit(0L)
      else least(
        floor((v.cast("double") - lit(lo)) / lit((hi - lo) / buckets)),
        lit(buckets - 1L)).cast("long")
    }
    val withB0 = bExprs.zipWithIndex.foldLeft(df) { case (d, (b, i)) =>
      d.withColumn(s"__b$i", b)
    }
    // ONE counts pass for every dimension: explode each row into its
    // (dim, bucket) memberships, then a single hash aggregate (for a
    // single dimension the explode is pure overhead — group directly)
    val cnt0 =
      if (dims.size == 1)
        withB0.groupBy(col("__b0")).agg(count(lit(1)).as("c"))
          .collect().map(r => (0, r.getLong(0), r.getLong(1)))
      else withB0
        .select(explode(array(dims.indices.map(i =>
          struct(lit(i).as("dim"), col(s"__b$i").as("b"))): _*)).as("e"))
        .groupBy(col("e.dim").as("dim"), col("e.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val total = cnt0.filter(_._1 == 0).map(_._3).sum
    // skew refinement (rare path): a dimension whose worst equal-width
    // bucket exceeds SkewFactor × the ideal N/B mass — e.g. an
    // outlier-stretched [min,max] that drops every real row into
    // bucket 0 — gets exact boundary refinement ([[refineBuckets]]).
    // Ranks are exact under ANY pure monotone bucketing (the counts
    // and rank passes share the same literal boundaries), so the
    // refinement affects parallelism only.
    val idealMax = SkewFactor * math.max(total / buckets, 1L)
    val (finalBuckets, cnt) = dims.zipWithIndex.foldLeft((bExprs, cnt0)) {
      case ((bs, cs), ((v, _, _), i)) =>
        val worst = cs.filter(_._1 == i).map(_._3).maxOption.getOrElse(0L)
        if (worst <= idealMax || total <= buckets.toLong * 64) (bs, cs)
        else {
          val (lo, hi) = (mm.getDouble(3 * i), mm.getDouble(3 * i + 1))
          val (nb, ncs) = refineBuckets(df, v, total, buckets, lo, hi)
          (bs.updated(i, nb),
            cs.filterNot(_._1 == i) ++ ncs.map { case (b, c) => (i, b, c) })
        }
    }
    val withB = finalBuckets.zipWithIndex.foldLeft(df) { case (d, (b, i)) =>
      d.withColumn(s"__b$i", b)
    }
    // skew observability: even quantile boundaries cannot split a
    // single heavy VALUE (bucketing must stay a pure function of the
    // value) — surface the post-refinement worst fraction through the
    // caller's sink so probes/callers can alarm (the plan audit cannot
    // see data skew; a per-call sink, unlike shared mutable state,
    // cannot observe another concurrent query's value)
    val maxBucket = if (cnt.isEmpty) 0L else cnt.map(_._3).max
    skewSink(if (total > 0) maxBucket.toDouble / total else 0.0)
    if (total > buckets.toLong * 64 && maxBucket > total / 2)
      Console.err.println(f"WARN ScaleRank: worst bucket holds " +
        f"$maxBucket of $total rows (${100.0 * maxBucket / total}%.1f%%) — " +
        "a single value carries most of the mass; equal sort keys rank " +
        "within one bucket by construction")
    // the ≤|buckets|-row offset table is DRIVER model state — embed it
    // as a map literal (element_at) instead of a broadcast join: no
    // join operator at all, and no join-key rewrite can inline the
    // bucket expression into a condition bound against the wrong side
    // (the refined HOF bucket expr tripped exactly that)
    val ranked = dims.zipWithIndex.foldLeft(withB) {
      case (d, ((_, order, rc), i)) =>
        var acc = 0L
        val offMap: Map[Long, Long] = cnt.filter(_._1 == i).sortBy(_._2).map {
          case (_, bId, c) => val o = acc; acc += c; (bId, o)
        }.toMap
        d.withColumn(rc,
          element_at(typedlit(offMap), col(s"__b$i")) + row_number().over(
            Window.partitionBy(col(s"__b$i")).orderBy(order: _*)).cast("long"))
    }
    dims.indices.foldLeft(ranked)((d, i) => d.drop(s"__b$i"))
      .withColumn(nCol, lit(total))
  }

  /** Single-dimension convenience over [[withGlobalRanks]]. */
  def withGlobalRank(df: DataFrame, value: Column, order: Seq[Column],
      rankCol: String, nCol: String, buckets: Int = 256,
      skewSink: Double => Unit = _ => ()): DataFrame =
    withGlobalRanks(df, Seq((value, order, rankCol)), nCol, buckets, skewSink)

  /** Adds `prefixCol` = exact running total of `weight` over all rows
    * STRICTLY before this one in the ascending total order — the
    * two-level cumulative-sum twin of [[withGlobalRanks]]: same
    * deterministic value buckets, same collected bucket-grain model
    * state (weight totals instead of row counts), same
    * bucket-partitioned window — so a global running sum never
    * single-partitions the frame. `weight` must be non-null integral
    * (BIGINT math; ANSI faults loudly on overflow rather than
    * drifting). */
  def withPrefixSum(df: DataFrame, value: Column, order: Seq[Column],
      weight: Column, prefixCol: String, buckets: Int = 256): DataFrame = {
    val mm = df.agg(min(value.cast("double")).as("lo"),
      max(value.cast("double")).as("hi"), count(value).as("nnv"),
      count(weight).as("nnw"), count(lit(1)).as("rows")).collect()(0)
    val rows = mm.getLong(4)
    if (rows == 0L) return df.withColumn(prefixCol, lit(0L))
    require(mm.getLong(2) == rows && mm.getLong(3) == rows,
      s"ScaleRank.withPrefixSum: value/weight must be non-null " +
        s"(${rows - mm.getLong(2)} null values, ${rows - mm.getLong(3)} " +
        s"null weights out of $rows rows)")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bExpr =
      if (hi == lo) lit(0L)
      else least(
        floor((value.cast("double") - lit(lo)) / lit((hi - lo) / buckets)),
        lit(buckets - 1L)).cast("long")
    val withB = df.withColumn("__b", bExpr).withColumn("__w", weight.cast("long"))
    val tot = withB.groupBy(col("__b")).agg(sum(col("__w")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    // bucket-grain offsets as a map literal — same no-join device as
    // withGlobalRanks
    val offMap: Map[Long, Long] =
      tot.map { case (bId, c) => val o = acc; acc += c; (bId, o) }.toMap
    withB
      .withColumn(prefixCol, element_at(typedlit(offMap), col("__b")) + coalesce(
        sum(col("__w")).over(Window.partitionBy(col("__b")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__b", "__w")
  }

  /** SQL NTILE(k) from an exact 1-based rank column and a total-count
    * column: the first (n mod k) tiles get one extra row — the same
    * uneven-bucket rule Spark and DuckDB implement, so a two-level
    * rank + this expression is bit-identical to
    * `ntile(k) OVER (ORDER BY …)` on the same tie-broken order.
    * (When n < k the ELSE branch is unreachable, so its DIV by zero
    * never evaluates.) */
  def ntileExpr(k: Int, rank: String, n: String): Column = expr(
    s"""CASE WHEN $rank <= ($n % $k) * (($n DIV $k) + 1L)
             THEN ($rank + ($n DIV $k)) DIV (($n DIV $k) + 1L)
             ELSE ($n % $k) + ($rank - ($n % $k) * (($n DIV $k) + 1L)
                               + ($n DIV $k) - 1L) DIV ($n DIV $k)
        END""")
}

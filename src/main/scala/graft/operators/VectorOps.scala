package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.sources.Tables

/** Vector similarity search over the `embeddings` table
  * (`Array[Float]`, dim 64) — driver north-star extension.
  *
  * Numeric determinism: float→double casts are exact, float×float in
  * double is exact (24+24 < 53 mantissa bits), and both Spark's
  * `aggregate` fold and DuckDB's `list_dot_product` accumulate
  * sequentially left-to-right — verified bit-identical — so cosine
  * scores are oracle-comparable as raw doubles, no rounding.
  *
  * Scale design: brute-force top-k is the correctness baseline (a
  * broadcast of the query set against a full scan — linear, no
  * shuffle); the random-hyperplane LSH variant is the 100 TB path:
  * bucket the corpus once (narrow map), join query buckets to corpus
  * buckets (shuffle bounded by bucket width), refine exact cosine only
  * within candidates.
  */
object VectorOps {

  /** Cross-CONSUMER memo for the bounded TRAINED MODELS (Lloyd
    * centroids, PQ codebooks — K×dim driver-side Seqs, never data):
    * the twin of GraphOps' graph memo, but for model state. q_ann_recall
    * alone trains the SAME Lloyd model twice (its ivf and ivfpq chains)
    * and the SAME PQ codebook twice (pq and ivfpq) — each training is
    * a driver-blocking collect ladder (seeds + LloydIters assign/mean
    * rounds), so the duplicate rebuild is pure repeated work inside ONE
    * query's clock (guide §1.2: don't compute things you throw away).
    * Keyed by (session identity, data dir); graft.Bench / AbWedge /
    * ScaleProbe CLEAR this memo before every timed repetition, so each
    * timed pass still trains cold — the memo dedups consumers WITHIN a
    * pass, never across runs. */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  /** Drop all memoized models (bench/probe isolation). */
  def clearModelCache(): Unit = modelCache.clear()

  /** AbWedge's A/B switch (annrec_dup / annrec_memo): false replays the
    * pre-r15 duplicate-training form. Always true in the suite path. */
  @volatile private[graft] var modelMemoEnabled = true

  private def cachedModel[T <: AnyRef](s: SparkSession, d: String,
      kind: String)(build: => T): T =
    if (!modelMemoEnabled) build
    else modelCache.getOrElseUpdate(
      s"$kind|${System.identityHashCode(s)}|$d", build).asInstanceOf[T]

  /** Memoized [[lloydModel]] over dataset `d`'s full embeddings corpus
    * (all full-corpus consumers train the identical model — the model
    * depends only on (vec_id, vec), which every caller projects the
    * same way; qSemdedup's DOUBLED corpus deliberately does NOT use
    * this). */
  private def lloydModelM(s: SparkSession, d: String,
      vecs: DataFrame): Seq[(Long, Seq[Double])] =
    cachedModel[Seq[(Long, Seq[Double])]](s, d, "lloyd")(lloydModel(s, vecs))

  /** Memoized [[pqCodebook]] — same contract as [[lloydModelM]]. */
  private def pqCodebookM(s: SparkSession, d: String, e: DataFrame,
      sub: DataFrame): Seq[(Int, Long, Seq[Double])] =
    cachedModel[Seq[(Int, Long, Seq[Double])]](s, d, "pqcb")(pqCodebook(s, e, sub))

  /** Exact dot product of two double-array columns — the native
    * codegen'd DotProduct expression (graft.functions), same
    * sequential left-fold semantics as the zip_with+aggregate HOF
    * formulation but fused into whole-stage codegen. */
  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  /** Fused single-pass cosine (graft.functions.CosineSimilarity) —
    * bit-identical to dot/(√·√) composition, one array traversal
    * instead of three. */
  private def cosine(a: String, b: String): Column = expr(s"graft_cosine($a, $b)")

  private def asDouble(c: String): Column = col(c).cast("array<double>")

  /** The pinned int8 quantizer (q = ⌊x·127/max|vec| + 0.5⌋) as ONE
    * expression over an input column named `vec`, with the scale
    * bound as the HOF ARGUMENT — the transform(array(x), v -> …)
    * Spark-SQL "let". A once-referenced scale alias would be inlined
    * by CollapseProject INTO the per-element lambda, re-running the
    * max-abs fold for every element: O(d²) per row instead of O(d)
    * (the same duplication measured at 9–20× on the winnow path). */
  private val quantLetSql: String =
    "element_at(transform(" +
      "array(127.0 / aggregate(vec, CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, abs(x)))), " +
      "sc -> transform(vec, x -> CAST(floor(x * sc + 0.5d) AS BIGINT))), 1)"

  // Brute-force cosine top-k: query set = vec_id < 10 (broadcast),
  // ranked per query with a unique tiebreaker.
  private def qSimBruteforce(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), asDouble("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), asDouble("embedding").as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** Matryoshka (MRL) prefix-dimension retrieval audit — how much of
    * the full-dimension top-5 neighborhood survives when ranking by
    * only the first 16 / 32 of the 64 dimensions (Kusupati et al.
    * 2022: nested representations are cheap-to-serve prefixes; this
    * measures what that truncation costs on OUR vectors before a
    * deployment commits to it). One probe-broadcast pass computes all
    * three cosines per candidate (full + both prefixes — same fused
    * fold as q_sim_bruteforce, bit-identical cross-engine, so the
    * rankings agree exactly); per-probe overlap counts are exact
    * BIGINTs and recall is one IEEE division by the literal 5. Scale
    * shape: O(|probes|·n) with a broadcast probe side — the
    * q_sim_bruteforce pattern, never all-pairs. */
  private def qMrlRecall(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), asDouble("embedding").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), asDouble("embedding").as("c_vec"))
    val scored = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine("q_vec", "c_vec").as("cos_full"),
        expr("graft_cosine(slice(q_vec, 1, 16), slice(c_vec, 1, 16))").as("cos_16"),
        expr("graft_cosine(slice(q_vec, 1, 32), slice(c_vec, 1, 32))").as("cos_32"))
      .localCheckpoint() // three rank-window consumers of one scan
    def top5(scoreCol: String): DataFrame = scored
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col(scoreCol).desc, col("c_id"))))
      .filter(col("rk") <= 5).select("q_id", "c_id")
    val full = top5("cos_full").localCheckpoint() // ground truth, two consumers
    val probes = full.select("q_id").distinct()
    Seq(16, 32).map { m =>
      val hits = top5(s"cos_$m").join(full, Seq("q_id", "c_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_common"))
      probes.join(hits, Seq("q_id"), "left_outer")
        .select(lit(m.toLong).as("prefix_dim"), col("q_id"),
          coalesce(col("n_common"), lit(0L)).as("n_common"))
    }.reduce(_ unionAll _)
      .withColumn("recall_at_5", col("n_common").cast("double") / lit(5.0))
      .orderBy("prefix_dim", "q_id")
  }

  /** Mutual (reciprocal) k-nearest-neighbor pairs within each label
    * block — the bitext-mining / ANN-graph-construction filter
    * (cf. Artetxe & Schwenk 2019's margin-based mining): keep (a,b)
    * only when b is in a's cosine top-3 AND a is in b's top-3.
    * Reciprocity kills hub vectors that sit in everyone's top-k
    * without being anyone's mutual match. Blocked all-pairs: the
    * label is the blocking key (the 100 TB path swaps in the LSH/IVF
    * bucket id from q_sim_lsh/q_sim_ivf as the block — same plan
    * shape), so the join is Σ_label n_label², never corpus². The
    * ranked frame is localCheckpoint'd once and joined to its own
    * reversal (doc'd multi-consumer rule); cosine is symmetric under
    * the fused sequential fold, so the forward score IS the backward
    * score and only ranks differ. */
  private def qMutualNn(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"), asDouble("embedding").as("vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"), col("a")).orderBy(col("cosine").desc, col("b"))
    val ranked = e.select(col("label"), col("vec_id").as("a"), col("vec").as("va"))
      .join(e.select(col("label"), col("vec_id").as("b"), col("vec").as("vb")),
        Seq("label"))
      .filter(col("a") =!= col("b"))
      .withColumn("cosine", cosine("va", "vb"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("label", "a", "b", "cosine", "rk")
      .localCheckpoint()
    ranked
      .join(ranked.select(col("label"), col("a").as("b"), col("b").as("a"),
        col("rk").as("rk_back")), Seq("label", "a", "b"))
      .filter(col("a") < col("b"))
      .select(col("label"), col("a"), col("b"), col("cosine"),
        col("rk").as("rank_ab"), col("rk_back").as("rank_ba"))
      .orderBy("label", "a", "b")
  }

  // Per-vector L2 norm — deterministic per-row arithmetic, oracled.
  private def qEmbedNorms(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .select(
        col("vec_id"), col("label"),
        sqrt(dot("vec", "vec")).as("l2_norm"),
        size(col("embedding")).cast("long").as("dim"))
      .orderBy("vec_id")
  }

  // Per-label corpus statistics (exact ints + monotone min/max).
  private def qEmbedStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        min(size(col("embedding"))).cast("long").as("min_dim"),
        max(size(col("embedding"))).cast("long").as("max_dim"),
        min(element_at(col("embedding"), 1).cast("double")).as("min_c0"),
        max(element_at(col("embedding"), 1).cast("double")).as("max_c0"))
      .orderBy("label")

  /** Deterministic pseudo-random ±1 hyperplanes: sign of a fixed
    * 64-bit mix of (plane, dim) — reproducible across runs/executors
    * with no RNG state (a requirement the DuckDB-oracle harness and
    * any distributed re-run both impose).
    */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, j))
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }

  /** Banded random-hyperplane LSH parameters. `bands` independent
    * signatures of `planesPerBand` planes each: a pair collides if it
    * agrees on ALL planes of ANY band, so recall for cosine c is
    * 1 − (1 − s^planesPerBand)^bands with s = 1 − acos(c)/π — banding
    * buys back the recall that a single long signature destroys,
    * without the quadratic pair blowup a single SHORT signature causes.
    */
  final case class LshParams(bands: Int, planesPerBand: Int) {
    // each band's bucket is its OWN 2^ppb space folded into a long, so
    // the long-width cap applies per band, not to the total plane count
    require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 62)
    def nPlanes: Int = bands * planesPerBand
    def bucketsPerBand: Long = 1L << planesPerBand
  }

  object LshParams {
    /** Derive the plane count from the corpus size so the EXPECTED
      * bucket width n / 2^planesPerBand stays ≤ `targetWidth` — the
      * within-bucket joins are then bounded by width × bands
      * independent of n. 10× the corpus ⇒ +log₂10 ≈ 3 planes per
      * band, not 10× wider buckets: this is the knob that makes the
      * blocking survive a 100 TB corpus. */
    def forCorpus(n: Long, targetWidth: Long, bands: Int): LshParams = {
      val ppb = math.max(1, math.ceil(
        math.log(n.toDouble / targetWidth.toDouble) / math.log(2.0)).toInt)
      LshParams(bands, ppb)
    }
  }

  /** Blocking parameters for the two LSH consumers, DERIVED from the
    * harness corpus sizes rather than hard-coded plane counts. Dedup is
    * sized for the LARGEST corpus the harness runs (sf0.1: 2000
    * embeddings, doubled → 4000 ⇒ ppb 6); 5 bands keep recall at the
    * 0.9 threshold cosine ≥ 1−(1−s⁶)⁵ ≈ 0.92. ANN is sized for the
    * recall-pinned correctness corpus (500). A deployment overrides by
    * calling forCorpus with its own n. */
  private[graft] val DedupLsh = LshParams.forCorpus(4000L, 64L, bands = 5)
  private[graft] val AnnLsh = LshParams.forCorpus(500L, 16L, bands = 4)

  /** One bucket id per (row, band): bucket = left fold acc·2 + sign
    * bit over the band's planes (band b owns plane indices
    * [b·ppb, (b+1)·ppb)). Adds `band`/`bucket` via posexplode — each
    * vector emits exactly `bands` rows. Input needs a `vec` column of
    * exactly `dim` elements: graft_dot folds over min(len), so a
    * shorter vector would silently bucket on a truncated projection
    * (degraded recall, no error) — the guard turns that into a loud
    * runtime failure instead.
    */
  private[graft] def withBandBuckets(df: DataFrame, p: LshParams,
      dim: Int = 64): DataFrame =
    df.withColumn("vec", expr(
        s"""CASE WHEN size(vec) = $dim THEN vec
              ELSE CAST(raise_error(concat(
                'graft LSH: expected dim $dim, got ', CAST(size(vec) AS STRING),
                ' — plane count must match the vector dimension'))
                AS ARRAY<DOUBLE>) END"""))
      .withColumn("pl", typedlit(planes(p.nPlanes, dim)))
      .withColumn("bb", expr(
        s"""transform(sequence(0, ${p.bands - 1}), b ->
              aggregate(sequence(0, ${p.planesPerBand - 1}), 0L, (acc, q) ->
                acc * 2 + IF(graft_dot(vec, element_at(pl, b * ${p.planesPerBand} + q + 1)) > 0, 1L, 0L)))"""))
      // posexplode_OUTER: `bb` always has exactly `bands` elements, and
      // the plain variant plans a non-empty pre-filter that duplicates
      // the whole signature fold (bands × ppb graft_dot calls) into the
      // scan's DataFilters — every bucket would be computed twice
      .select(col("*"), posexplode_outer(col("bb")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .drop("pl", "bb")

  /** The full per-row LSH band signature as ONE key column `lsh_sig`
    * (the `bands` bucket ids of [[withBandBuckets]], same planes and
    * same fold, joined into a string) — the streaming dedup key: two
    * vectors agreeing on EVERY band's bucket are near-certain
    * duplicates. Per-row expressions only, no generator and no
    * aggregation, so it sits upstream of streaming stateful operators
    * the way perRowSimhash does for text. */
  private[graft] def withBandSignature(df: DataFrame, p: LshParams,
      dim: Int = 64): DataFrame =
    df.withColumn("vec", expr(
        s"""CASE WHEN size(vec) = $dim THEN vec
              ELSE CAST(raise_error(concat(
                'graft LSH: expected dim $dim, got ', CAST(size(vec) AS STRING),
                ' — plane count must match the vector dimension'))
                AS ARRAY<DOUBLE>) END"""))
      .withColumn("pl", typedlit(planes(p.nPlanes, dim)))
      .withColumn("lsh_sig", expr(
        s"""concat_ws('-', transform(sequence(0, ${p.bands - 1}), b ->
              aggregate(sequence(0, ${p.planesPerBand - 1}), 0L, (acc, q) ->
                acc * 2 + IF(graft_dot(vec, element_at(pl, b * ${p.planesPerBand} + q + 1)) > 0, 1L, 0L))))"""))
      .drop("pl")

  /** One band's bucket as a DuckDB expression: the band's plane q
    * contributes bit 2^(ppb-1-q) — matching the Spark-side left fold —
    * with the ±1 planes interpolated as SQL literals so the banded
    * bucketing is oracle-comparable. */
  private def bandBucketSql(vecExpr: String, band: Int, p: LshParams,
      dim: Int): String =
    planes(p.nPlanes, dim)
      .slice(band * p.planesPerBand, (band + 1) * p.planesPerBand)
      .zipWithIndex.map { case (pl, q) =>
        val litArr = pl.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product($vecExpr, $litArr) > 0 THEN ${1L << (p.planesPerBand - 1 - q)} ELSE 0 END"
      }.mkString("(", " + ", ")")

  // Banded + multi-probe LSH ANN: `bands` independent signatures per
  // vector; each query probes its own bucket PLUS every Hamming-1
  // neighbor bucket in every band (flip one sign bit — the cheapest
  // recall lever: probing is a query-side explode of ppb+1 rows while
  // the corpus stays bucketed once). A candidate is any vector in any
  // probed bucket; union across bands/probes, dedup, exact cosine
  // refine + top-5. The probe join is bounded by
  // bands × (ppb+1) × bucket width — corpus-size-independent, since
  // the plane count is DERIVED from corpus size (AnnLsh) to hold
  // width ~constant. ORACLED: the ±1 planes are deterministic literals
  // (same machinery as q_embed_dedup's oracle), and "candidate c sits
  // in some probe bucket of q" is exactly "some band's two buckets
  // differ in ≤ 1 bit" — bit_count(xor(q.b, c.b)) <= 1 in the DuckDB
  // join — so the whole ANN candidate path sits under the hash gate;
  // ScalaTest additionally pins recall vs the brute-force baseline.
  private def qSimLsh(s: SparkSession, d: String): DataFrame =
    simLshTopK(s, d, AnnLsh)

  /** Parameterized LSH ANN — public to graft so the scale probe can
    * re-derive the plane count per corpus size (the forCorpus knob
    * that holds bucket width constant as n grows). */
  private[graft] def simLshTopK(s: SparkSession, d: String,
      p: LshParams): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble("embedding").as("vec"))
    val bucketed = withBandBuckets(e, p)
    val q = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("band"),
        explode(expr(s"""array_union(array(bucket),
          transform(sequence(0, ${p.planesPerBand - 1}), j -> bucket ^ shiftleft(1L, j)))"""))
          .as("bucket"))
    val c = bucketed
      .select(col("band"), col("bucket"), col("vec_id").as("c_id"), col("vec").as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    broadcast(q).join(c, Seq("band", "bucket")).filter(col("q_id") =!= col("c_id"))
      .select("q_id", "q_vec", "c_id", "c_vec")
      .dropDuplicates("q_id", "c_id")
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "cosine")
      .orderBy("q_id", "rank")
  }

  // IVF-style ANN — the second scale path beside LSH. Coarse quantizer
  // = FIXED K centroids (corpus-size-INdependent, unlike a %-sampled
  // pivot set whose broadcast and O(n²/K) assignment grow with n):
  // seeded from the K vectors with the smallest md5(vec_id) hex
  // (deterministic sample, one TakeOrdered scan, and — unlike a
  // xxhash64 seed — computable in DuckDB, which is what lets the whole
  // path be oracled), then refined with 2 Lloyd iterations whose
  // per-cell means are DECIMAL-exact sums divided in DOUBLE (the
  // cross-engine AVG pin) — double sums are partition-order-dependent,
  // decimal sums are not, so cell assignment is run-to-run AND
  // cross-engine deterministic. Assignment is O(n·K) with an O(K·dim)
  // broadcast; each Lloyd update collects only K·dim means to the
  // driver (bounded, not a data collect). Queries probe their top-3
  // cells, exact cosine refine within probed cells — the probe join
  // touches ~3/K of the corpus.
  // ORACLED: seeds, both Lloyd iterations, assignment, probing, and
  // the top-5 refine are all plain SQL over the same pinned
  // arithmetic; ScalaTests additionally cross-check scores against
  // brute force and pin recall.
  private val IvfK = 16
  private val IvfProbes = 3
  private val LloydIters = 2

  /** Seeded-Lloyd scoring over any (vec_id, vec[, …]) frame — the
    * shared k-means core of q_sim_ivf and q_semdedup: md5-ordered
    * seeds, [[LloydIters]] assign+mean rounds (decimal-exact sums
    * divided in double — the cross-engine AVG pin; empty cells keep
    * their centroid), then every vector scored against the final
    * centroids. The two `.collect()`s are bounded K-seed and
    * K×dim-mean fetches — model state, never data. Mirrored in SQL by
    * [[ivfSeedChainSql]] over whatever `v` CTE the caller defines. */
  private def lloydScored(s: SparkSession, vecs: DataFrame): DataFrame =
    scoreAgainst(s, vecs, lloydModel(s, vecs))

  /** Score every (vec_id, vec[, …]) row against a centroid model:
    * per-row cosine to each of the K broadcast centroids, ranked
    * p_rank per vector ((p_cos desc, cell) — the fixed Lloyd
    * tie-break). Shared by the Lloyd loop, the IVF queries, and the
    * streaming ANN-ingest twin (EventPipeline.assignCells). */
  private[graft] def scoreAgainst(s: SparkSession, e: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    val byCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("p_cos").desc, col("cell"))
    e.crossJoin(broadcast(cents.toDF("cell", "cent")))
      .withColumn("p_cos", cosine("vec", "cent"))
      .withColumn("p_rank", row_number().over(byCell))
  }

  /** The final IVF centroid MODEL (the thing a deployment persists and
    * a streaming ingest broadcasts): md5-ordered seeds + LloydIters
    * assign/mean rounds, exactly the q_sim_ivf chain. K×dim driver
    * state, never data. */
  private[graft] def lloydModel(s: SparkSession,
      vecs: DataFrame): Seq[(Long, Seq[Double])] = {
    val e = vecs
    var centroids: Seq[(Long, Seq[Double])] = e
      .select(col("vec_id"), col("vec"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(IvfK)
      .collect().sortBy(_.getLong(0)).toSeq
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Double](1)) }
    for (_ <- 1 to LloydIters) {
      val means = scoreAgainst(s, e, centroids).filter(col("p_rank") === 1)
        .select(col("cell"), posexplode(col("vec")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("col").cast("decimal(30,15)")).cast("double")
          / count(lit(1)).cast("double")).as("m"))
        .collect()
      val byId = means.groupBy(_.getLong(0)).map { case (cell, rows) =>
        cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      centroids = centroids.map { case (cell, old) =>
        (cell, byId.getOrElse(cell, old)) // empty cell keeps its centroid
      }
    }
    centroids
  }

  /** Cell assignment against a FIXED centroid model — every vector's
    * argmax-cosine cell with the exact Lloyd tie-break. The shared
    * core of q_ivf_assign and the streaming ANN ingest
    * (EventPipeline.assignCells): same model, same tie-break, so a
    * vector lands in the same cell on either surface. Extra input
    * columns pass through. */
  private[graft] def assignCells(vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    scoreAgainst(vecs.sparkSession, vecs, cents)
      .filter(col("p_rank") === 1)
      .drop("cent", "p_cos", "p_rank")

  /** Full ANN assignment: cell plus the nearest KEEPER in that cell by
    * exact float cosine (ties to the lowest keeper id; NULL when the
    * cell holds no keeper). `keepers` is a (cell, k_id, k_vec) frame —
    * the join is cell-keyed, never all-pairs. The exposed keeper_cos
    * is pure float×float arithmetic (bit-identical cross-engine); the
    * centroid-dependent scores stay internal, per the IVF family's
    * determinism discipline. */
  private[graft] def assignAnn(vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])], keepers: DataFrame): DataFrame = {
    VectorExpressions.register(vecs.sparkSession)
    val byK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("keeper_cos").desc, col("keeper_id"))
    assignCells(vecs.select(col("vec_id"), col("vec")), cents)
      .join(keepers.select(col("cell"), col("k_id").as("keeper_id"),
        col("k_vec")), Seq("cell"), "left_outer")
      .withColumn("keeper_cos", when(col("keeper_id").isNotNull,
        cosine("vec", "k_vec")))
      .withColumn("k_rank", row_number().over(byK))
      .filter(col("k_rank") === 1)
      .select("vec_id", "cell", "keeper_id", "keeper_cos")
  }

  // Embedding-space DRIFT over IVF cells — the representation-shift
  // monitor a training pipeline runs beside the per-value drift
  // monitor: did the DISTRIBUTION of embeddings across semantic
  // regions move between two corpus slices? The cells of the shared
  // Lloyd model are the regions; the even/odd vec_id halves stand in
  // for reference/current snapshots (deterministic at every SF); and
  // the distance is the drift monitor's integer-exact total-variation
  // form — per-cell TV terms |c_ref·n_cur − c_cur·n_ref| as exact
  // BIGINTs, ONE final IEEE division for the scalar TV. Scale shape:
  // one broadcast score over the corpus, one cell hash agg
  // (model-sized output), two scalar broadcasts.
  private def qEmbedDrift(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d).withColumn("vec", asDouble("embedding"))
      .select(col("vec_id"), col("vec"))
    val counts = assignCells(e, lloydModelM(s, d, e))
      .groupBy(col("cell"))
      .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("c_ref"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("c_cur"))
      .localCheckpoint() // feeds totals AND terms AND the tv rollup
    val tot = counts.agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("tv_term", abs(col("c_ref") * col("n_cur") - col("c_cur") * col("n_ref")))
    val tv = terms.agg(sum(col("tv_term")).as("tv_num"))
    terms.crossJoin(broadcast(tv))
      .select(col("cell"), col("c_ref"), col("c_cur"), col("tv_term"),
        col("n_ref"), col("n_cur"), col("tv_num"),
        (col("tv_num").cast("double")
          / (lit(2.0) * col("n_ref").cast("double") * col("n_cur").cast("double")))
          .as("tv"))
      .orderBy("cell")
  }

  // The ORACLED batch analog of the streaming ANN ingest
  // (EventPipeline.startAnnIngest): every corpus vector's IVF cell
  // plus its nearest-keeper label, where the keepers are a
  // deterministic representative subset (vec_id % 7 = 0) assigned
  // through the SAME model. The DuckDB oracle replays the full chain —
  // seeded Lloyd, cell argmax, cell-keyed keeper join, cosine top-1 —
  // so the exact composition the stream runs per micro-batch sits
  // under the hash gate. Scale shape: one broadcast score over the
  // corpus, one cell-keyed equi-join against the (bounded) keeper
  // set, one per-vector top-1 window.
  private def qIvfAssign(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d).withColumn("vec", asDouble("embedding"))
      .select(col("vec_id"), col("vec"))
    val model = lloydModelM(s, d, e)
    val keepers = assignCells(e.filter(col("vec_id") % 7 === 0), model)
      .select(col("cell"), col("vec_id").as("k_id"), col("vec").as("k_vec"))
    assignAnn(e, model, keepers).orderBy("vec_id")
  }

  private def qSimIvf(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d).withColumn("vec", asDouble("embedding"))
    val scored = scoreAgainst(s, e, lloydModelM(s, d, e))
    val assigned = scored.filter(col("p_rank") === 1)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"), col("cell"))
    val probes = scored.filter(col("vec_id") < 10 && col("p_rank") <= IvfProbes)
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "cell", "cosine")
      .orderBy("q_id", "rank")
  }

  // ---- Product quantization (PQ) ANN — the third scale path --------
  //
  // PQ attacks the MEMORY side of 100 TB ANN where LSH/IVF attack the
  // candidate count: the 64-dim float vector (256 B) is split into
  // PqM=8 8-dim subvectors, each encoded as its nearest centroid in a
  // per-subspace PqK=16-entry codebook — 8 4-bit codes per vector, a
  // 64× compression of the scanned corpus (256 B float32 → 4 B). A
  // query builds a
  // lookup table of PqM×PqK partial dot products (model-sized, not
  // corpus-sized), scores every candidate by summing its codes' LUT
  // entries (ADC — asymmetric distance computation: the query stays
  // exact, only the corpus side is quantized), then refines the top
  // PqRefine candidates with exact cosine. Composable with IVF cell
  // pruning; here the ADC scan is kept full so the approximation
  // quality itself is what the recall test pins.
  //
  // Determinism engineering (all mirrored in the generated oracle SQL):
  // codebooks seed from the SAME md5-ordered deterministic sample as
  // q_sim_ivf, refined with PqLloyd L2 Lloyd rounds whose means are
  // DECIMAL-pinned; L2² is composed as dot(x,x) − 2·dot(x,c) + dot(c,c)
  // (three sequential folds, one fixed association order). One pin has
  // a measured cross-engine LIMIT, and the output schema respects it:
  // float-valued doubles can TIE exactly at the DECIMAL(30,15) cast
  // (x·10¹⁵ half-integer — 494 elements in the sf0.001 embeddings
  // alone), and Spark rounds ties HALF_UP while DuckDB rounds them
  // down, so Lloyd MEANS agree only to ~1 ulp across engines. Rankings
  // absorb that drift (a flip needs a genuine tie); raw values don't.
  // Hence — same discipline as q_sim_ivf/q_semdedup, now stated
  // explicitly — centroid-DEPENDENT doubles (the ADC approx score)
  // rank candidates internally but never appear in the output; the
  // exposed score is the exact float×float cosine, which IS
  // bit-identical across engines.
  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 16
  private val PqLloyd = 1
  private val PqRefine = 50

  /** L2² between two subvector columns in the pinned association
    * order — used for both Lloyd assignment and encoding. */
  private def l2sq(x: String, c: String): Column =
    dot(x, x) - lit(2.0) * dot(x, c) + dot(c, c)

  /** (vec_id, m, sv): the PqM subvectors of every (vec_id, vec) row. */
  private def pqSub(e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${PqM - 1}), m -> slice(vec, m * $PqSubDim + 1, $PqSubDim))")))
      .select(col("vec_id"), col("pos").as("m"), col("col").as("sv"))

  /** Nearest-cell assignment of every subvector against a codebook
    * (rk = 1 marks the winner), L2² in the pinned association order. */
  private def pqAssign(s: SparkSession, sub: DataFrame,
      cb: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    val byVm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("m")).orderBy(col("d2").asc, col("cell"))
    sub.join(broadcast(cb.toDF("m", "cell", "cent")), Seq("m"))
      .withColumn("d2", l2sq("sv", "cent"))
      .withColumn("rk", row_number().over(byVm))
  }

  /** Seeded + PqLloyd-refined per-subspace codebooks — shared by
    * q_sim_pq and q_sim_ivfpq so both ADC paths train the SAME model
    * (and replay the same pqChainSql oracle). Seeds are subspace
    * slices of the md5-ordered sample rows; each Lloyd round's means
    * are a bounded PqM·PqK·PqSubDim model collect, never data. */
  private def pqCodebook(s: SparkSession, e: DataFrame,
      sub: DataFrame): Seq[(Int, Long, Seq[Double])] = {
    val seedRows = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(PqK).collect().sortBy(_.getLong(0))
    var codebook: Seq[(Int, Long, Seq[Double])] = for {
      (r, i) <- seedRows.toSeq.zipWithIndex
      m <- 0 until PqM
    } yield (m, i.toLong, r.getSeq[Double](1).slice(m * PqSubDim, (m + 1) * PqSubDim))
    for (_ <- 1 to PqLloyd) {
      val means = pqAssign(s, sub, codebook).filter(col("rk") === 1)
        .select(col("m"), col("cell"), posexplode(col("sv")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg((sum(col("col").cast("decimal(30,15)")).cast("double")
          / count(lit(1)).cast("double")).as("mu"))
        .collect()
      val byKey = means.groupBy(r => (r.getInt(0), r.getLong(1))).map { case (k, rows) =>
        k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      }
      codebook = codebook.map { case (m, cell, old) =>
        (m, cell, byKey.getOrElse((m, cell), old)) // empty cell keeps centroid
      }
    }
    codebook
  }

  /** The PqM per-subspace ADC addends collected into pinned columns —
    * sum() over doubles would be partition-order-dependent; with
    * exactly one row per subspace these are exact. */
  private def adcPartialCols: Seq[Column] = (0 until PqM).map(m =>
    sum(when(col("m") === m, col("pdot"))).as(s"p$m"))
  private def adcSum: Column =
    (0 until PqM).map(m => col(s"p$m")).reduceLeft(_ + _)

  private def qSimPq(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble("embedding").as("vec"))
    val sub = pqSub(e)
    val codebook = pqCodebookM(s, d, e, sub)
    // corpus → codes (the 64×-compressed representation ADC scans)
    val codes = pqAssign(s, sub, codebook).filter(col("rk") === 1)
      .select(col("vec_id").as("c_id"), col("m"), col("cell"))
    // query-side LUT: partial dot of each query subvector against
    // EVERY cell of its subspace codebook (PqM×PqK entries per query)
    val qd = sub.filter(col("vec_id") < 10)
      .join(broadcast(codebook.toDF("m", "cell", "cent")), Seq("m"))
      .select(col("vec_id").as("q_id"), col("m"), col("cell"),
        dot("sv", "cent").as("pdot"))
    // ADC: each candidate's code picks exactly one LUT entry per
    // subspace; collect the PqM addends into columns and add them in
    // one pinned order (sum() over doubles would be partition-order-
    // dependent — with exactly one row per subspace it is exact)
    val adc = qd.join(codes, Seq("m", "cell"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(adcPartialCols.head, adcPartialCols.tail: _*)
      .withColumn("approx", adcSum)
    val byApprox = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id"))
    val cand = adc.withColumn("ark", row_number().over(byApprox))
      .filter(col("ark") <= PqRefine)
      .select("q_id", "c_id")
    // exact refine of the shortlist only
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    cand.join(e.select(col("vec_id").as("q_id"), col("vec").as("q_vec")), Seq("q_id"))
      .join(e.select(col("vec_id").as("c_id"), col("vec").as("c_vec")), Seq("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "cosine")
      .orderBy("q_id", "rank")
  }

  // Embedding near-duplicate pairs — LSH-bucket blocking + exact
  // cosine refine (the embedding-cosine near-dup north-star op).
  // A single long signature reliably finds IDENTICAL vectors but
  // misses ~70% of genuine cosine-0.9 near-dups (collision prob
  // s^planes ≈ 0.29 for 8 planes); banding (DedupLsh: 5 bands × 6
  // derived planes ⇒ 1−(1−s⁶)⁵ ≈ 0.92 at the 0.9 threshold — see the
  // LshParams.forCorpus doc) buys the recall back. Candidates = union of
  // per-band bucket collisions, dedup'd before the exact refine; the
  // pair join is bounded by bands × bucket width, and the plane count
  // is derived from corpus size (DedupLsh) so width doesn't grow with
  // n. Runs on the doubled corpus (id-shifted replay) so the collapse
  // path is exercised. ORACLED: the ±1 planes are deterministic
  // literals interpolated into the DuckDB SQL (one bucket expression
  // per band, OR-ed in the join), and the sign of a sequential ±x_i
  // fold is bit-identical across both engines.
  private val DedupCosine = 0.9

  /** Near-duplicate pairs over any (vec_id, vec[, extra…]) frame —
    * public so recall tests can run planted fixtures through the exact
    * production blocking. Extra columns ride along from side `a`.
    * `dim` must equal the vectors' length — mismatches raise at
    * runtime (see withBandBuckets) rather than silently bucketing on
    * a truncated projection. */
  def embedNearDupPairs(vecs: DataFrame, p: LshParams = DedupLsh,
      minCosine: Double = DedupCosine, dim: Int = 64): DataFrame = {
    val extra = vecs.columns.filterNot(Set("vec_id", "vec")).toSeq
    // candidate generation and dedup over ID PAIRS ONLY: the band join
    // and the distinct shuffle move 16-byte rows, not the 0.5 KB
    // two-vector payload (a pair colliding in k bands would otherwise
    // ship its vectors k times into the dedup exchange) — at corpus
    // scale the candidate stream is the largest intermediate here
    val bucketed = withBandBuckets(vecs, p, dim).select("band", "bucket", "vec_id")
    val cand = bucketed.select(col("band"), col("bucket"), col("vec_id").as("a_id"))
      .join(bucketed.select(col("band"), col("bucket"), col("vec_id").as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    // vectors rejoin only for the surviving distinct pairs' exact refine
    val va = vecs.select(Seq(col("vec_id").as("a_id"),
      col("vec").as("a_vec")) ++ extra.map(col): _*)
    val vb = vecs.select(col("vec_id").as("b_id"), col("vec").as("b_vec"))
    cand.join(va, Seq("a_id")).join(vb, Seq("b_id"))
      .withColumn("cosine", cosine("a_vec", "b_vec"))
      .filter(col("cosine") > minCosine)
      .drop("a_vec", "b_vec")
  }

  private def qEmbedDedup(s: SparkSession, d: String): DataFrame =
    embedDedupAt(s, d, DedupLsh)

  /** Parameterized embedding dedup — public to graft so the scale
    * probe can size the banding for each synthetic corpus via
    * LshParams.forCorpus (the documented deployment override). */
  private[graft] def embedDedupAt(s: SparkSession, d: String,
      p: LshParams): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble("embedding").as("vec"))
    val dbl = e.union(e.withColumn("vec_id", col("vec_id") + lit(1000000L))
      .select("vec_id", "label", "vec"))
    embedNearDupPairs(dbl, p, DedupCosine)
      .select("label", "a_id", "b_id", "cosine")
      .orderBy("a_id", "b_id")
  }

  /** In-cell duplicate threshold for q_semdedup — same bar as the LSH
    * dedup path so the two strategies are comparable on one corpus. */
  private val SemDedupCosine = 0.9

  /** Semantic dedup (SemDeDup-style): k-means the corpus into
    * [[IvfK]] cells with the SAME seeded-Lloyd machinery as q_sim_ivf,
    * then compare vectors only WITHIN their cell and drop any vector
    * that has a lower-id in-cell neighbor above [[SemDedupCosine]]
    * (keeper = lowest such neighbor; keepers keep themselves). This is
    * the embedding-space alternative to LSH-bucket blocking
    * (q_embed_dedup): clustering replaces hashing as the candidate
    * limiter, which also catches paraphrase-level duplicates whose
    * buckets differ. Runs on the doubled corpus so the collapse path
    * is exercised.
    *
    * Scale shape: assignment is O(n·K) narrow work; the in-cell
    * self-join is bounded by Σ|cell|² — the deployment knob is K,
    * which SemDeDup scales with n so cells stay O(targetWidth); K=16
    * here matches the fixture (the forCorpus-style derivation applies
    * unchanged). Fully oracled: seeds, both Lloyd rounds, assignment,
    * in-cell pairs, and keeper election all replay in generated
    * DuckDB SQL from the same constants. */
  private def qSemdedup(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble("embedding").as("vec"))
    val dbl = e.union(e.withColumn("vec_id", col("vec_id") + lit(1000000L))
      .select("vec_id", "vec"))
    val assigned = lloydScored(s, dbl).filter(col("p_rank") === 1)
      .select(col("vec_id"), col("vec"), col("cell"))
      .localCheckpoint() // feeds both sides of the pair join + the verdict
    val pairs = assigned
      .select(col("cell"), col("vec_id").as("a_id"), col("vec").as("a_vec"))
      .join(assigned.select(col("cell"), col("vec_id").as("b_id"), col("vec").as("b_vec")),
        Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine", cosine("a_vec", "b_vec"))
      .filter(col("cosine") > SemDedupCosine)
    val mins = pairs.groupBy(col("b_id").as("vec_id")).agg(min(col("a_id")).as("keeper"))
    assigned.join(mins, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        col("keeper").isNotNull.as("is_dup"),
        coalesce(col("keeper"), col("vec_id")).as("keeper_id"))
      .orderBy("vec_id")
  }

  // Symmetric int8 quantization — the storage path for vectors at
  // 100 TB (4× smaller than float32): per-vector scale = 127/max|x|,
  // q_i = floor(x_i·scale + 0.5) (explicit floor-of-shifted instead of
  // a round()/cast, whose half-way rules differ across engines).
  // Scalar outputs keep the oracle hashable.
  private def qEmbedQuantize(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .withColumn("max_abs", expr(
        "aggregate(vec, CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, abs(x)))"))
      .withColumn("scale", lit(127.0) / col("max_abs"))
      .withColumn("q", expr(
        "transform(vec, x -> CAST(floor(x * scale + 0.5d) AS BIGINT))"))
      .select(
        col("vec_id"), col("label"), col("max_abs"), col("scale"),
        element_at(col("q"), 1).as("q0"),
        element_at(col("q"), 2).as("q1"),
        element_at(col("q"), 3).as("q2"),
        element_at(col("q"), 4).as("q3"),
        // reconstruction error on dim 1 — deterministic per-row IEEE
        abs(element_at(col("q"), 1).cast("double") / col("scale")
          - element_at(col("vec"), 1)).as("recon_err0"),
        expr("aggregate(q, 0L, (acc, v) -> acc + abs(v))").as("l1_quant"))
      .orderBy("vec_id")

  // ---- IVF × PQ — the composed FAISS-style 100 TB path -------------
  //
  // q_sim_ivf prunes the CANDIDATE COUNT (probe IvfProbes of IvfK
  // cells → ~3/16 of the corpus touched); q_sim_pq compresses the
  // SCAN (64× smaller codes via ADC). Production ANN at corpus scale
  // composes them — FAISS's IndexIVFPQ — and this query is exactly
  // that composition over the already-shipped machinery: coarse cells
  // from the SAME seeded-Lloyd chain as q_sim_ivf, codes from the
  // SAME seeded codebooks as q_sim_pq (GLOBAL codebooks, not
  // per-cell residual ones — one training pass and the two stages
  // compose with no new model state; residual encoding is the
  // documented production upgrade). The ADC scan now runs only inside
  // probed cells, so the scored rows are (probe fraction) × (corpus)
  // × PqM — each stage's reduction multiplies.
  //
  // ORACLED end-to-end: the SQL is literally the concatenation of the
  // two already-pinned chains (ivfSeedChainSql + pqChainSql) plus the
  // candidate intersection — both models replay bit-identically, and
  // the same output discipline applies: the ADC approx score ranks
  // the shortlist internally but is never output (the 1-ulp
  // Lloyd-mean tie limit), the exposed cosine is the exact
  // float×float fold.
  private def qSimIvfpq(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    import s.implicits._
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble("embedding").as("vec"))
    // coarse stage: one cell per vector, IvfProbes cells per query
    val scored = scoreAgainst(s, e, lloydModelM(s, d, e))
    val assigned = scored.filter(col("p_rank") === 1)
      .select(col("vec_id").as("c_id"), col("cell"))
    val probes = scored.filter(col("vec_id") < 10 && col("p_rank") <= IvfProbes)
      .select(col("vec_id").as("q_id"), col("cell"))
    // fine stage: PQ codes for the corpus, LUT for the queries; the
    // PQ cell id is renamed `code` so it cannot collide with the IVF
    // cell key the candidate join runs on
    val sub = pqSub(e)
    val codebook = pqCodebookM(s, d, e, sub)
    val codes = pqAssign(s, sub, codebook).filter(col("rk") === 1)
      .select(col("vec_id").as("c_id"), col("m"), col("cell").as("code"))
    val qd = sub.filter(col("vec_id") < 10)
      .join(broadcast(codebook.toDF("m", "code", "cent")), Seq("m"))
      .select(col("vec_id").as("q_id"), col("m"), col("code"),
        dot("sv", "cent").as("pdot"))
    // candidates = corpus vectors whose IVF cell is probed by q; each
    // c_id has exactly ONE cell so pairs are already distinct
    val cand0 = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id", "cell")
    val adc = cand0.join(codes, Seq("c_id"))
      .join(broadcast(qd), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("c_id"), col("cell"))
      .agg(adcPartialCols.head, adcPartialCols.tail: _*)
      .withColumn("approx", adcSum)
    val byApprox = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("approx").desc, col("c_id"))
    val cand = adc.withColumn("ark", row_number().over(byApprox))
      .filter(col("ark") <= PqRefine)
      .select("q_id", "c_id", "cell")
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    cand.join(e.select(col("vec_id").as("q_id"), col("vec").as("q_vec")), Seq("q_id"))
      .join(e.select(col("vec_id").as("c_id"), col("vec").as("c_vec")), Seq("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id", "cell", "cosine")
      .orderBy("q_id", "rank")
  }

  // ---- ANN recall evaluation ---------------------------------------
  //
  // Recall@k of every approximate path against the exact brute-force
  // top-5 — the acceptance metric an ANN deployment is actually judged
  // on, computed IN-ENGINE (the spec-level recall floors pin the same
  // quantity, but a pipeline wants it as a queryable table per
  // index-build). Each method's candidate chain is exactly the solo
  // query's; the left join + k-explode keep the comparison one pass
  // over the model-sized top-5 lists. hits/total are exact ints, so
  // recall is one exact IEEE division — fully hash-gated; the oracle
  // embeds the SAME per-method SQL chains as the solo queries, so the
  // recall table and the per-method results can never drift apart.
  private def qAnnRecall(s: SparkSession, d: String): DataFrame = {
    // pin the ground truth ONCE: the union has four branches and each
    // would otherwise replay the full brute-force chain (the same
    // multi-consumer trap as the winnowing fingerprint stream)
    val bf = qSimBruteforce(s, d).select(col("q_id"), col("c_id"), col("rank"))
      .localCheckpoint()
    val methods = Seq(
      "ivf" -> qSimIvf(s, d), "ivfpq" -> qSimIvfpq(s, d),
      "lsh" -> qSimLsh(s, d), "pq" -> qSimPq(s, d))
    methods.map { case (m, ann) =>
      bf.join(ann.select(col("q_id"), col("c_id"), col("rank").as("ann_rank")),
          Seq("q_id", "c_id"), "left")
        .select(col("rank").as("bf_rank"), col("ann_rank"),
          explode(expr("array(1, 3, 5)")).as("k"))
        .groupBy(col("k"))
        .agg(
          sum(when(col("bf_rank") <= col("k") && col("ann_rank") <= col("k"), 1L)
            .otherwise(0L)).as("hits"),
          sum(when(col("bf_rank") <= col("k"), 1L).otherwise(0L)).as("total"))
        .select(lit(m).as("method"), col("k").cast("long").as("k"),
          col("hits"), col("total"),
          (col("hits").cast("double") / col("total").cast("double")).as("recall"))
    }.reduce(_ unionAll _).orderBy("method", "k")
  }

  // ---- Contrastive pair mining (hard negatives) --------------------
  //
  // Embedding-model training needs, per anchor, its closest SAME-label
  // neighbors (positives) and its closest WRONG-label neighbors (hard
  // negatives — the pairs that actually move the loss; random
  // negatives are trivially separated). One scored scan serves both:
  // rank same-label and cross-label candidates in separate window
  // partitions and keep top-2 / top-3. The anchor set broadcasts and
  // the corpus streams — linear, no shuffle beyond the window on the
  // (small) survivor set; at corpus scale the candidate generator
  // swaps to the already-shipped LSH/IVF blocking, which is a drop-in
  // replacement for the crossJoin here (same refine contract as
  // q_sim_lsh → q_sim_bruteforce).
  private def qHardNegatives(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("vec").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("label").as("c_label"),
      col("vec").as("c_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"), col("kind"))
      .orderBy(col("cosine").desc, col("c_id"))
    broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("kind",
        when(col("q_label") === col("c_label"), lit("pos")).otherwise(lit("neg")))
      .withColumn("rank", row_number().over(w))
      .filter((col("kind") === "pos" && col("rank") <= 2)
        || (col("kind") === "neg" && col("rank") <= 3))
      .select("q_id", "kind", "rank", "c_id", "c_label", "cosine")
      .orderBy("q_id", "kind", "rank")
  }

  // ---- Deterministic class rebalancing (oversampling) --------------
  //
  // Training sets want label parity; the minority classes are
  // oversampled to the majority count. Deterministic and exactly
  // balanced: rows of each label are ranked by md5(vec_id) (the
  // engine-neutral shuffle used throughout), and row rn of a
  // cnt-sized class emits ⌊(target−rn)/cnt⌋+1 copies — cyclic
  // round-robin, so per-label totals equal target EXACTLY (Σ over
  // rn of the formula telescopes to target) and no row is duplicated
  // more than ⌈target/cnt⌉ times. The explode is sequence()-driven —
  // per-partition generation, no shuffle beyond the label-count agg
  // (broadcast back); integer-exact in double, same floor both
  // engines.
  private def qRebalance(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
    val cnts = e.groupBy("label").agg(count(lit(1)).as("cnt"))
    val target = cnts.agg(max(col("cnt")).as("target"))
    val byLabel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    e.join(broadcast(cnts), Seq("label"))
      .crossJoin(broadcast(target))
      .withColumn("rn", row_number().over(byLabel).cast("long"))
      .withColumn("copies",
        floor((col("target") - col("rn")).cast("double") / col("cnt").cast("double"))
          .cast("long") + lit(1L))
      .select(col("label"), col("vec_id"), col("cnt"), col("target"),
        explode(expr("sequence(1L, copies)")).as("copy"))
      .orderBy("label", "vec_id", "copy")
  }

  // ---- Distributed PCA: power iteration, integer-exact -------------
  //
  // The top principal direction of the embedding matrix (uncentered
  // Gram eigenvector) via power iteration w ← (QᵀQ)·w. The corpus is
  // touched exactly ONCE: a single wide aggregate computes the 64×64
  // integer Gram matrix G = QᵀQ as its 2 080 upper-triangle BIGINT
  // sums G_jk = Σ_i q_ij·q_ik (explode→groupBy with map-side partials
  // — 2 080 groups, so each partition pre-reduces to 2 080 rows before
  // the shuffle), and all 60 power rounds then run driver-side on the
  // 4 096 collected longs. Bit-identical to iterating over the corpus:
  // y_j = Σ_i (Σ_k q_ik·w_k)·q_ij = Σ_k G_jk·w_k, and integer addition
  // is associativity-free — the DuckDB oracle still replays the NAIVE
  // per-round corpus form, so a green hash PROVES the identity
  // cross-engine. At 100 TB this reads 100 TB once instead of 6 PB
  // (the corpus-pass-per-round shape this replaced); the spectrum is
  // FLAT here (λ₂/λ₁ = 0.935, so alignment needs ~60 rounds) but
  // rounds are now free — O(rounds·dim²) driver flops, not
  // O(rounds·n·dim) cluster scans.
  //
  // Cross-engine determinism is the hard part: decimal-pinned sums of
  // FLOAT products tie at the DECIMAL cast (the 1-ulp limit that keeps
  // Lloyd means out of every output). The fix here is stronger —
  // EVERYTHING iterated is integer: the matrix is the int8-QUANTIZED
  // corpus (the SAME pinned quantizer as q_embed_quantize) and the
  // vector w is RE-QUANTIZED to int16 after every round (w ←
  // ⌊y·32767/max|y|+0.5⌋, all IEEE-deterministic scalar arithmetic on
  // exact ints). Bounds: |G_jk| ≤ 127²·n ≈ 1.6e4·n, |y_j| ≤
  // 64·127²·32767·n ≈ 3.4e10·(n/1000) — BIGINT-safe to n ≈ 2.7e8 rows
  // (beyond that, the documented switch is DECIMAL(38,0) Gram sums).
  // Quantization costs ~0.4%/round in direction noise vs a 6.5%/round
  // spectral-gap contraction, so the iteration converges to within
  // quantization noise of the true eigenvector (measured alignment
  // after 60 rounds: 0.9995). Doubles appear only in the final
  // normalize — sequential-fold norms over 64 exact ints, the same
  // bit-identical machinery as every cosine — so loadings and the
  // Rayleigh-style λ = ‖y_R‖/‖w_{R−1}‖ sit fully under the hash gate.
  private val PcaRounds = 60
  private val PcaWScale = 32767.0 // int16 re-quantization of w

  /** The one corpus pass: G = QᵀQ as 2 080 upper-triangle exact BIGINT
    * sums, mirrored into a dense 64×64 driver-side array. */
  private def pcaGram(qm: DataFrame): Array[Array[Long]] = {
    val rows = qm.select(explode(expr(
        "flatten(transform(sequence(0, 63), j -> " +
          "transform(sequence(j, 63), k -> struct(j AS j, k AS k, q[j] * q[k] AS p))))"))
        .as("e"))
      .groupBy(col("e.j").as("j"), col("e.k").as("k"))
      .agg(sum(col("e.p")).as("g"))
      .collect() // 2 080 model values — never corpus-sized
    val g = Array.ofDim[Long](64, 64)
    rows.foreach { r =>
      val j = r.getInt(0); val k = r.getInt(1); val v = r.getLong(2)
      g(j)(k) = v
      g(k)(j) = v
    }
    g
  }

  /** ⌊y·32767/max|y|+0.5⌋ — the int16 re-quantization, identical
    * IEEE ops to the SQL replay. */
  private def pcaRequant(y: Seq[Long]): Seq[Long] = {
    val mx = y.map(v => math.abs(v).toDouble).max
    require(mx > 0,
      "zero matvec — w orthogonal to the corpus or empty input; " +
        "refusing to requantize a degenerate direction")
    y.map(v => math.floor(v.toDouble * (PcaWScale / mx) + 0.5).toLong)
  }

  private def qPcaPower(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qm = Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .withColumn("q", expr(quantLetSql))
      .select(col("vec_id"), col("q"))
    val g = pcaGram(qm) // the single corpus pass
    var w: Seq[Long] = Seq.fill(64)(1L)
    var y: Seq[Long] = null
    var wPrev: Seq[Long] = null
    for (_ <- 1 to PcaRounds) {
      wPrev = w
      val wa = w.toArray
      y = (0 until 64).map { j =>
        var acc = 0L
        var k = 0
        while (k < 64) { acc += g(j)(k) * wa(k); k += 1 }
        acc
      }
      w = pcaRequant(y)
    }
    // norms as sequential left folds over the pos-ordered exact values
    // — the same association order as list_dot_product/graft_dot
    def norm(v: Seq[Long]): Double =
      math.sqrt(v.map(_.toDouble).foldLeft(0.0)((acc, x) => acc + x * x))
    val normW = norm(w)
    val lambda = norm(y) / norm(wPrev)
    (0 until 64).map { j =>
      (j.toLong, w(j), w(j).toDouble / normW, lambda)
    }.toDF("pos", "w_int", "loading", "lambda")
      .orderBy("pos")
  }

  // ---- Centroid outliers (mislabeled/corrupt-vector detection) -----
  //
  // Curation wants "the vectors farthest from their label's centroid"
  // — mislabeled rows, corrupt embeddings, or genuine hard cases. To
  // keep the WHOLE path integer-exact (no decimal-mean 1-ulp output
  // limit), the centroid is the per-dimension ROUNDED mean of the
  // int8-quantized vectors: round-half-up(S/n) = ⌊(2S+n)/(2n)+0⌋
  // computed as floor of an exact-int double division (both operands
  // < 2⁵³, so the division and floor are bit-identical across
  // engines; integer DIV would NOT be — Spark truncates toward zero,
  // DuckDB floors, and negative sums would diverge). The distance
  // d² = Σ(q_ij−c_j)² is then pure BIGINT. One narrow agg for the 64×L
  // centroid model, one broadcast join back, one TakeOrdered top-5 per
  // label — nothing corpus-sized shuffles except the label-keyed agg.
  private def qCentroidOutliers(s: SparkSession, d: String): DataFrame = {
    val qm = Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .withColumn("q", expr(quantLetSql))
      .select(col("vec_id"), col("label"), col("q"))
    val cent = qm.select(col("label"), posexplode(col("q")))
      .groupBy("label", "pos")
      .agg(sum(col("col")).as("sv"), count(lit(1)).as("n"))
      .withColumn("c", floor(
        (lit(2L) * col("sv") + col("n")).cast("double")
          / (lit(2L) * col("n")).cast("double")).cast("long"))
      // ordered collect: collect_list order is nondeterministic, so
      // sort (pos, c) structs and strip — the engine-side twin of
      // DuckDB's list(c ORDER BY i)
      .groupBy("label").agg(expr(
        "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cent"))
    val byD2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id"))
    qm.join(broadcast(cent), Seq("label"))
      .withColumn("d2", expr(
        "aggregate(zip_with(q, cent, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rank", row_number().over(byD2).cast("long"))
      .filter(col("rank") <= 5)
      .select("label", "rank", "vec_id", "d2")
      .orderBy("label", "rank")
  }

  // ---- k-NN classification evaluation ------------------------------
  //
  // The label-quality check: classify each probe vector by the
  // majority label of its top-5 exact-cosine neighbors (self
  // excluded; ties → most-similar neighbor's side via (count, best
  // rank) ordering, then smallest label — all deterministic) and
  // report the verdict against the stored label. The evaluation
  // counterpart of q_hard_negatives: where that query MINES the
  // confusable pairs, this one MEASURES how confusable the labels
  // are. On this synthetic corpus the honest finding is accuracy ≈
  // chance (0.08 vs 10 labels) — the labels are not geometric, which
  // is precisely what a label-quality audit exists to surface. Same
  // broadcast-scan shape as q_sim_bruteforce; at corpus scale the
  // neighbor stage swaps to LSH/IVF/PQ like every ANN consumer.
  private def qKnnClassify(s: SparkSession, d: String): DataFrame = {
    VectorExpressions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble("embedding").as("vec"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("label").as("true_label"),
        col("vec").as("q_vec"))
    val c = e.select(col("vec_id").as("c_id"), col("label").as("c_label"),
      col("vec").as("c_vec"))
    val byCos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    val nn = broadcast(q).join(c, col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine("q_vec", "c_vec"))
      .withColumn("rank", row_number().over(byCos))
      .filter(col("rank") <= 5)
    val byVote = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("best_rank").asc, col("c_label").asc)
    nn.groupBy("q_id", "true_label", "c_label")
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
      .withColumn("vr", row_number().over(byVote))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("true_label"),
        col("c_label").as("pred_label"), col("votes"),
        (col("c_label") === col("true_label")).as("correct"))
      .orderBy("q_id")
  }

  // ---- Johnson–Lindenstrauss ±1 random projection ------------------
  //
  // Achlioptas-style database-friendly JL: project the int8-quantized
  // corpus (the SAME pinned quantizer as q_embed_quantize) through a
  // deterministic ±1 sign matrix to 16 dims. The sign for (d, j) is
  // the parity of the first hex digit of md5("d_j") — computed
  // driver-side here and RE-DERIVED inside the oracle SQL with
  // DuckDB's own md5, so the matrix is pinned cross-engine by
  // construction, not by trusting an RNG. All arithmetic is exact:
  // |y_j| ≤ 64·127 = 8128, BIGINT everywhere. Scale shape: a narrow
  // per-row map (no shuffle — the projection of 100 TB of embeddings
  // is embarrassingly parallel), 4× dimension cut before any ANN or
  // clustering pass downstream.
  private val JlOut = 16
  private val JlHexOrder = "0123456789abcdef"

  /** Literal Spark-SQL array(array(...)) of the [j][d] sign matrix —
    * baked into the plan as a constant, so codegen sees ±1 literals
    * rather than 1 024 per-row md5 calls. */
  private lazy val jlSignSql: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = (0 until JlOut).map { j =>
      val signs = (1 to 64).map { dd =>
        val hex = md.digest(s"${dd}_$j".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        // strpos('0123456789abcdef', c) % 2 = 1 → +1, same as the oracle
        if ((JlHexOrder.indexOf(hex.charAt(0)) + 1) % 2 == 1) "1L" else "-1L"
      }
      s"array(${signs.mkString(",")})"
    }
    s"array(${rows.mkString(",")})"
  }

  private def qEmbedProject(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .withColumn("q", expr(quantLetSql))
      .withColumn("jl_signs", expr(jlSignSql))
      // bind `q` as the HOF argument (the transform(array(x), v -> …)
      // "let") — referenced only inside the fold lambda it would be
      // inlined by CollapseProject and re-quantized per (j, dd) term
      .withColumn("ys", expr(
        s"element_at(transform(array(q), qb -> transform(sequence(0, ${JlOut - 1}), " +
          "j -> aggregate(sequence(1, 64), 0L, " +
          "(acc, dd) -> acc + element_at(qb, dd) * element_at(element_at(jl_signs, j + 1), dd)))), 1)"))
      // posexplode_OUTER: plain posexplode plans a non-empty pre-filter
      // that duplicates the whole `ys` expression into the scan's
      // DataFilters — every projection would be computed twice. ys is
      // always 16-wide here, so outer is semantically identical.
      .select(col("vec_id"), posexplode_outer(col("ys")).as(Seq("j", "y")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("y"))
      .orderBy("vec_id", "j")

  // ---- Maximal marginal relevance (Carbonell & Goldstein 1998) -----
  //
  // Diversified top-k: greedily pick the candidate maximizing
  // λ·rel − (1−λ)·max-sim-to-selected with λ = 2/3, scaled ×3 so the
  // score is the exact BIGINT 2·rel − max_sim (rel and sim are
  // quantized-int dots — the same pinned quantizer as everywhere).
  // The retrieval half is distributed (per-query top-MmrCand by exact
  // dot through one ranking window); the greedy half runs driver-side
  // over the collected candidate set — bounded model state
  // (MmrQueries × MmrCand rows of 64 ints), the sanctioned pattern.
  // At 100 TB the candidate generation is the cost; the greedy is
  // O(K·C²) on 60 rows regardless of corpus size. The oracle replays
  // the greedy as MmrK unrolled MATERIALIZED selection rounds with the
  // identical (score DESC, vec_id) argmax order.
  private val MmrQueries = 3
  private val MmrCand = 20
  private val MmrK = 8

  private def qMmr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qm = Tables.embeddings(s, d)
      .withColumn("vec", asDouble("embedding"))
      .withColumn("q", expr(quantLetSql))
      .select(col("vec_id"), col("q"))
    val queryVecs = qm.filter(col("vec_id") < MmrQueries)
      .select(col("vec_id").as("q_id"), col("q").as("qv"))
    val cands = qm.join(broadcast(queryVecs), col("vec_id") =!= col("q_id"))
      .withColumn("rel", expr(
        "aggregate(zip_with(q, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("rn") <= MmrCand)
      .select(col("q_id"), col("vec_id"), col("rel"), col("q"))
      .collect() // bounded: MmrQueries × MmrCand candidate rows
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var acc = 0L
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val out = cands.groupBy(_.getLong(0)).toSeq.flatMap { case (qid, rows) =>
      val cs = rows.map(r => (r.getLong(1), r.getLong(2), r.getSeq[Long](3).toArray))
      val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Array[Long], Long)]()
      while (selected.size < MmrK) {
        val best = cs.filterNot(c => selected.exists(_._1 == c._1)).map { c =>
          val maxSim = if (selected.isEmpty) 0L
            else selected.map(sd => dot(c._3, sd._3)).max
          (c._1, c._2, c._3, 2L * c._2 - maxSim)
        }.minBy(t => (-t._4, t._1))
        selected += best
      }
      selected.zipWithIndex.map { case ((vid, rel, _, score), i) =>
        (qid, (i + 1).toLong, vid, rel, score)
      }
    }
    out.sortBy(t => (t._1, t._2)).toDF("q_id", "rank", "vec_id", "rel", "mmr_score")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_embed_project" -> (qEmbedProject _),
    "q_mmr" -> (qMmr _),
    "q_pca_power" -> (qPcaPower _),
    "q_centroid_outliers" -> (qCentroidOutliers _),
    "q_knn_classify" -> (qKnnClassify _),
    "q_sim_bruteforce" -> (qSimBruteforce _),
    "q_mrl_recall" -> (qMrlRecall _),
    "q_mutual_nn" -> (qMutualNn _),
    "q_embed_norms" -> (qEmbedNorms _),
    "q_embed_stats" -> (qEmbedStats _),
    "q_sim_lsh" -> (qSimLsh _),
    "q_sim_ivf" -> (qSimIvf _),
    "q_ivf_assign" -> (qIvfAssign _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_sim_pq" -> (qSimPq _),
    "q_sim_ivfpq" -> (qSimIvfpq _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_embed_dedup" -> (qEmbedDedup _),
    "q_semdedup" -> (qSemdedup _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_rebalance" -> (qRebalance _)
  )

  /** One unrolled per-subspace Lloyd round over CTEs `sub` and `prev`
    * (assign by min L2² in the pinned association order →
    * decimal-exact per-dim means → empty cells keep their centroid) —
    * the PQ analog of [[ivfIterationSql]]. */
  private def pqIterationSql(prev: String): String =
    s"""pa_$prev AS (
       |  SELECT vec_id, m, sv, cell FROM (
       |    SELECT s.vec_id, s.m, s.sv, c.cell,
       |           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
       |             list_dot_product(s.sv, s.sv) - 2.0 * list_dot_product(s.sv, c.cent)
       |               + list_dot_product(c.cent, c.cent) ASC,
       |             c.cell) AS rk
       |    FROM sub s JOIN $prev c ON s.m = c.m)
       |  WHERE rk = 1
       |), pm_$prev AS (
       |  SELECT m, cell, i,
       |         CAST(SUM(CAST(sv[i] AS DECIMAL(30,15))) AS DOUBLE)
       |           / CAST(COUNT(*) AS DOUBLE) AS mu
       |  FROM pa_$prev CROSS JOIN range(1, ${PqSubDim + 1}) r(i)
       |  GROUP BY m, cell, i
       |), pnext_$prev AS (
       |  SELECT p.m, p.cell, COALESCE(mm.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN (
       |    SELECT m, cell, list(mu ORDER BY i) AS cent
       |    FROM pm_$prev GROUP BY m, cell) mm
       |  ON p.m = mm.m AND p.cell = mm.cell
       |)""".stripMargin

  /** Subvector explode + seeded per-subspace codebooks + all
    * [[PqLloyd]] unrolled rounds — the SQL twin of qSimPq's codebook
    * training. Final codebooks land in CTE `pc{PqLloyd}`. */
  private def pqChainSql: String = {
    val chain = (0 until PqLloyd).map { i =>
      s",\n${pqIterationSql(s"pc$i")},\npc${i + 1} AS (SELECT m, cell, cent FROM pnext_pc$i)"
    }.mkString
    s"""sub AS (
       |  SELECT vec_id, m,
       |         vec[m * $PqSubDim + 1 : m * $PqSubDim + $PqSubDim] AS sv
       |  FROM v CROSS JOIN range(0, $PqM) r(m)
       |), pseeds AS (
       |  SELECT vec_id, vec FROM v
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqK
       |), pc0 AS (
       |  SELECT m,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY vec_id) - 1
       |              AS BIGINT) AS cell,
       |         vec[m * $PqSubDim + 1 : m * $PqSubDim + $PqSubDim] AS cent
       |  FROM pseeds CROSS JOIN range(0, $PqM) r(m)
       |)$chain""".stripMargin
  }

  /** Exact-cosine SQL fragment (sequential left-fold dot products —
    * bit-identical to the Spark expressions, see the object doc). */
  private def cosSql(a: String, b: String): String =
    s"""list_dot_product($a, $b)
       |             / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin

  /** One unrolled Lloyd round over CTE `v` (assign by max cosine →
    * decimal-exact per-dim means → empty cells keep their centroid). */
  private def ivfIterationSql(prev: String): String =
    s"""a_$prev AS (
       |  SELECT vec_id, vec, cell FROM (
       |    SELECT v.vec_id, v.vec, c.cell,
       |           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |             ${cosSql("v.vec", "c.cent")} DESC,
       |             c.cell) AS rk
       |    FROM v CROSS JOIN $prev c)
       |  WHERE rk = 1
       |), m_$prev AS (
       |  SELECT cell, i,
       |         CAST(SUM(CAST(vec[i] AS DECIMAL(30,15))) AS DOUBLE)
       |           / CAST(COUNT(*) AS DOUBLE) AS mu
       |  FROM a_$prev CROSS JOIN range(1, 65) r(i)
       |  GROUP BY cell, i
       |), next_$prev AS (
       |  SELECT p.cell, COALESCE(m.cent, p.cent) AS cent
       |  FROM $prev p LEFT JOIN (
       |    SELECT cell, list(mu ORDER BY i) AS cent FROM m_$prev GROUP BY cell) m
       |  USING (cell)
       |)""".stripMargin

  /** Seeds + c0 + all [[LloydIters]] unrolled rounds over whatever `v`
    * CTE the caller defined — the SQL twin of [[lloydScored]], shared
    * by the q_sim_ivf and q_semdedup oracles so the two k-means
    * replays can never drift. Final centroids land in CTE
    * `c{LloydIters}`. */
  private val ivfSeedChainSql: String = {
    val chain = (0 until LloydIters).map { i =>
      s",\n${ivfIterationSql(s"c$i")},\nc${i + 1} AS (SELECT cell, cent FROM next_c$i)"
    }.mkString
    s"""seeds AS (
       |  SELECT vec_id, vec FROM v
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $IvfK
       |), c0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell, vec AS cent
       |  FROM seeds
       |)$chain""".stripMargin
  }

  private val oracleBase: Map[String, String] = Map(
    "q_embed_project" ->
      """WITH signs AS (
        |  SELECT d, j,
        |         CASE WHEN strpos('0123456789abcdef',
        |                          substr(md5(CAST(d AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) % 2 = 1
        |              THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(generate_series(1, 64)) AS d),
        |       (SELECT unnest(generate_series(0, 15)) AS j)
        |), v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), quant AS (
        |  SELECT vec_id,
        |         list_transform(vec, x -> CAST(floor(x * (127.0 / list_reduce(list_transform(vec, y -> abs(y)), (a, b) -> greatest(a, b))) + 0.5) AS BIGINT)) AS q
        |  FROM v)
        |SELECT t.vec_id, CAST(s.j AS BIGINT) AS j, CAST(SUM(t.q[s.d] * s.s) AS BIGINT) AS y
        |FROM quant t, signs s
        |GROUP BY t.vec_id, s.j
        |ORDER BY t.vec_id, j""".stripMargin,
    "q_embed_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), scaled AS (
        |  SELECT vec_id, label, vec,
        |         list_reduce(list_transform(vec, x -> abs(x)), (a, b) -> greatest(a, b)) AS max_abs
        |  FROM v
        |), quant AS (
        |  SELECT vec_id, label, vec, max_abs, 127.0 / max_abs AS scale,
        |         list_transform(vec, x -> CAST(floor(x * (127.0 / max_abs) + 0.5) AS BIGINT)) AS q
        |  FROM scaled)
        |SELECT vec_id, label, max_abs, scale,
        |       q[1] AS q0, q[2] AS q1, q[3] AS q2, q[4] AS q3,
        |       abs(CAST(q[1] AS DOUBLE) / scale - vec[1]) AS recon_err0,
        |       CAST(list_reduce(list_transform(q, x -> abs(x)), (a, b) -> a + b) AS BIGINT) AS l1_quant
        |FROM quant
        |ORDER BY vec_id""".stripMargin,
    "q_mutual_nn" ->
      """WITH v AS (
        |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), scored AS (
        |  SELECT q.label, q.vec_id AS a, c.vec_id AS b,
        |         list_dot_product(q.vec, c.vec)
        |           / (sqrt(list_dot_product(q.vec, q.vec))
        |              * sqrt(list_dot_product(c.vec, c.vec))) AS cosine
        |  FROM v q JOIN v c ON q.label = c.label AND q.vec_id <> c.vec_id
        |), ranked AS (
        |  SELECT label, a, b, cosine, rk FROM (
        |    SELECT label, a, b, cosine,
        |           ROW_NUMBER() OVER (PARTITION BY label, a
        |                              ORDER BY cosine DESC, b) AS rk
        |    FROM scored)
        |  WHERE rk <= 3
        |)
        |SELECT r1.label AS label, r1.a AS a, r1.b AS b, r1.cosine AS cosine,
        |       r1.rk AS rank_ab, r2.rk AS rank_ba
        |FROM ranked r1
        |JOIN ranked r2 ON r1.label = r2.label AND r1.a = r2.b AND r1.b = r2.a
        |WHERE r1.a < r1.b
        |ORDER BY r1.label, r1.a, r1.b""".stripMargin,
    "q_mrl_recall" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |sc AS MATERIALIZED (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         list_dot_product(q.vec, c.vec)
        |           / (sqrt(list_dot_product(q.vec, q.vec))
        |              * sqrt(list_dot_product(c.vec, c.vec))) AS cos_full,
        |         list_dot_product(q.vec[1:16], c.vec[1:16])
        |           / (sqrt(list_dot_product(q.vec[1:16], q.vec[1:16]))
        |              * sqrt(list_dot_product(c.vec[1:16], c.vec[1:16]))) AS cos_16,
        |         list_dot_product(q.vec[1:32], c.vec[1:32])
        |           / (sqrt(list_dot_product(q.vec[1:32], q.vec[1:32]))
        |              * sqrt(list_dot_product(c.vec[1:32], c.vec[1:32]))) AS cos_32
        |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
        |), full5 AS MATERIALIZED (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_full DESC, c_id) AS rk
        |    FROM sc) WHERE rk <= 5
        |), p16 AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_16 DESC, c_id) AS rk
        |    FROM sc) WHERE rk <= 5
        |), p32 AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_32 DESC, c_id) AS rk
        |    FROM sc) WHERE rk <= 5
        |), probes AS (SELECT DISTINCT q_id FROM full5
        |), h16 AS (
        |  SELECT p.q_id, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM p16 p JOIN full5 f ON f.q_id = p.q_id AND f.c_id = p.c_id GROUP BY 1
        |), h32 AS (
        |  SELECT p.q_id, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM p32 p JOIN full5 f ON f.q_id = p.q_id AND f.c_id = p.c_id GROUP BY 1
        |), u AS (
        |  SELECT CAST(16 AS BIGINT) AS prefix_dim, probes.q_id,
        |         COALESCE(h16.n_common, 0) AS n_common
        |  FROM probes LEFT JOIN h16 ON h16.q_id = probes.q_id
        |  UNION ALL
        |  SELECT CAST(32 AS BIGINT), probes.q_id, COALESCE(h32.n_common, 0)
        |  FROM probes LEFT JOIN h32 ON h32.q_id = probes.q_id
        |)
        |SELECT prefix_dim, q_id, n_common,
        |       CAST(n_common AS DOUBLE) / 5.0 AS recall_at_5
        |FROM u ORDER BY prefix_dim, q_id""".stripMargin,
    "q_sim_bruteforce" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         list_dot_product(q.vec, c.vec)
        |           / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))) AS cosine
        |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT q_id, rank, c_id, cosine FROM (
        |  SELECT q_id, c_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    "q_embed_norms" ->
      """SELECT vec_id, label,
        |       sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS l2_norm,
        |       len(embedding) AS dim
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "q_embed_stats" ->
      """SELECT label, COUNT(*) AS n,
        |       CAST(MIN(len(embedding)) AS BIGINT) AS min_dim,
        |       CAST(MAX(len(embedding)) AS BIGINT) AS max_dim,
        |       MIN(CAST(embedding[1] AS DOUBLE)) AS min_c0,
        |       MAX(CAST(embedding[1] AS DOUBLE)) AS max_c0
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin,
    "q_embed_drift" -> {
      // the same Lloyd chain, then the integer-exact TV arithmetic
      // over even/odd vec_id halves — counts and terms all BIGINTs,
      // one IEEE division at the end
      val cFinal = s"c$LloydIters"
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), $ivfSeedChainSql,
         |scored AS (
         |  SELECT v.vec_id, v.vec, c.cell,
         |         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${cosSql("v.vec", "c.cent")} DESC,
         |           c.cell) AS p_rank
         |  FROM v CROSS JOIN $cFinal c
         |), assigned AS (
         |  SELECT vec_id, cell FROM scored WHERE p_rank = 1
         |), counts AS (
         |  SELECT cell,
         |         CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         |         CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
         |  FROM assigned GROUP BY cell
         |), tot AS (
         |  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
         |         CAST(SUM(c_cur) AS BIGINT) AS n_cur
         |  FROM counts
         |), terms AS (
         |  SELECT cell, c_ref, c_cur,
         |         CAST(abs(c_ref * n_cur - c_cur * n_ref) AS BIGINT) AS tv_term,
         |         n_ref, n_cur
         |  FROM counts CROSS JOIN tot
         |), tv AS (
         |  SELECT CAST(SUM(tv_term) AS BIGINT) AS tv_num FROM terms
         |)
         |SELECT cell, c_ref, c_cur, tv_term, n_ref, n_cur, tv_num,
         |       CAST(tv_num AS DOUBLE)
         |         / (2.0 * CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) AS tv
         |FROM terms CROSS JOIN tv
         |ORDER BY cell""".stripMargin
    },
    "q_ivf_assign" -> {
      // the streaming ANN ingest's batch analog replayed end-to-end:
      // seeded-Lloyd model, per-vector cell argmax (Lloyd tie-break),
      // deterministic keeper subset assigned through the SAME model,
      // cell-keyed join, exact-cosine top-1 (NULL when the cell holds
      // no keeper; no partition ever mixes NULL and non-NULL, so the
      // cross-engine null-ordering divergence cannot bite)
      val cFinal = s"c$LloydIters"
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), $ivfSeedChainSql,
         |scored AS (
         |  SELECT v.vec_id, v.vec, c.cell,
         |         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${cosSql("v.vec", "c.cent")} DESC,
         |           c.cell) AS p_rank
         |  FROM v CROSS JOIN $cFinal c
         |), assigned AS (
         |  SELECT vec_id, vec, cell FROM scored WHERE p_rank = 1
         |), keepers AS (
         |  SELECT cell, vec_id AS k_id, vec AS k_vec
         |  FROM assigned WHERE vec_id % 7 = 0
         |), lab AS (
         |  SELECT a.vec_id, a.cell, k.k_id AS keeper_id,
         |         CASE WHEN k.k_id IS NOT NULL
         |              THEN ${cosSql("a.vec", "k.k_vec")} END AS keeper_cos
         |  FROM assigned a LEFT JOIN keepers k ON k.cell = a.cell
         |), ranked AS (
         |  SELECT vec_id, cell, keeper_id, keeper_cos,
         |         ROW_NUMBER() OVER (PARTITION BY vec_id
         |                            ORDER BY keeper_cos DESC, keeper_id) AS k_rank
         |  FROM lab
         |)
         |SELECT vec_id, cell, keeper_id, keeper_cos FROM ranked WHERE k_rank = 1
         |ORDER BY vec_id""".stripMargin
    },
    "q_sim_ivf" -> {
      // the full IVF pipeline in SQL, generated from the SAME constants
      // as the Spark side (IvfK / IvfProbes / LloydIters): md5-ordered
      // seeds → LloydIters unrolled assign+mean rounds (decimal-exact
      // sums divided in double — the cross-engine AVG pin; empty cells
      // keep their centroid via the LEFT JOIN COALESCE) → probe top-3
      // cells → exact cosine refine, top-5
      val cFinal = s"c$LloydIters"
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), $ivfSeedChainSql,
         |scored AS (
         |  SELECT v.vec_id, v.vec, c.cell,
         |         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${cosSql("v.vec", "c.cent")} DESC,
         |           c.cell) AS p_rank
         |  FROM v CROSS JOIN $cFinal c
         |), assigned AS (
         |  SELECT vec_id AS c_id, vec AS c_vec, cell FROM scored WHERE p_rank = 1
         |), probes AS (
         |  SELECT vec_id AS q_id, vec AS q_vec, cell FROM scored
         |  WHERE vec_id < 10 AND p_rank <= $IvfProbes
         |), refined AS (
         |  SELECT q_id, c_id, cell, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
         |  FROM (
         |    SELECT p.q_id, a.c_id, a.cell,
         |           ${cosSql("p.q_vec", "a.c_vec")} AS cosine
         |    FROM probes p JOIN assigned a USING (cell)
         |    WHERE p.q_id <> a.c_id)
         |)
         |SELECT q_id, rank, c_id, cell, cosine FROM refined
         |WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q_sim_lsh" -> {
      val p = AnnLsh
      val bandCols = (0 until p.bands).map(b =>
        s"CAST(${bandBucketSql("vec", b, p, 64)} AS BIGINT) AS b$b").mkString(", ")
      // probe-set membership, both directions at once: q probes its own
      // bucket plus every single-bit flip, so c is a candidate iff the
      // two 5-bit buckets differ in at most one bit in SOME band
      val anyBandProbe = (0 until p.bands)
        .map(b => s"bit_count(xor(q.b$b, c.b$b)) <= 1").mkString(" OR ")
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), bk AS (
         |  SELECT vec_id, vec, $bandCols FROM v
         |), scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |         list_dot_product(q.vec, c.vec)
         |           / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))) AS cosine
         |  FROM bk q JOIN bk c
         |    ON q.vec_id < 10 AND q.vec_id <> c.vec_id AND ($anyBandProbe))
         |SELECT q_id, rank, c_id, cosine FROM (
         |  SELECT q_id, c_id, cosine,
         |         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q_embed_dedup" -> {
      val bandCols = (0 until DedupLsh.bands).map(b =>
        s"CAST(${bandBucketSql("vec", b, DedupLsh, 64)} AS BIGINT) AS b$b").mkString(", ")
      val anyBand = (0 until DedupLsh.bands).map(b => s"a.b$b = b.b$b").mkString(" OR ")
      s"""WITH e AS (
         |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), dbl AS (
         |  SELECT vec_id, label, vec FROM e
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, label, vec FROM e
         |), bk AS (
         |  SELECT vec_id, label, vec, $bandCols
         |  FROM dbl
         |)
         |SELECT a.label, a.vec_id AS a_id, b.vec_id AS b_id,
         |       list_dot_product(a.vec, b.vec)
         |         / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) AS cosine
         |FROM bk a JOIN bk b ON ($anyBand) AND a.vec_id < b.vec_id
         |WHERE list_dot_product(a.vec, b.vec)
         |        / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))) > $DedupCosine
         |ORDER BY a_id, b_id""".stripMargin
    },
    "q_sim_pq" -> {
      // the full PQ pipeline in SQL, generated from the SAME constants
      // as the Spark side (PqM / PqSubDim / PqK / PqLloyd / PqRefine):
      // per-subspace seeded codebooks → Lloyd rounds → encode → ADC
      // via LUT join → approx top-PqRefine → exact-cosine top-5
      val pFinal = s"pc$PqLloyd"
      val pCols = (0 until PqM).map(m =>
        s"SUM(CASE WHEN q.m = $m THEN q.pdot END) AS p$m").mkString(",\n")
      val pSum = (0 until PqM).map(m => s"p$m").mkString(" + ")
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), $pqChainSql,
         |enc AS (
         |  SELECT vec_id AS c_id, m, cell FROM (
         |    SELECT s.vec_id, s.m, c.cell,
         |           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |             list_dot_product(s.sv, s.sv) - 2.0 * list_dot_product(s.sv, c.cent)
         |               + list_dot_product(c.cent, c.cent) ASC,
         |             c.cell) AS rk
         |    FROM sub s JOIN $pFinal c ON s.m = c.m)
         |  WHERE rk = 1
         |), qd AS (
         |  SELECT s.vec_id AS q_id, s.m, c.cell,
         |         list_dot_product(s.sv, c.cent) AS pdot
         |  FROM sub s JOIN $pFinal c ON s.m = c.m
         |  WHERE s.vec_id < 10
         |), adc AS (
         |  SELECT q.q_id, e.c_id,
         |         $pCols
         |  FROM qd q JOIN enc e ON q.m = e.m AND q.cell = e.cell
         |  WHERE q.q_id <> e.c_id
         |  GROUP BY q.q_id, e.c_id
         |), cand AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q_id, c_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |                              ORDER BY $pSum DESC, c_id) AS ark
         |    FROM adc)
         |  WHERE ark <= $PqRefine
         |)
         |SELECT q_id, rank, c_id, cosine FROM (
         |  SELECT c.q_id, c.c_id,
         |         ${cosSql("a.vec", "b.vec")} AS cosine,
         |         ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY
         |           ${cosSql("a.vec", "b.vec")} DESC,
         |           c.c_id) AS rank
         |  FROM cand c JOIN v a ON a.vec_id = c.q_id JOIN v b ON b.vec_id = c.c_id)
         |WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q_centroid_outliers" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), sc AS (
        |  SELECT vec_id, label, vec,
        |         127.0 / list_reduce(list_transform(vec, x -> abs(x)),
        |                             (a, b) -> greatest(a, b)) AS scale
        |  FROM v
        |), qm AS MATERIALIZED (
        |  SELECT vec_id, label,
        |         list_transform(vec, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
        |  FROM sc
        |), cent AS MATERIALIZED (
        |  SELECT label, list(c ORDER BY i) AS cent FROM (
        |    SELECT label, i,
        |           CAST(floor(CAST(2 * SUM(q[i]) + COUNT(*) AS DOUBLE)
        |                      / CAST(2 * COUNT(*) AS DOUBLE)) AS BIGINT) AS c
        |    FROM qm CROSS JOIN range(1, 65) r(i)
        |    GROUP BY label, i)
        |  GROUP BY label
        |), scd AS (
        |  SELECT qm.label, qm.vec_id,
        |         list_reduce(list_transform(range(1, 65),
        |                       i -> (q[i] - cent[i]) * (q[i] - cent[i])),
        |                     (a, b) -> a + b) AS d2
        |  FROM qm JOIN cent USING (label)
        |)
        |SELECT label, rank, vec_id, d2 FROM (
        |  SELECT label, vec_id, d2,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY label
        |                ORDER BY d2 DESC, vec_id) AS BIGINT) AS rank
        |  FROM scd)
        |WHERE rank <= 5
        |ORDER BY label, rank""".stripMargin,
    "q_knn_classify" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), nn AS (
        |  SELECT q_id, true_label, c_label, rank FROM (
        |    SELECT q.vec_id AS q_id, q.label AS true_label, c.label AS c_label,
        |           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_dot_product(q.vec, c.vec)
        |               / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))) DESC,
        |             c.vec_id) AS rank
        |    FROM v q JOIN v c ON q.vec_id < 50 AND q.vec_id <> c.vec_id)
        |  WHERE rank <= 5
        |), votes AS (
        |  SELECT q_id, true_label, c_label, CAST(COUNT(*) AS BIGINT) AS votes,
        |         MIN(rank) AS best_rank
        |  FROM nn GROUP BY q_id, true_label, c_label
        |)
        |SELECT q_id, true_label, pred_label, votes, correct FROM (
        |  SELECT q_id, true_label, c_label AS pred_label, votes,
        |         c_label = true_label AS correct,
        |         ROW_NUMBER() OVER (PARTITION BY q_id
        |           ORDER BY votes DESC, best_rank ASC, c_label ASC) AS vr
        |  FROM votes)
        |WHERE vr = 1
        |ORDER BY q_id""".stripMargin,
    "q_pca_power" -> {
      // the integer-exact power iteration replayed round for round:
      // same quantizer as q_embed_quantize, same fold orders, same
      // IEEE re-quantization arithmetic. Every chain CTE is
      // MATERIALIZED — DuckDB inlines plain CTEs per reference, and a
      // 60-round chain would otherwise expand exponentially.
      val chain = (0 until PcaRounds).map { r =>
        s"""t$r AS MATERIALIZED (
           |  SELECT q, list_reduce(list_transform(range(1, 65), i -> q[i] * w[i]),
           |                        (a, b) -> a + b) AS t
           |  FROM qm CROSS JOIN w$r
           |), y$r AS MATERIALIZED (
           |  SELECT i, CAST(SUM(t * q[i]) AS BIGINT) AS y
           |  FROM t$r CROSS JOIN range(1, 65) r(i) GROUP BY i
           |), w${r + 1} AS MATERIALIZED (
           |  SELECT list(CAST(floor(CAST(y AS DOUBLE) * ($PcaWScale / mx) + 0.5) AS BIGINT)
           |              ORDER BY i) AS w
           |  FROM y$r CROSS JOIN (SELECT MAX(CAST(abs(y) AS DOUBLE)) AS mx FROM y$r) m
           |)""".stripMargin
      }.mkString(",\n")
      val last = PcaRounds - 1
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), sc AS (
         |  SELECT vec_id, vec,
         |         127.0 / list_reduce(list_transform(vec, x -> abs(x)),
         |                             (a, b) -> greatest(a, b)) AS scale
         |  FROM v
         |), qm AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(vec, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
         |  FROM sc
         |), w0 AS (
         |  SELECT list_transform(range(1, 65), i -> CAST(1 AS BIGINT)) AS w
         |),
         |$chain,
         |wf AS (
         |  SELECT w, list_transform(w, x -> CAST(x AS DOUBLE)) AS wd FROM w$PcaRounds
         |), nw AS (
         |  SELECT sqrt(list_dot_product(wd, wd)) AS normw FROM wf
         |), yl AS (
         |  SELECT list(CAST(y AS DOUBLE) ORDER BY i) AS yd FROM y$last
         |), ny AS (
         |  SELECT sqrt(list_dot_product(yd, yd)) AS normy FROM yl
         |), pl AS (
         |  SELECT list_transform(w, x -> CAST(x AS DOUBLE)) AS pd FROM w$last
         |), np AS (
         |  SELECT sqrt(list_dot_product(pd, pd)) AS normp FROM pl
         |)
         |SELECT CAST(i - 1 AS BIGINT) AS pos, w[i] AS w_int,
         |       CAST(w[i] AS DOUBLE) / normw AS loading,
         |       normy / normp AS lambda
         |FROM wf CROSS JOIN range(1, 65) r(i)
         |CROSS JOIN nw CROSS JOIN ny CROSS JOIN np
         |ORDER BY pos""".stripMargin
    },
    "q_sim_ivfpq" -> {
      // the composition of the two already-pinned model chains
      // (ivfSeedChainSql coarse cells + pqChainSql codebooks) plus the
      // candidate intersection — generated from the SAME constants as
      // the Spark side, so neither model can drift from its solo query
      val cFinal = s"c$LloydIters"
      val pFinal = s"pc$PqLloyd"
      val pCols = (0 until PqM).map(m =>
        s"SUM(CASE WHEN q.m = $m THEN q.pdot END) AS p$m").mkString(",\n")
      val pSum = (0 until PqM).map(m => s"p$m").mkString(" + ")
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), $ivfSeedChainSql,
         |$pqChainSql,
         |scored AS (
         |  SELECT v.vec_id, v.vec, c.cell,
         |         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${cosSql("v.vec", "c.cent")} DESC,
         |           c.cell) AS p_rank
         |  FROM v CROSS JOIN $cFinal c
         |), assigned AS (
         |  SELECT vec_id AS c_id, cell FROM scored WHERE p_rank = 1
         |), probes AS (
         |  SELECT vec_id AS q_id, cell FROM scored
         |  WHERE vec_id < 10 AND p_rank <= $IvfProbes
         |), enc AS (
         |  SELECT vec_id AS c_id, m, cell AS code FROM (
         |    SELECT s.vec_id, s.m, c.cell,
         |           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |             list_dot_product(s.sv, s.sv) - 2.0 * list_dot_product(s.sv, c.cent)
         |               + list_dot_product(c.cent, c.cent) ASC,
         |             c.cell) AS rk
         |    FROM sub s JOIN $pFinal c ON s.m = c.m)
         |  WHERE rk = 1
         |), qd AS (
         |  SELECT s.vec_id AS q_id, s.m, c.cell AS code,
         |         list_dot_product(s.sv, c.cent) AS pdot
         |  FROM sub s JOIN $pFinal c ON s.m = c.m
         |  WHERE s.vec_id < 10
         |), cand0 AS (
         |  SELECT p.q_id, a.c_id, a.cell
         |  FROM probes p JOIN assigned a USING (cell)
         |  WHERE p.q_id <> a.c_id
         |), adc AS (
         |  SELECT c0.q_id, c0.c_id, c0.cell,
         |         $pCols
         |  FROM cand0 c0
         |  JOIN enc e ON e.c_id = c0.c_id
         |  JOIN qd q ON q.q_id = c0.q_id AND q.m = e.m AND q.code = e.code
         |  GROUP BY c0.q_id, c0.c_id, c0.cell
         |), cand AS (
         |  SELECT q_id, c_id, cell FROM (
         |    SELECT q_id, c_id, cell,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |                              ORDER BY $pSum DESC, c_id) AS ark
         |    FROM adc)
         |  WHERE ark <= $PqRefine
         |)
         |SELECT q_id, rank, c_id, cell, cosine FROM (
         |  SELECT c.q_id, c.c_id, c.cell,
         |         ${cosSql("a.vec", "b.vec")} AS cosine,
         |         ROW_NUMBER() OVER (PARTITION BY c.q_id ORDER BY
         |           ${cosSql("a.vec", "b.vec")} DESC,
         |           c.c_id) AS rank
         |  FROM cand c JOIN v a ON a.vec_id = c.q_id JOIN v b ON b.vec_id = c.c_id)
         |WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label AS c_label,
        |         CASE WHEN q.label = c.label THEN 'pos' ELSE 'neg' END AS kind,
        |         list_dot_product(q.vec, c.vec)
        |           / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))) AS cosine
        |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
        |SELECT q_id, kind, rank, c_id, c_label, cosine FROM (
        |  SELECT q_id, kind, c_id, c_label, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY q_id, kind
        |                            ORDER BY cosine DESC, c_id) AS rank
        |  FROM scored)
        |WHERE (kind = 'pos' AND rank <= 2) OR (kind = 'neg' AND rank <= 3)
        |ORDER BY q_id, kind, rank""".stripMargin,
    "q_rebalance" ->
      """WITH e AS (
        |  SELECT vec_id, label FROM embeddings
        |), cnts AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY label
        |), t AS (
        |  SELECT MAX(cnt) AS target FROM cnts
        |), r AS (
        |  SELECT e.label, e.vec_id, c.cnt, t.target,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY e.label
        |              ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id) AS BIGINT) AS rn
        |  FROM e JOIN cnts c USING (label) CROSS JOIN t
        |), x AS (
        |  SELECT label, vec_id, cnt, target,
        |         CAST(floor(CAST(target - rn AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
        |           + 1 AS copies
        |  FROM r
        |)
        |SELECT * FROM (
        |  SELECT label, vec_id, cnt, target,
        |         unnest(generate_series(1, copies)) AS copy
        |  FROM x)
        |ORDER BY label, vec_id, copy""".stripMargin,
    "q_semdedup" -> {
      val cFinal = s"c$LloydIters"
      s"""WITH e0 AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
         |), v AS (
         |  SELECT vec_id, vec FROM e0
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, vec FROM e0
         |), $ivfSeedChainSql,
         |scored AS (
         |  SELECT v.vec_id, v.vec, c.cell,
         |         ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
         |           ${cosSql("v.vec", "c.cent")} DESC,
         |           c.cell) AS p_rank
         |  FROM v CROSS JOIN $cFinal c
         |), assigned AS (
         |  SELECT vec_id, vec, cell FROM scored WHERE p_rank = 1
         |), pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.vec", "b.vec")} > $SemDedupCosine
         |), mins AS (
         |  SELECT b_id AS vec_id, MIN(a_id) AS keeper FROM pairs GROUP BY b_id
         |)
         |SELECT s.vec_id, s.cell, (m.keeper IS NOT NULL) AS is_dup,
         |       COALESCE(m.keeper, s.vec_id) AS keeper_id
         |FROM assigned s LEFT JOIN mins m USING (vec_id)
         |ORDER BY s.vec_id""".stripMargin
    }
  )

  /** q_ann_recall's oracle embeds the SAME per-method SQL chains as
    * the solo ANN queries (each published oracle becomes a derived
    * table), so the recall table is recomputed end-to-end from the
    * raw embeddings — it can never drift from the per-method rows. */
  /** The MMR oracle: candidates + pairwise sims, then MmrK unrolled
    * MATERIALIZED greedy rounds replaying the driver-side argmax with
    * the identical (score DESC, vec_id) order. */
  private def mmrOracle: String = {
    val rounds = (2 to MmrK).map { k =>
      s"""sel$k AS MATERIALIZED (
         |  SELECT * FROM sel${k - 1}
         |  UNION ALL
         |  SELECT q_id, vec_id, rel, score, CAST($k AS BIGINT) AS rank FROM (
         |    SELECT q_id, vec_id, rel, score,
         |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |    FROM (
         |      SELECT c.q_id, c.vec_id, c.rel,
         |             CAST(2 * c.rel - (SELECT MAX(s.sim) FROM sims s
         |                               WHERE s.q_id = c.q_id AND s.a_id = c.vec_id
         |                                 AND s.b_id IN (SELECT vec_id FROM sel${k - 1} p2 WHERE p2.q_id = c.q_id)) AS BIGINT) AS score
         |      FROM cand c
         |      WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} p WHERE p.q_id = c.q_id AND p.vec_id = c.vec_id)))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
       |quant AS (
       |  SELECT vec_id,
       |         list_transform(vec, x -> CAST(floor(x * (127.0 / list_reduce(list_transform(vec, y -> abs(y)), (a, b) -> greatest(a, b))) + 0.5) AS BIGINT)) AS q
       |  FROM v),
       |qs AS (SELECT vec_id AS q_id, q AS qv FROM quant WHERE vec_id < $MmrQueries),
       |cand AS MATERIALIZED (
       |  SELECT q_id, vec_id, rel, q FROM (
       |    SELECT qs.q_id, t.vec_id,
       |           CAST(list_dot_product(t.q, qs.qv) AS BIGINT) AS rel, t.q,
       |           ROW_NUMBER() OVER (PARTITION BY qs.q_id
       |                              ORDER BY CAST(list_dot_product(t.q, qs.qv) AS BIGINT) DESC, t.vec_id) AS rn
       |    FROM quant t, qs WHERE t.vec_id <> qs.q_id)
       |  WHERE rn <= $MmrCand),
       |sims AS MATERIALIZED (
       |  SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
       |         CAST(list_dot_product(a.q, b.q) AS BIGINT) AS sim
       |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
       |sel1 AS MATERIALIZED (
       |  SELECT q_id, vec_id, rel, CAST(2 * rel AS BIGINT) AS score, CAST(1 AS BIGINT) AS rank FROM (
       |    SELECT q_id, vec_id, rel,
       |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rn
       |    FROM cand)
       |  WHERE rn = 1),
       |$rounds
       |SELECT q_id, rank, vec_id, rel, score AS mmr_score
       |FROM sel$MmrK
       |ORDER BY q_id, rank""".stripMargin
  }

  val oracle: Map[String, String] = oracleBase + ("q_mmr" -> mmrOracle) + ("q_ann_recall" -> {
    val anns = Seq("ivf" -> "q_sim_ivf", "ivfpq" -> "q_sim_ivfpq",
      "lsh" -> "q_sim_lsh", "pq" -> "q_sim_pq")
      .map { case (m, qn) =>
        s"SELECT '$m' AS method, q_id, c_id, rank FROM (${oracleBase(qn)})"
      }.mkString("\nUNION ALL\n")
    s"""WITH bf AS (SELECT q_id, c_id, rank FROM (${oracleBase("q_sim_bruteforce")})),
       |ann AS (
       |$anns
       |),
       |ks AS (SELECT unnest([1, 3, 5]) AS k),
       |j AS (
       |  SELECT m.method, k.k, b.rank AS bf_rank, a.rank AS ann_rank
       |  FROM bf b CROSS JOIN ks k CROSS JOIN (SELECT DISTINCT method FROM ann) m
       |  LEFT JOIN ann a ON a.method = m.method AND a.q_id = b.q_id AND a.c_id = b.c_id
       |)
       |SELECT method, CAST(k AS BIGINT) AS k,
       |       CAST(SUM(CASE WHEN bf_rank <= k AND ann_rank <= k THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |       CAST(SUM(CASE WHEN bf_rank <= k THEN 1 ELSE 0 END) AS BIGINT) AS total,
       |       CAST(SUM(CASE WHEN bf_rank <= k AND ann_rank <= k THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(SUM(CASE WHEN bf_rank <= k THEN 1 ELSE 0 END) AS DOUBLE) AS recall
       |FROM j GROUP BY method, k ORDER BY method, k""".stripMargin
  })
}

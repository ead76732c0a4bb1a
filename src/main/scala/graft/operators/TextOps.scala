package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text analysis + document deduplication for large-scale training-data
  * pipelines (driver north-star extensions; SURVEY.md §7.1 M4), over
  * the `documents` table.
  *
  * Scale design: every query is expressed as codegen-friendly Catalyst
  * expressions (higher-order array functions, no UDFs), aggregations
  * are partial+final hash aggregates, and the near-dup pipelines avoid
  * the O(n²) all-pairs comparison: exact dedup is a hash-groupBy;
  * shingle-Jaccard joins only docs that share a shingle; MinHash+LSH
  * joins only docs that collide in a band bucket. At 100 TB the
  * band/bucket join is the only shuffle whose size matters, and its
  * width is controlled by the band parameters, not the corpus size.
  *
  * Dedup queries run on a "doubled" corpus (the corpus unioned with an
  * id-shifted copy of itself) so the duplicate-collapse path is
  * actually exercised — the raw corpus has no exact duplicates.
  */
object TextOps {

  private val Stopwords = Seq("the", "a")

  /** Stride-1 span length for q_span_dedup (tokens per span). */
  private val SpanK = 8

  /** Deterministic 12-token boilerplate planted on every 7th doc —
    * q_span_dedup's duplication fixture (the raw corpus has no natural
    * repeated spans). Interpolated into BOTH engines' formulations. */
  private val BoilerTrailer =
    "subscribe to our newsletter for updates terms of service apply rights reserved"

  /** Per-source keep budget for q_domain_cap. */
  private val DomainCap = 15L

  private def tokens(c: String = "text") = split(col(c), " ")

  /** Corpus with a replayed copy (ids shifted by 1,000,000) — the
    * dedup fixture. Mirrored exactly in the oracle SQL CTE.
    */
  private def doubled(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text", "lang", "source", "n_chars")
    docs.union(docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
      .select("doc_id", "text", "lang", "source", "n_chars"))
  }

  private val doubledSql =
    """doubled AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars FROM documents
      |)""".stripMargin

  /** Shared oracle CTE chain: 60-bit md5-family SimHash signatures per
    * doubled doc (`sigd(doc_id, simhash)`) — the cross-engine twin of
    * [[md5SimhashSigs]], recomputing the 60 weighted bit sums in plain
    * SQL. Used by q_simhash_estimate, q_simhash_closure and
    * q_simhash_sizes so the three oracles can never drift apart. */
  private val md5SigSql =
    s"""$doubledSql,
       |tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS w
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM doubled)
       |  GROUP BY doc_id, tok
       |), th AS (
       |  SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h, w
       |  FROM tf
       |), bits AS (
       |  SELECT doc_id, j, SUM((((h >> j) & 1) * 2 - 1) * w) AS bsum
       |  FROM th CROSS JOIN range(0, 60) r(j)
       |  GROUP BY doc_id, j
       |), sigd AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN bsum > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  /** Oracle CTE chain extending [[md5SigSql]] with the keeper graph and
    * its transitive closure: `groups` (one keeper per distinct
    * signature), `near` (Hamming-≤3 keeper-to-keeper edges — the
    * all-pairs formulation, equal by pigeonhole to the banded join the
    * Spark side runs), and `reach`/`lbl` — a recursive-CTE fixpoint
    * whose min reachable keeper IS the component label the distributed
    * pointer-doubling CC must converge to. Requires WITH RECURSIVE. */
  private val md5ClosureSql =
    s"""$md5SigSql, groups AS (
       |  SELECT simhash, MIN(doc_id) AS keeper_id FROM sigd GROUP BY simhash
       |), near AS (
       |  SELECT a.keeper_id AS src, b.keeper_id AS dst
       |  FROM groups a JOIN groups b
       |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
       |), reach AS (
       |  SELECT keeper_id AS src, keeper_id AS dst FROM groups
       |  UNION
       |  SELECT r.src, n.dst FROM reach r JOIN near n ON r.dst = n.src
       |), lbl AS (
       |  SELECT src AS keeper_id, MIN(dst) AS cluster_keeper FROM reach GROUP BY src
       |)""".stripMargin

  /** Shared oracle CTE chain: PRODUCTION-family (xxhash64, seed 42)
    * SimHash signatures per doubled doc (`sigd(doc_id, simhash)`) —
    * the round-8 replacement for weak-checking q_dedup_simhash and
    * q_simhash_clusters: [[XxOracleSql]] recomputes Spark's exact
    * XXH64 per distinct token in DuckDB, then the 64 weighted bit
    * sums replay [[graft.functions.SimHashAgg]] (strict `bsum > 0`,
    * unsigned bit reads, signed 64-bit assembly) in plain SQL.
    * Requires the [[XxOracleSql.prelude]] macros in front of the
    * statement. */
  private val xxSigSql =
    s"""$doubledSql,
       |tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS w
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM doubled)
       |  GROUP BY doc_id, tok
       |), tokset AS (SELECT DISTINCT tok FROM tf),
       |  ${XxOracleSql.stages("tokset", "tok", "tok", "h64", 32, "g")},
       |th AS (SELECT tf.doc_id, gxx_ub(gfin.h64) AS hu, tf.w FROM tf JOIN gfin USING (tok)),
       |bits AS (
       |  SELECT doc_id, j, SUM((((hu // (1::HUGEINT << j)) % 2) * 2 - 1) * w) AS bsum
       |  FROM th CROSS JOIN range(0, 64) r(j)
       |  GROUP BY doc_id, j
       |), sigd AS (
       |  SELECT doc_id,
       |         gxx_sb(CAST(SUM(CASE WHEN bsum > 0 THEN (1::HUGEINT << j) ELSE 0::HUGEINT END) AS HUGEINT)) AS simhash
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  /** Shared oracle CTE chain: PRODUCTION-family (xxhash64) MinHash
    * state over the doubled corpus — DF-capped shingle hashes
    * (`kept(doc_id, h, hu, n_sh)`, `docn`), the 32 mixed signature
    * slots (`sigs(doc_id, sig)`), and the 8×4 banded rows with REAL
    * xxhash64 band keys (`banded(doc_id, band, bh)`). Mirrors
    * [[minhashSigFrame]]/[[minhashBands]] exactly; used by
    * q_dedup_minhash and q_decontaminate_fuzzy so the two oracles can
    * never drift apart. Requires the [[XxOracleSql.prelude]] macros. */
  private lazy val xxMinhashSql =
    s"""$doubledSql,
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
       |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
       |  FROM doubled
       |), ex AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), shset AS (SELECT DISTINCT s FROM ex),
       |  ${XxOracleSql.stages("shset", "s", "s", "h64", 96, "g")},
       |exh AS (
       |  SELECT ex.doc_id, gfin.h64 AS h, gxx_ub(gfin.h64) AS hu FROM ex JOIN gfin USING (s)
       |), dfd AS (
       |  SELECT doc_id, h, hu, COUNT(*) OVER (PARTITION BY h) AS df FROM exh
       |), kept AS (
       |  SELECT doc_id, h, hu, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
       |  FROM dfd WHERE df <= $ShingleDfCap
       |), ks(k, plo, phi, msk) AS (VALUES ${XxOracleSql.minhashSlotValues}),
       |slots AS (
       |  SELECT doc_id, k, MIN(gxx_sb(xor((hu % phi) * plo + hu // phi, msk))) AS slot
       |  FROM kept CROSS JOIN ks
       |  GROUP BY doc_id, k
       |), sigs AS (
       |  SELECT doc_id, list(slot ORDER BY k) AS sig FROM slots GROUP BY doc_id
       |), docn AS (
       |  SELECT doc_id, MAX(n_sh) AS n_sh FROM kept GROUP BY doc_id
       |), bandstr AS (
       |  SELECT doc_id, b AS band, array_to_string(sig[b*4+1 : b*4+4], ',') AS bs
       |  FROM sigs CROSS JOIN range(0, 8) r(b)
       |), bset AS (SELECT DISTINCT bs FROM bandstr),
       |  ${XxOracleSql.stages("bset", "bs", "bs", "bh", 96, "q")},
       |banded AS (
       |  SELECT bandstr.doc_id, bandstr.band, qfin.bh FROM bandstr JOIN qfin USING (bs)
       |)""".stripMargin

  /** Shared oracle CTE chain for the BPE family: vocabulary with char
    * symbols (`w0(word, freq, s)`), both trainer rounds (`b1`/`b2` =
    * argmax merges, `w1`/`w2` = vocab after applying them) — used by
    * q_bpe_merges and q_bpe_encode so the two oracles replay the SAME
    * trainer and can never drift apart. Mirrors [[bpeVocab]] /
    * [[bpeBestPair]] / [[bpeApplyMerge]]. */
  private val bpeSql =
    """w0 AS (
      |  SELECT word, list_transform(range(1, len(word) + 1), i -> word[i:i]) AS s,
      |         COUNT(*) AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY word
      |), e1 AS (
      |  SELECT freq, unnest(list_transform(range(1, len(s)), i ->
      |           struct_pack(a := s[i], b := s[i+1]))) AS p
      |  FROM w0
      |), p1 AS (
      |  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM e1 GROUP BY p.a, p.b
      |), b1 AS (
      |  SELECT a, b, cnt FROM p1 WHERE a <> b ORDER BY cnt DESC, a, b LIMIT 1
      |), m1 AS (SELECT a AS ma, b AS mb FROM b1),
      |w1 AS (
      |  SELECT word, freq, list_filter(list_transform(range(1, len(s) + 1), i ->
      |           CASE WHEN i < len(s) AND s[i] = ma AND s[i+1] = mb THEN ma || mb
      |                WHEN i > 1 AND s[i-1] = ma AND s[i] = mb THEN NULL
      |                ELSE s[i] END), x -> x IS NOT NULL) AS s
      |  FROM w0 CROSS JOIN m1
      |), e2 AS (
      |  SELECT freq, unnest(list_transform(range(1, len(s)), i ->
      |           struct_pack(a := s[i], b := s[i+1]))) AS p
      |  FROM w1
      |), p2 AS (
      |  SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM e2 GROUP BY p.a, p.b
      |), b2 AS (
      |  SELECT a, b, cnt FROM p2 WHERE a <> b ORDER BY cnt DESC, a, b LIMIT 1
      |), m2 AS (SELECT a AS ma, b AS mb FROM b2),
      |w2 AS (
      |  SELECT word, freq, list_filter(list_transform(range(1, len(s) + 1), i ->
      |           CASE WHEN i < len(s) AND s[i] = ma AND s[i+1] = mb THEN ma || mb
      |                WHEN i > 1 AND s[i-1] = ma AND s[i] = mb THEN NULL
      |                ELSE s[i] END), x -> x IS NOT NULL) AS s
      |  FROM w1 CROSS JOIN m2
      |)""".stripMargin

  /** The span-coverage chain as oracle CTEs, ending in the per-doc
    * CTE `sc` (doc_id, source, n_tokens, n_spans, n_dup, covered,
    * cover_frac) — the SQL twin of [[spanCoverage]], shared by the
    * q_span_dedup, q_auc and q_pr_curve oracles so detector and
    * evaluation can never drift. */
  private def spanCoverageSql: String =
    s"""pl AS (
       |  SELECT doc_id, source,
       |         CASE WHEN doc_id % 7 = 0 THEN text || ' $BoilerTrailer'
       |              ELSE text END AS txt
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, source, string_split(txt, ' ') AS toks,
       |         CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_tokens
       |  FROM pl
       |), sp AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS start,
       |         md5(array_to_string(toks[i + 1 : i + $SpanK], ' ')) AS key
       |  FROM b CROSS JOIN range(0, 256) r(i)
       |  WHERE i + $SpanK <= len(toks)
       |), occ AS (
       |  SELECT key FROM sp GROUP BY key HAVING COUNT(*) >= 2
       |), cv AS (
       |  SELECT doc_id, start,
       |         least($SpanK,
       |               COALESCE(lead(start) OVER (PARTITION BY doc_id ORDER BY start),
       |                        start + $SpanK) - start) AS contrib
       |  FROM sp JOIN occ USING (key)
       |), cov AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup,
       |         CAST(SUM(contrib) AS BIGINT) AS covered
       |  FROM cv GROUP BY doc_id
       |), sc AS (
       |  SELECT b.doc_id, b.source, b.n_tokens,
       |         CAST(greatest(b.n_tokens - ${SpanK - 1}, 0) AS BIGINT) AS n_spans,
       |         CAST(COALESCE(cov.n_dup, 0) AS BIGINT) AS n_dup,
       |         CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered,
       |         CAST(COALESCE(cov.covered, 0) AS DOUBLE)
       |           / CAST(b.n_tokens AS DOUBLE) AS cover_frac
       |  FROM b LEFT JOIN cov USING (doc_id)
       |)""".stripMargin

  /** The quality feature chain as oracle CTEs (`f`→`r`→`zz`, ending in
    * per-doc doc_id, lang, source, n_tokens, ratios, len_sat, z) — the
    * SQL twin of [[withQualityZ]], shared by the q_quality_score,
    * q_domain_cap and q_keeper_quality oracles so the rankings can
    * never drift. `table` lets the keeper election score the doubled
    * corpus CTE instead of the base table. */
  private def qualityZSql(table: String = "documents"): String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""f AS (
       |  SELECT doc_id, lang, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
       |         CAST(len(list_filter(string_split(text, ' '),
       |                              x -> x IN ($stopList))) AS BIGINT) AS n_stop
       |  FROM $table
       |), r AS (
       |  SELECT doc_id, lang, source, n_tokens,
       |         CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
       |         CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
       |         CAST(n_tokens AS DOUBLE) / (CAST(n_tokens AS DOUBLE) + 50.0) AS len_sat
       |  FROM f
       |), zz AS (
       |  SELECT doc_id, lang, source, n_tokens, uniq_ratio, stop_ratio, len_sat,
       |         -1.5 + 2.0 * uniq_ratio - 3.0 * stop_ratio + 2.5 * len_sat AS z
       |  FROM r
       |)""".stripMargin
  }

  // Per-document token statistics (token counting north-star op).
  private def qTextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens()).cast("long"))
      .select(
        col("doc_id"), col("lang"), col("source"),
        col("n_tokens"),
        size(array_distinct(tokens())).cast("long").as("n_uniq_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"),
        col("n_chars"),
        ((length(col("text")) - (col("n_tokens") - 1)).cast("double")
          / col("n_tokens").cast("double")).as("avg_token_len"))
      .orderBy("doc_id")

  // Quality scoring: stopword ratio, uniqueness ratio, composite score.
  // All ratios are exact-int divisions → cross-engine deterministic.
  private def qTextQuality(s: SparkSession, d: String): DataFrame = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens()).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))")).cast("long"))
      .withColumn("n_uniq", size(array_distinct(tokens())).cast("long"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("quality_score", col("uniq_ratio") * (lit(1.0) - col("stop_ratio")))
      .withColumn("is_short", col("n_tokens") < 30)
      .select("doc_id", "lang", "n_tokens", "n_stop", "n_uniq",
        "stop_ratio", "uniq_ratio", "quality_score", "is_short")
      .orderBy("doc_id")
  }

  /** Flesch-style readability scoring — the classic quality-gate
    * feature beside stopword/uniqueness ratios: reading-ease =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    * Syllables are the standard vowel-run heuristic, counted ONCE over
    * the whole text (`[aeiouy]+` runs cannot span the space
    * delimiter, so the per-word sum and the whole-text count are the
    * same number — one regex pass instead of a token explode);
    * sentences are fixed 12-token windows (this corpus carries no
    * sentence punctuation — the window stands in deterministically,
    * (n+11) DIV 12). The three counts are exact BIGINTs and the score
    * is one fixed-shape IEEE composite with literal coefficients —
    * identical cross-engine, so even the CASE band edges compare
    * identically. Narrow map over the corpus; no shuffle. */
  private def qReadability(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens()).cast("long"))
      .withColumn("n_sentences", expr("(n_tokens + 11) DIV 12"))
      .withColumn("n_syllables",
        size(expr("regexp_extract_all(text, '[aeiouy]+', 0)")).cast("long"))
      .withColumn("wps", expr(
        "CAST(n_tokens AS DOUBLE) / CAST(n_sentences AS DOUBLE)"))
      .withColumn("spw", expr(
        "CAST(n_syllables AS DOUBLE) / CAST(n_tokens AS DOUBLE)"))
      .withColumn("flesch", expr("206.835 - 1.015 * wps - 84.6 * spw"))
      .withColumn("band", expr(
        """CASE WHEN flesch >= 90.0 THEN 'very_easy'
                WHEN flesch >= 70.0 THEN 'easy'
                WHEN flesch >= 50.0 THEN 'medium'
                WHEN flesch >= 30.0 THEN 'hard'
                ELSE 'very_hard' END"""))
      .select("doc_id", "lang", "n_tokens", "n_sentences", "n_syllables",
        "wps", "spw", "flesch", "band")
      .orderBy("doc_id")

  /** Hashing-trick featurization (Weinberger et al. 2009, "Feature
    * Hashing for Large Scale Multitask Learning") — the fixed-width
    * sparse text featurizer that needs NO vocabulary broadcast:
    * bucket = low 8 bits of xxhash64(token), sign = the 9th bit
    * (both PURE BITWISE reads of the signed 64-bit hash, so the
    * two's-complement bit pattern — not a sign-dependent %/DIV — is
    * what both engines consume), feature value = Σ sign·tf per
    * (doc, bucket) with the signed sum cancelling collisions in
    * expectation. Scale shape: one token explode → (doc,tok) tf agg →
    * hash each DISTINCT token once and join back (vocab ≪ corpus
    * tokens) → (doc,bucket) hash agg; every stage linear, the bucket
    * matrix is the bounded-width output a downstream trainer consumes
    * directly. Oracle recomputes Spark's exact XXH64 per distinct
    * token via the [[XxOracleSql]] macro chain. */
  private def qFeatureHash(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens()).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val vocab = tf.select("tok").distinct()
      .withColumn("h64", xxhash64(col("tok")))
      .select(col("tok"), expr("h64 & 255").as("bucket"),
        expr("CASE WHEN (h64 & 256) = 0 THEN 1L ELSE -1L END").as("sign"))
    tf.join(vocab, Seq("tok"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("n_tok"),
        sum(col("sign") * col("tf")).as("feat"))
      .select("doc_id", "bucket", "n_terms", "n_tok", "feat")
      .orderBy("doc_id", "bucket")
  }

  /** Stored alert queries for the percolate operator — literal
    * (id, conjunctive terms) rows, mirrored verbatim in the oracle
    * VALUES list. q5's term is deliberately absent from the corpus:
    * the zero-match path must surface as an n_docs=0 row, not a
    * dropped one. */
  private val PercolateQueries: Seq[(Long, String)] = Seq(
    1L -> "spark query", 2L -> "vector hash", 3L -> "data",
    4L -> "customer fast line", 5L -> "zzzabsent", 6L -> "group row")

  /** Percolation / reverse search (the Elasticsearch "percolate"
    * idea): a registry of STORED conjunctive term queries is matched
    * against every arriving document — the alerting/routing primitive
    * a training-data pipeline uses to flag documents for review as
    * they land. Inverted evaluation: queries explode to (qid, term)
    * and join the doc term index on TERM, so cost is Σ posting sizes
    * of registered terms — never docs × queries; a doc matches when
    * its distinct-term hit count equals the query's term count
    * (conjunction as counting). The registry frame is broadcast (it
    * is model-sized by definition) and zero-match queries survive via
    * the left join. All counting exact BIGINTs. */
  /** Per-document percolate matches — the (doc_id, qid) routing pairs
    * q_percolate aggregates, factored out so the STREAMING router
    * (EventPipeline.startPercolateRouter) and the batch query share
    * ONE matcher: same inverted evaluation (registry exploded to
    * terms, joined on TERM against each doc's distinct tokens,
    * conjunction as counting), same broadcast model-sized registry —
    * stream/batch parity is by construction, not by coincidence.
    * Input needs (doc_id, text); returns one row per matched
    * (doc_id, qid) with the query text and its term count. */
  private[graft] def percolateMatchesDf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val reg = PercolateQueries.toDF("qid", "query")
      .withColumn("terms", split(col("query"), " "))
      .withColumn("n_terms", size(col("terms")).cast("long"))
    val regTerms = reg.select(col("qid"), col("query"), col("n_terms"),
      explode(col("terms")).as("tok"))
    docs.select(col("doc_id"), explode(tokens()).as("tok")).distinct()
      .join(broadcast(regTerms), Seq("tok"))
      .groupBy("doc_id", "qid", "query", "n_terms")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === col("n_terms"))
      .select("doc_id", "qid", "query", "n_terms")
  }

  private def qPercolate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val reg = PercolateQueries.toDF("qid", "query")
      .withColumn("n_terms", size(split(col("query"), " ")).cast("long"))
    val matches = percolateMatchesDf(Tables.documents(s, d))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
    reg.join(matches, Seq("qid"), "left_outer")
      .select(col("qid"), col("query"), col("n_terms"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        col("first_doc"), col("last_doc"))
      .orderBy("qid")
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, "Automatic keyword
    * extraction from individual documents") — candidate phrases are
    * maximal stopword-delimited token runs (capped at 4 tokens: the
    * standard guard against degenerate runs under a small stopword
    * list), word scores are deg(w)/freq(w) over kept phrases (deg =
    * Σ phrase length across a word's occurrences — the co-occurrence
    * degree including self), and a phrase scores the sum of its
    * words' scores. Determinism: freq/deg are exact BIGINTs, each
    * word score is ONE IEEE division pinned to DECIMAL(18,9), and
    * the phrase sum is a decimal sum — order-independent, engine-
    * exact (the q_closeness 1/d device). Scale shape: one posexplode
    * + per-doc window prefix sum to cut phrases (doc-bounded, never
    * global), two hash aggs for word stats, one join back on word —
    * all linear; the top-30 cut is TakeOrdered. */
  private def qRake(s: SparkSession, d: String): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("i")
    val phr = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens()).as(Seq("i", "tok")))
      .withColumn("is_stop", col("tok").isin(Stopwords: _*))
      .withColumn("pid", sum(when(col("is_stop"), 1L).otherwise(0L)).over(win))
      .filter(!col("is_stop"))
      .groupBy("doc_id", "pid")
      .agg(count(lit(1)).as("len"),
        expr("array_join(transform(array_sort(collect_list(struct(i, tok))), x -> x.tok), ' ')")
          .as("phrase"))
      .filter(col("len") <= 4)
      .localCheckpoint() // feeds the word-stat agg AND the phrase scoring join
    val words = phr
      .select(col("len"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .withColumn("r", expr(
        "CAST(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS DECIMAL(18,9))"))
    phr.select(col("doc_id"), col("pid"), col("phrase"), col("len"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(words.select("w", "r"), Seq("w"))
      .groupBy(col("doc_id"), col("pid"), col("phrase"), col("len"))
      .agg(expr("CAST(SUM(r) AS DOUBLE)").as("score"))
      .groupBy(col("phrase"))
      .agg(min(col("len")).as("n_words"), count(lit(1)).as("n_occ"),
        min(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase")).limit(30)
      .select("phrase", "n_words", "n_occ", "score")
      .orderBy(col("score").desc, col("phrase"))
  }

  // Corpus-level token accounting per language: explode + hash agg
  // (the regex tokenizer is the BPE-ish path; whitespace is primary).
  private def qTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("token"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("n_uniq_tokens"))
      .orderBy("lang")

  // Language-ID heuristic: marker-token votes per language, argmax with
  // a fixed preference order. (The corpus' lang labels are synthetic
  // and uncorrelated with content — this pins the *operator*: a
  // deterministic n-gram-profile classifier shape.)
  private val LangMarkers = Seq(
    "en" -> Seq("the", "a"), "fr" -> Seq("table", "line"),
    "es" -> Seq("data", "row"), "de" -> Seq("fast", "slow"),
    "zh" -> Seq("spark", "big"))

  /** Shared language-ID frame: documents + per-lang marker scores +
    * the argmax `predicted` column (first lang in marker order whose
    * score is ≥ every other — the same fixed tie order both engines
    * replay). Consumed by q_lang_id (per-doc readout) and q_kappa
    * (agreement vs the declared tag). */
  private def langPredicted(s: SparkSession, d: String): DataFrame = {
    val scored = LangMarkers.foldLeft(Tables.documents(s, d)) { case (df, (l, ws)) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      df.withColumn(s"score_$l",
        size(expr(s"filter(split(text, ' '), x -> x IN ($inList))")).cast("long"))
    }
    val langs = LangMarkers.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last): org.apache.spark.sql.Column) {
      case (l, els) =>
        val ge = langs.filter(_ != l)
          .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
        when(ge, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", pred)
  }

  private def qLangId(s: SparkSession, d: String): DataFrame = {
    val langs = LangMarkers.map(_._1)
    langPredicted(s, d)
      .withColumn("is_match", col("predicted") === col("lang"))
      .select(Seq("doc_id", "lang").map(col) ++ langs.map(l => col(s"score_$l"))
        ++ Seq(col("predicted"), col("is_match")): _*)
      .orderBy("doc_id")
  }

  /** Cohen's kappa between the DECLARED language tag and the marker
    * classifier's prediction — chance-corrected agreement, the
    * annotator-consistency statistic a curation team reads before
    * trusting either label source. Integer-exact form: with n docs,
    * `agree` diagonal mass and Σ row_i·col_i margin cross-mass,
    *   κ = (n·agree − Σrc) / (n² − Σrc)
    * — ONE IEEE division over exact BIGINTs (the po/pe readouts are
    * each a single division too). Scale shape: one corpus pass to the
    * 5×5 confusion matrix, margins and totals on the model-sized
    * matrix; the FULL outer margin join covers labels that appear
    * only as truth or only as prediction. */
  private def qKappa(s: SparkSession, d: String): DataFrame = {
    val cm = langPredicted(s, d)
      .groupBy(col("lang"), col("predicted")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // model-sized; feeds totals + both margins
    val tot = cm.agg(
      sum(col("c")).as("n"),
      sum(when(col("lang") === col("predicted"), col("c")).otherwise(0L))
        .as("n_agree"))
    val rows = cm.groupBy(col("lang").as("lab")).agg(sum(col("c")).as("row_n"))
    val cols = cm.groupBy(col("predicted").as("lab")).agg(sum(col("c")).as("col_n"))
    val rc = rows.join(cols, Seq("lab"), "full")
      .agg(sum(coalesce(col("row_n"), lit(0L)) * coalesce(col("col_n"), lit(0L)))
        .as("sum_rc"))
    tot.crossJoin(rc)
      .select(col("n"), col("n_agree"), col("sum_rc"),
        expr("CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)").as("po"),
        expr("CAST(sum_rc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")
          .as("pe"),
        expr("""(CAST(n AS DOUBLE) * CAST(n_agree AS DOUBLE) - CAST(sum_rc AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sum_rc AS DOUBLE))""")
          .as("kappa"))
  }

  // Canonicalizing text normalization — the pass every dedup pipeline
  // runs BEFORE hashing/shingling (case fold, strip non-alphanumerics,
  // collapse whitespace), plus the digest of the normalized form. All
  // regex here is simple character classes, where Java regex (Spark)
  // and RE2 (DuckDB) agree; DuckDB needs the explicit 'g' flag to
  // match Spark's replace-all default.
  private def qTextNormalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("text_norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select(
        col("doc_id"),
        col("text_norm"),
        (col("text_norm") =!= col("text")).as("changed"),
        md5(col("text_norm")).as("norm_md5"),
        length(col("text_norm")).cast("long").as("n_chars_norm"))
      .orderBy("doc_id")

  // Intra-document trigram repetition — the Gopher-class "repeated
  // n-gram" quality gate (a doc whose trigrams mostly repeat is
  // boilerplate/spam, dropped before training). Pure narrow maps:
  // build the trigram list once, count total vs distinct.
  private def qRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens())
      .withColumn("tris", expr(
        "transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))"))
      .select(
        col("doc_id"),
        size(col("tris")).cast("long").as("n_tri"),
        size(array_distinct(col("tris"))).cast("long").as("n_tri_uniq"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_tri_uniq").cast("double") / col("n_tri").cast("double"))
      .withColumn("is_repetitive", col("rep_ratio") > 0.2)
      .orderBy("doc_id")

  /** Unigram Shannon entropy per document (nats) — the
    * distribution-shape quality signal (near-zero entropy = one token
    * repeated; high = diverse vocabulary). Each p·ln(p) term is pinned
    * to DECIMAL(18,9) before the sum: ln() may differ in the last ulp
    * across libm implementations, and a double sum is also
    * partition-order-dependent — the decimal pin fixes both, same
    * technique as q_tfidf/q_corr_manual.
    */
  private def qDocEntropy(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens()).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tf.withColumn("n", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("term", expr(
        """CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9))"""))
      .groupBy(col("doc_id"))
      .agg(
        max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_uniq_tokens"),
        (lit(0.0) - expr("CAST(SUM(term) AS DOUBLE)")).as("entropy_nats"))
      .orderBy("doc_id")
  }

  // Document fingerprinting: content hashes + a bucket prefix.
  private def qFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("fp_md5"),
      sha2(col("text"), 256).as("fp_sha256"),
      substring(md5(col("text")), 1, 8).as("fp_bucket"))
      .orderBy("doc_id")

  // Exact dedup: hash-groupBy on content digest over the doubled
  // corpus — each text collapses to its minimum id (the keeper).
  private def qDedupExact(s: SparkSession, d: String): DataFrame =
    doubled(s, d)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        min(col("lang")).as("lang"))
      .orderBy("text_md5")

  /** Per-source duplication report over the doubled corpus — the
    * rollup a curation dashboard shows before/after dedup: docs
    * contributed, distinct texts, redundant-copy share, and the
    * largest clone group, per source. Two cascaded hash aggregates
    * ((source, digest) then source — both map-side-partial); the one
    * double is a single IEEE division of exact BIGINTs, and the
    * second agg's input is ≤ |distinct texts| rows. */
  private def qDedupStats(s: SparkSession, d: String): DataFrame =
    doubled(s, d)
      .groupBy(col("source"), md5(col("text")).as("text_md5"))
      .agg(count(lit(1)).as("n_copies"))
      .groupBy(col("source"))
      .agg(
        sum(col("n_copies")).as("n_docs"),
        count(lit(1)).as("n_texts"),
        max(col("n_copies")).as("max_clone"),
        sum(col("n_copies") - 1L).as("n_dup_docs"))
      .withColumn("dup_ratio",
        col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
      .orderBy("source")

  /** Blocklist terms — stand-ins for a C4-style badword list (two
    * corpus-hot tokens plus one absent control). A real deployment
    * swaps in its own list; the mechanics don't change: the list
    * rides the plan as an `isin` literal set (codegen'd, no join), so
    * cost is one narrow token explode + a doc-keyed aggregate. */
  private[graft] val Blocklist = Seq("slow", "big", "leak")

  /** Wordlist document filter (the C4-style blocklist cut): every doc
    * containing a blocked term, with occurrence count, distinct terms
    * matched, and hit rate. `blocked` (rate ≥ 0.08) is decided in
    * INTEGER arithmetic (25·hits ≥ 2·tokens ⇔ rate ≥ 2/25) so the
    * boundary can't hinge on a float compare; hit_rate itself is one
    * IEEE division of the same exact BIGINTs. Docs with zero hits are
    * absent by construction — the clean corpus is the anti-join. */
  private def qBlocklist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(tokens()).cast("long").as("n_tokens"),
        explode(tokens()).as("tok"))
      .filter(col("tok").isin(Blocklist: _*))
      .groupBy("doc_id", "n_tokens")
      .agg(
        count(lit(1)).as("n_hits"),
        countDistinct(col("tok")).as("n_terms_hit"),
        concat_ws(",", sort_array(collect_set(col("tok")))).as("terms"))
      .withColumn("hit_rate",
        col("n_hits").cast("double") / col("n_tokens").cast("double"))
      .withColumn("blocked", col("n_hits") * 25L >= col("n_tokens") * 2L)
      .select("doc_id", "n_tokens", "n_hits", "n_terms_hit", "terms",
        "hit_rate", "blocked")
      .orderBy("doc_id")

  /** Document-frequency cap for shingle-based pair joins: a shingle
    * shared by d documents emits d² candidate rows through the
    * self-join, so one ubiquitous 3-gram ("of the and"-class) is both
    * a shuffle hot key and a quadratic blowup. Shingles with df above
    * the cap carry no dedup signal (they are corpus-wide boilerplate)
    * and are dropped BEFORE pairing — the standard DF cap. Mirrored in
    * the DuckDB oracle so the query stays hash-compared.
    */
  val ShingleDfCap = 16

  /** (doc_id, sh, n_sh) shingle-hash rows after the DF cap: hot
    * shingles removed, n_sh recomputed over the kept set. Both windows
    * partition on the same keys the downstream join/agg use.
    */
  private def keptShingleHashes(docs: DataFrame, dfCap: Int): DataFrame = {
    // join on the 64-bit shingle hash, not the string — less than half
    // the shuffle bytes and integer key compares; a hash collision
    // would need two of the ~10^5 distinct shingles to collide in 64
    // bits (p ≈ 3e-10) and would only perturb one pair's common-count
    val ex = docs
      .withColumn("toks", tokens())
      .withColumn("shingles", array_distinct(
        expr("transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"),
        explode(expr("transform(shingles, s -> xxhash64(s))")).as("sh"))
    ex.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= lit(dfCap))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .select("doc_id", "sh", "n_sh")
  }

  /** Candidate pairs of the shingle join (pre-Jaccard-threshold),
    * exposed so the skew guard test can prove the DF cap bounds the
    * pair blowup. `docs` needs (doc_id, text).
    */
  def ngramCandidates(docs: DataFrame, dfCap: Int = ShingleDfCap): DataFrame = {
    val kept = keptShingleHashes(docs, dfCap)
    val a = kept.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"), col("sh"))
    val b = kept.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"), col("sh"))
    a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double")
          / (col("a_n") + col("b_n") - col("common")).cast("double"))
  }

  // N-gram (token 3-shingle) Jaccard near-dup detection, exact within
  // the DF cap: explode distinct shingles, drop hot shingles, join docs
  // sharing a kept shingle (never the full cross product), compute
  // |A∩B| / |A∪B| from exact counts over the kept sets.
  private def qDedupNgram(s: SparkSession, d: String): DataFrame =
    ngramCandidates(doubled(s, d), ShingleDfCap)
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id", "common", "jaccard")
      .orderBy("a_id", "b_id")

  /** Candidate-pair similarity HISTOGRAM — the threshold-picking
    * diagnostic run before committing to a dedup bar: the full
    * Jaccard distribution of every shingle-sharing candidate pair
    * (the same DF-capped chain as q_dedup_ngram, WITHOUT the ≥ 0.5
    * cut), binned by ⌊10·J⌋ (J = 1 clamped into the top bin). The
    * bin edges are decile cuts of an exact-integer-ratio double, so
    * floor lands identically cross-engine; counts are exact and the
    * share one IEEE division. A bimodal histogram says the corpus has
    * a clean dup/non-dup separation; mass piling against the bar says
    * the threshold is load-bearing. Same shuffle shape and cost
    * envelope as the dedup query it tunes. */
  private def qSimHistogram(s: SparkSession, d: String): DataFrame = {
    val cand = ngramCandidates(doubled(s, d), ShingleDfCap)
      .withColumn("bin", least(floor(col("jaccard") * 10).cast("long"), lit(9L)))
    // pin the ≤10-row bin table: its LINEAGE is the full candidate
    // join, and both the totals aggregate and the final select would
    // otherwise replay it (the q_ann_recall multi-consumer trap)
    val binned = cand.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("j_min"), max(col("jaccard")).as("j_max"))
      .localCheckpoint()
    val tot = binned.agg(sum(col("n_pairs")).as("total"))
    binned.crossJoin(broadcast(tot))
      .withColumn("share",
        col("n_pairs").cast("double") / col("total").cast("double"))
      .select("bin", "n_pairs", "j_min", "j_max", "share")
      .orderBy("bin")
  }

  /** Jaccard threshold of the prefix-filtered set-similarity join. */
  private val PrefixJaccard = 0.5
  /** t/(1+t) — the PPJoin overlap factor; interpolated as ONE literal
    * into both engines so α is bit-identical. */
  private val PrefixAlpha = PrefixJaccard / (1 + PrefixJaccard)

  /** Prefix-filtered set-similarity join (PPJoin-style) — the LOSSLESS
    * alternative to q_dedup_ngram's DF cap: sort every doc's distinct
    * 3-shingle set in one GLOBAL canonical order (rarest shingle
    * first: ascending df, ties lexicographic) and index only the first
    * |X| − ⌈t·|X|⌉ + 1 shingles. The prefix theorem guarantees any
    * pair with Jaccard ≥ t shares at least one PREFIX shingle, so the
    * candidate join loses nothing — while a corpus-hot shingle sorts
    * to the very END of the canonical order and almost never enters a
    * prefix, which is what kills the d² hot-key blowup WITHOUT the
    * cap's recall caveat. Candidates then pay one exact
    * intersection-count refine. t = 0.5 (0.5 is binary-exact, so the
    * ⌈t·|X|⌉ prefix length is integer-identical across engines). Scale
    * shape: df agg + per-doc window for the canonical order, a
    * prefix-token equi-join bounded by prefix length × per-shingle
    * prefix frequency, and a candidate-bounded refine join — measured
    * near-linear by the scale probe alongside the capped path. */
  /** The distinct 3-shingle stream q_dedup_prefix runs on — exposed so
    * the PrefixDecompose diagnostic can price the PPJoin stages
    * (index, candidates, verify) separately against scaled corpora. */
  private[graft] def prefixShingles(s: SparkSession, d: String): DataFrame =
    doubled(s, d)
      .withColumn("toks", tokens())
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")))
        .as("sh"))

  private def qDedupPrefix(s: SparkSession, d: String): DataFrame =
    dedupPrefixPlan(s, d, geVerify = true)

  /** q_dedup_prefix with the verify stage parametrized (the AbWedge
    * interleaved A/B drives both forms in one JVM; the suite query is
    * geVerify = true). Verify: exact intersection via per-doc sorted
    * shingle ARRAYS — the pair stream stays |candidates| rows (each
    * carrying two ~|doc|-shingle payloads) instead of re-exploding to
    * |candidates|×|doc| narrow rows through two shuffle joins + a
    * groupBy. The graft_sorted_intersect_ge merge carries the lossless
    * bound count + min(remaining) ≥ overlap and bails to −1 the moment
    * a pair provably can't reach α = ⌈t/(1+t)·(|A|+|B|)⌉ (jaccard ≥ t
    * ⟺ overlap ≥ α, so −1 fails the final filter exactly when the
    * true count would) — survivors finish the merge and get the EXACT
    * count, bit-identical to the size(array_intersect(..)) form it
    * replaced, with no per-row hash-set build. */
  private[graft] def dedupPrefixPlan(s: SparkSession, d: String,
      geVerify: Boolean): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val sh = prefixShingles(s, d)
    val cand = ppjoinCandidates(sh)
    val sets = sh.groupBy(col("doc_id")).agg(
      sort_array(collect_list(col("sh"))).as("shs"),
      count(lit(1)).as("sz"))
    val common =
      if (geVerify)
        call_function("graft_sorted_intersect_ge",
          col("a_shs"), col("b_shs"),
          ceil(lit(PrefixAlpha) * (col("a_sz") + col("b_sz")).cast("double"))
            .cast("long"))
      else expr("CAST(size(array_intersect(a_shs, b_shs)) AS BIGINT)")
    cand
      .join(sets.select(col("doc_id").as("a_id"),
        col("shs").as("a_shs"), col("sz").as("a_sz")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"),
        col("shs").as("b_shs"), col("sz").as("b_sz")), Seq("b_id"))
      .withColumn("common", common)
      .withColumn("jaccard", col("common").cast("double")
        / (col("a_sz") + col("b_sz") - col("common")).cast("double"))
      .filter(col("jaccard") >= PrefixJaccard)
      .select("a_id", "b_id", "a_sz", "b_sz", "common", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** The PPJoin candidate stage on a (doc_id, sh) distinct-shingle
    * stream: canonical order, prefix index, then the three lossless
    * prunes (prefix theorem, length filter, all-matches positional
    * filter). Exposed for the candidate-count probe in the spec. */
  private[graft] def ppjoinCandidates(sh: DataFrame): DataFrame = {
    val dft = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    val ord = sh.join(dft, Seq("sh"))
      .withColumn("pos", row_number().over(byDoc).cast("long"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    val pref = ord.filter(col("pos") <=
        col("sz") - expr(s"CAST(ceil($PrefixJaccard * CAST(sz AS DOUBLE)) AS BIGINT)") + 1)
      .select("doc_id", "sh", "pos", "sz")
    // Two further LOSSLESS prunes before the verify stage
    // (measured at sf0.1: candidates 1.64M → 485k; the all-matches
    // bound below buys the last ~4% over the first-match bound's 505k):
    //  - length filter: jaccard ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|)
    //  - PPJoin positional filter over ALL matched prefix tokens: the
    //    global (df, sh) canonical order sorts every doc's set the
    //    same way, so the pair's common tokens, in order, BEGIN with
    //    the c tokens matched in both prefixes (a common token sorting
    //    before the last prefix match would itself sit inside both
    //    prefixes and be matched — contradiction). Every unmatched
    //    common token therefore sorts after the LAST match, giving
    //    overlap ≤ c + min(|A|−maxPosA, |B|−maxPosB), which must reach
    //    α = ⌈t/(1+t)·(|A|+|B|)⌉. With c matches at spread-out
    //    positions this is strictly tighter than the classical
    //    first-match bound 1 + min(|A|−minPosA, |B|−minPosB) (they
    //    coincide when the matches are contiguous), and never looser —
    //    candidates dropped here can never reach t (the losslessness
    //    spec checks this against the all-pairs truth).
    val a = pref.select(col("doc_id").as("a_id"), col("sh"),
      col("pos").as("a_pos"), col("sz").as("a_sz"))
    val b = pref.select(col("doc_id").as("b_id"), col("sh"),
      col("pos").as("b_pos"), col("sz").as("b_sz"))
    //  - per-row suffix/window filter (lossless, BEFORE the pair
    //    groupBy so it cuts the shuffle into it): both docs are
    //    sorted by the SAME global order, so any common token at
    //    positions (pa, pb) splits A∩B into tokens sorting before it
    //    (< pa in A and < pb in B → ≤ min(pa−1, pb−1) of them) and
    //    after it (≤ min(|A|−pa, |B|−pb)); overlap ≤ the sum + 1. A
    //    true pair has overlap ≥ α at EVERY common token, so a row
    //    whose bound misses α can only belong to a dead pair — drop
    //    it. (Dropping rows can leave a dead pair with an optimistic
    //    aggregate bound — that costs one verify, never a result.)
    //    Measured at sf0.1: pair rows 1.448M → 1.443M, candidates
    //    unchanged ~485k — this fixture's doc lengths are near-uniform
    //    so the window bound rarely bites; it exists for the skewed
    //    length distributions (snippet vs page) where min(pa−1, pb−1)
    //    at a deep position certifies death cheaply. Cost: two
    //    codegen'd comparisons per pair row.
    val alphaOf = ceil(lit(PrefixAlpha)
      * (col("a_sz") + col("b_sz")).cast("double")).cast("long")
    val cand = a.join(b, Seq("sh"))
      .filter(col("a_id") < col("b_id") &&
        lit(PrefixJaccard) * greatest(col("a_sz"), col("b_sz")).cast("double")
          <= least(col("a_sz"), col("b_sz")).cast("double") &&
        lit(1L) + least(col("a_pos") - 1L, col("b_pos") - 1L)
          + least(col("a_sz") - col("a_pos"), col("b_sz") - col("b_pos"))
          >= alphaOf)
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("c"),
        max(col("a_pos")).as("amax"), max(col("b_pos")).as("bmax"),
        min(col("a_pos")).as("amin"), min(col("b_pos")).as("bmin"),
        min(col("a_sz")).as("asz"), min(col("b_sz")).as("bsz"))
      //  - aggregate bounds, both lossless: (1) the all-matches
      //    positional bound c + min suffix-after-last-match (above);
      //    (2) the first-match window bound — every common token sits
      //    at position ≥ amin in A and ≥ bmin in B (matched tokens by
      //    minimality; unmatched common tokens sort after the LAST
      //    match), so overlap ≤ min(|A|−amin, |B|−bmin) + 1.
      .filter(col("c") + least(col("asz") - col("amax"), col("bsz") - col("bmax"))
        >= ceil(lit(PrefixAlpha) * (col("asz") + col("bsz")).cast("double")).cast("long")
        && lit(1L) + least(col("asz") - col("amin"), col("bsz") - col("bmin"))
        >= ceil(lit(PrefixAlpha) * (col("asz") + col("bsz")).cast("double")).cast("long"))
      .select("a_id", "b_id")
    cand
  }

  /** Containment near-dup detection — the ASYMMETRIC complement of
    * Jaccard: |A∩B| / min(|A|,|B|) ≈ 1 whenever the smaller document
    * is embedded in the larger (quotes, boilerplate-wrapped reposts,
    * excerpt pages), pairs Jaccard misses because the union is
    * dominated by the larger doc. Same DF-capped shingle join as
    * q_dedup_ngram — no extra shuffle, just a different final ratio —
    * so the sub-quadratic blocking analysis carries over unchanged. */
  private def qContainment(s: SparkSession, d: String): DataFrame =
    ngramCandidates(doubled(s, d), ShingleDfCap)
      .withColumn("containment",
        col("common").cast("double") / least(col("a_n"), col("b_n")).cast("double"))
      .filter(col("containment") >= 0.6)
      .select("a_id", "b_id", "a_n", "b_n", "common", "containment")
      .orderBy("a_id", "b_id")

  /** Operand cap for the edit-distance verify: Levenshtein DP is
    * O(len·len) PER PAIR, and the candidate band is sized by the
    * corpus's true near-dup density — the only scale levers are the
    * blocking (shingle join) and the operand length. A 160-char prefix
    * cuts the per-pair DP ~13× on this corpus (avg 297 chars) while
    * still spanning ~2 sentences of signal; measured 21.7 s → ~2 s on
    * the sf0.1 suite. (Spark has threshold-banded levenshtein(l,r,k),
    * but DuckDB cannot mirror the band, so the ORACLED form caps the
    * operand instead — same cross-engine integer DP, bounded cost.)
    *
    * SCOPE: the "bit-identical across engines" claim holds for ASCII
    * text only. Spark's levenshtein counts Unicode CODE POINTS while
    * DuckDB's counts BYTES (measured: 'café x' vs 'cafe x' → 1 in
    * Spark, 2 in DuckDB — é is two UTF-8 bytes). The fixture corpus is
    * pure ASCII, where the two units coincide; OperatorsSpec pins both
    * the divergence and the corpus-is-ASCII precondition so a fixture
    * regen that introduces multibyte text fails a targeted test rather
    * than surfacing as an opaque hash mismatch. A production deployment
    * over multilingual text must either normalize operands or accept
    * engine-specific distances. */
  private val EditPrefix = 160

  /** Edit-distance near-dup verification — the character-level signal
    * (OCR noise, typo farms, template fill-ins) that token-shingle
    * Jaccard under-weights. Candidates come from the SAME DF-capped
    * shingle join at the near-dup band (never all pairs — at scale the
    * blocking IS the operator); each surviving pair pays one
    * levenshtein() over [[EditPrefix]]-char prefixes — integer dynamic
    * programming, bit-identical across engines, so the whole query is
    * hash-gated. edit_ratio = 1 − lev/max(prefix len): 1.0 = exact. */
  private def qDedupEdit(s: SparkSession, d: String): DataFrame = {
    val docs = doubled(s, d)
      .select(col("doc_id"), substring(col("text"), 1, EditPrefix).as("pfx"))
    // checkpoint the (pair, prefixes) frame BEFORE the DP projection:
    // otherwise Catalyst substitutes the lev expression into the
    // edit_ratio filter predicate (PushDownPredicate through Project),
    // and the O(len²) DP runs up to 3× per pair — measured 7.1 s →
    // 4.1 s at sf0.1 (the residual is the shared candidate blocking,
    // which q_dedup_ngram prices identically). The frame is id pairs
    // + two short prefixes, trivially small next to the DP it guards.
    val cand = ngramCandidates(doubled(s, d), ShingleDfCap)
      .filter(col("jaccard") >= 0.5)
      .join(docs.select(col("doc_id").as("a_id"), col("pfx").as("a_pfx")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("pfx").as("b_pfx")), Seq("b_id"))
      .select("a_id", "b_id", "a_pfx", "b_pfx")
      .localCheckpoint()
    cand
      .withColumn("lev", levenshtein(col("a_pfx"), col("b_pfx")).cast("long"))
      .localCheckpoint()
      .withColumn("edit_ratio",
        lit(1.0) - col("lev").cast("double")
          / greatest(length(col("a_pfx")), length(col("b_pfx"))).cast("double"))
      .filter(col("edit_ratio") >= 0.8)
      .select("a_id", "b_id", "lev", "edit_ratio")
      .orderBy("a_id", "b_id")
  }

  // MinHash + LSH near-dup detection — the sub-quadratic scale path.
  // 32 hash functions (seeded xxhash64 of each shingle), banded into
  // 8 bands × 4 rows; only band-bucket collisions become candidate
  // pairs, which are then verified with exact Jaccard. Oracled since
  // round 8 (XxOracleSql replays the exact hash family in DuckDB);
  // ScalaTest additionally pins recall of the planted duplicates and
  // precision of the verify stage.
  /** DF-capped per-doc MinHash state over the doubled corpus:
    * (doc_id, sh_hash sorted 64-bit shingle hashes, sig 32 slots).
    * Hash each shingle ONCE, then derive the 32 signature slots by
    * bitwise mixing (rotate by a distinct odd amount + xor a
    * k-shifted avalanche constant) — O(32·|shingles|) integer ops
    * instead of 32 string-concat+hash passes per document, and free
    * of the long-multiply overflow ANSI mode rejects.
    * localCheckpoint: the signature frame feeds the band join (both
    * sides) AND the verify-stage rejoins in BOTH consumers
    * (q_dedup_minhash, q_decontaminate_fuzzy) — without
    * materialization the shingle explode + window + agg would re-run
    * per branch. */
  private def minhashSigFrame(s: SparkSession, d: String): DataFrame =
    keptShingleHashes(doubled(s, d), ShingleDfCap)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("sh"))).as("sh_hash"))
      .withColumn("sig",
        expr("""transform(sequence(0, 31),
                 k -> array_min(transform(sh_hash,
                   h -> (shiftleft(h, k * 2 + 1) | shiftrightunsigned(h, 63 - k * 2))
                          ^ shiftleft(-7046029254386353131L, k))))"""))
      .select("doc_id", "sh_hash", "sig")
      .localCheckpoint()

  /** 8×4 banded signature rows (doc_id, band, band_hash) off the
    * signature frame — band join + distinct downstream move ID PAIRS
    * ONLY (16-byte rows): a pair colliding in k bands would otherwise
    * ship its two ~100-long shingle-hash arrays k times through the
    * dedup exchange; arrays rejoin only for surviving pairs. */
  private def minhashBands(sigs: DataFrame): DataFrame =
    sigs.select(
      col("doc_id"),
      posexplode(expr("transform(sequence(0, 7), b -> xxhash64(concat_ws(',', slice(sig, b * 4 + 1, 4))))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

  /** LSH-banding quality diagnostic — the text-dedup twin of
    * q_ann_recall: for a deterministic probe set (the 16 lowest
    * doc_ids, every one carrying a planted near-dup in the doubled
    * fixture), compute EXACT shingle-set Jaccard against the whole
    * corpus (probe-side broadcast — O(|probes|·n), never all-pairs,
    * fanout bounded by the same DF cap the production path uses) and
    * compare the ≥0.8 ground-truth pairs against the 8×4 banding's
    * candidate pairs. The 0.8 threshold is decided in INTEGER
    * arithmetic (5·common ≥ 4·union), so no boundary hinges on a
    * float compare; recall/precision are each ONE IEEE division of
    * exact BIGINTs. This is the measurement behind the banding
    * parameters' recall claim — the tuning loop a deployment runs
    * before committing band/row counts at 100 TB. */
  private def qMinhashRecall(s: SparkSession, d: String): DataFrame = {
    val docs = minhashSigFrame(s, d)
    val probes = docs.select(col("doc_id")).orderBy("doc_id").limit(16)
    val sh = docs.select(col("doc_id"), explode(col("sh_hash")).as("h"))
    val pSh = docs.join(broadcast(probes), Seq("doc_id"))
      .select(col("doc_id").as("p_id"), explode(col("sh_hash")).as("h"))
    val common = sh.join(broadcast(pSh), Seq("h"))
      .filter(col("doc_id") =!= col("p_id"))
      .groupBy(col("p_id"), col("doc_id").as("o_id"))
      .agg(count(lit(1)).as("common"))
    val nsh = docs.select(col("doc_id"), size(col("sh_hash")).cast("long").as("n_sh"))
    val truePairs = common
      .join(nsh.select(col("doc_id").as("p_id"), col("n_sh").as("np")), Seq("p_id"))
      .join(nsh.select(col("doc_id").as("o_id"), col("n_sh").as("no")), Seq("o_id"))
      .filter(col("common") * 5L >= (col("np") + col("no") - col("common")) * 4L)
      .select(least(col("p_id"), col("o_id")).as("a"),
        greatest(col("p_id"), col("o_id")).as("b"))
      .distinct().localCheckpoint() // two consumers: count + hits semi-join
    val banded = minhashBands(docs)
    val pBand = banded.join(broadcast(probes), Seq("doc_id"))
      .select(col("doc_id").as("p_id"), col("band"), col("band_hash"))
    val cand = banded.join(broadcast(pBand), Seq("band", "band_hash"))
      .filter(col("doc_id") =!= col("p_id"))
      .select(least(col("p_id"), col("doc_id")).as("a"),
        greatest(col("p_id"), col("doc_id")).as("b"))
      .distinct().localCheckpoint() // two consumers: count + hits semi-join
    val hits = truePairs.join(cand, Seq("a", "b"), "left_semi")
    probes.agg(count(lit(1)).as("n_probes"))
      .crossJoin(truePairs.agg(count(lit(1)).as("n_true")))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_true").cast("double"))
      .withColumn("cand_precision",
        col("n_hits").cast("double") / col("n_cand").cast("double"))
  }

  private def qDedupMinhash(s: SparkSession, d: String): DataFrame = {
    val docs = minhashSigFrame(s, d)
    val banded = minhashBands(docs)
    val cand = banded.select(col("band"), col("band_hash"), col("doc_id").as("a_id"))
      .join(banded.select(col("band"), col("band_hash"), col("doc_id").as("b_id")),
        Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(docs.select(col("doc_id").as("a_id"), col("sh_hash").as("a_sh")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("sh_hash").as("b_sh")), Seq("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
          / size(array_union(col("a_sh"), col("b_sh"))).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }

  /** FUZZY train/eval decontamination — the near-duplicate third leg
    * of the decontamination taxonomy (q_decontaminate = disjoint
    * k-token chunks, q_decontaminate_sliding = stride-1 grams, this =
    * whole-document near-duplicates): an eval doc is contaminated if
    * some TRAIN doc is a MinHash near-duplicate at Jaccard ≥ 0.8 even
    * when no verbatim chunk aligns. Rides the exact q_dedup_minhash
    * machinery (same DF-capped shingle hashes, same 32-slot
    * signatures, same 8×4 banding), but the candidate join is
    * ASYMMETRIC — eval-side band rows probe train-side band rows — so
    * at 100 TB the small held-out side broadcasts against the corpus
    * band index instead of the corpus self-joining; candidates stay
    * bounded by band collisions, and the doubled fixture plants
    * known cross-split contaminators (copy pairs whose md5 splits
    * differ). One row per NON-train doc: candidate-verified
    * contaminator count, the worst contaminator (rank 1 by jaccard
    * desc, train_id asc — deterministic under the exact tie), and the
    * flag. Fully oracled via XxOracleSql (production hash family). */
  private def qDecontaminateFuzzy(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSigFrame(s, d)
      .withColumn("split", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
    val bands = minhashBands(sigs.select("doc_id", "sig"))
      .join(sigs.select("doc_id", "split"), Seq("doc_id"))
    val evalB = bands.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_id"), col("band"), col("band_hash"))
    val trainB = bands.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("band"), col("band_hash"))
    val cand = evalB.join(trainB, Seq("band", "band_hash"))
      .select("eval_id", "train_id").distinct()
    val verified = cand
      .join(sigs.select(col("doc_id").as("eval_id"), col("sh_hash").as("e_sh")), Seq("eval_id"))
      .join(sigs.select(col("doc_id").as("train_id"), col("sh_hash").as("t_sh")), Seq("train_id"))
      .withColumn("jaccard",
        size(array_intersect(col("e_sh"), col("t_sh"))).cast("double")
          / size(array_union(col("e_sh"), col("t_sh"))).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .localCheckpoint() // feeds the count agg AND the top-1 window
    val wTop = Window.partitionBy(col("eval_id"))
      .orderBy(col("jaccard").desc, col("train_id"))
    val top = verified.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("eval_id"), col("train_id").as("top_train_id"),
        col("jaccard").as("max_jaccard"))
    val counts = verified.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_contaminators"))
    sigs.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_id"), col("split"))
      .join(counts, Seq("eval_id"), "left_outer")
      .join(top, Seq("eval_id"), "left_outer")
      .withColumn("n_contaminators", coalesce(col("n_contaminators"), lit(0L)))
      .withColumn("contaminated", col("top_train_id").isNotNull)
      .select("eval_id", "split", "n_contaminators", "top_train_id",
        "max_jaccard", "contaminated")
      .orderBy("eval_id")
  }

  // SimHash dedup: 64-bit frequency-weighted signature (Charikar) per
  // document, then SIGNATURE-GROUP collapse — group by exact signature
  // (keeper = min id), and count near-groups (Hamming ≤ 3) by
  // band-joining only the DISTINCT signatures. Listing all near-dup
  // doc pairs is inherently quadratic when a corpus clusters (every
  // long doc here shares one topic distribution, so signatures
  // concentrate); grouping first bounds every stage by the number of
  // distinct signatures — the formulation that survives 100 TB.
  // Oracled since round 8 via XxOracleSql (exact hash-family replay).
  /** Cross-engine MinHash accuracy audit — the sketch-vs-truth
    * comparison a pipeline runs before trusting signature Jaccard as a
    * dedup threshold at scale. 16 signature slots, slot k =
    * lexicographic min over the doc's DF-capped shingles of the
    * 15-hex-char prefix of md5(k ':' shingle); md5 is computable
    * identically in both engines (unlike q_dedup_minhash's
    * xxhash64-bitmix family, which trades oracle-ability for hashing
    * throughput — that stays the production path), so signatures,
    * the 4×4 banded candidate generation, AND the estimate-vs-exact
    * deltas all sit under the hash gate. est_jaccard = matches/16 is
    * IEEE-exact (16 = 2⁴), so every compared column is deterministic.
    */
  private val MinhashSlots = 16
  private val MinhashBands = 4

  private def qMinhashEstimate(s: SparkSession, d: String): DataFrame = {
    val rows = MinhashSlots / MinhashBands
    val kept = doubled(s, d)
      .withColumn("toks", tokens())
      .withColumn("shingles", array_distinct(
        expr("transform(sequence(1, greatest(size(toks) - 2, 1)), i -> concat_ws(' ', slice(toks, i, 3)))")))
      .select(col("doc_id"), explode(col("shingles")).as("sng"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sng"))))
      .filter(col("df") <= lit(ShingleDfCap))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .select("doc_id", "sng", "n_sh")
    // localCheckpoint: sigs feed the band join (both sides) and both
    // pair rejoins — without materialization the shingle explode and
    // the 16-slot md5 sweep would re-run for every consumer
    val sigs = kept.groupBy(col("doc_id"), col("n_sh"))
      .agg(array_sort(collect_list(col("sng"))).as("shs"))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${MinhashSlots - 1}),
              k -> array_min(transform(shs,
                s2 -> substring(md5(concat(CAST(k AS STRING), ':', s2)), 1, 15))))"""))
      .localCheckpoint()
    val banded = sigs.select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(0, ${MinhashBands - 1}),
            b -> concat_ws('|', slice(sig, b * $rows + 1, $rows)))""")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cand = banded.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
      .join(banded.select(col("band"), col("band_key"), col("doc_id").as("b_id")),
        Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    val a = sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
      col("shs").as("a_shs"), col("n_sh").as("a_n"))
    val b = sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
      col("shs").as("b_shs"), col("n_sh").as("b_n"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("matches",
        expr("size(filter(zip_with(a_sig, b_sig, (x, y) -> x = y), v -> v))").cast("long"))
      .withColumn("common",
        size(array_intersect(col("a_shs"), col("b_shs"))).cast("long"))
      .withColumn("est_jaccard",
        col("matches").cast("double") / lit(MinhashSlots.toDouble))
      .withColumn("jaccard", col("common").cast("double")
        / (col("a_n") + col("b_n") - col("common")).cast("double"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
      .select("a_id", "b_id", "matches", "est_jaccard", "common", "jaccard", "abs_err")
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash signature per document over whitespace tokens —
    * public so planted-fixture tests drive the exact production
    * signature path. Term frequencies via explode + hash agg
    * (vectorized, linear), then one signature per doc via the NATIVE
    * graft_simhash_agg aggregate — the hash is computed once per
    * distinct token, and the 64 weighted bit-sums accumulate directly
    * in the aggregation buffer (map-side partials; no per-document
    * token ARRAY is ever materialized, unlike the earlier
    * collect_list + graft_simhash scalar form — OperatorsSpec pins the
    * two bit-identical, and SimHashAgg's scaladoc states the 100 TB
    * rationale). Input needs (doc_id, text); returns
    * (doc_id, simhash). */
  def simhashSigs(docs: DataFrame): DataFrame =
    simhashSigsPlan(docs, onePass = true)

  /** [[simhashSigs]] with the build form parametrized (AbWedge pair
    * sigxx_agg / sigxx_expr). onePass = true (the suite path since
    * r14) computes each signature as ONE scalar map over the token
    * array ([[graft.functions.SimHashDoc]] — bit-parity with the
    * aggregate form pinned by a ScalaCheck property): the aggregate
    * form exchanges the corpus at token grain twice (explode →
    * groupBy(doc_id, tok) → groupBy(doc_id)) before a signature
    * exists; the one-pass form is a shuffle-free projection of the
    * corpus scan — the difference between two corpus-scale shuffles
    * and none at 100 TB. */
  private[graft] def simhashSigsPlan(docs: DataFrame,
      onePass: Boolean): DataFrame =
    if (onePass) {
      graft.functions.SimHashDoc.register(docs.sparkSession)
      docs.select(col("doc_id"),
        call_function("graft_simhash_doc_xx", tokens()).as("simhash"))
    } else {
      graft.functions.SimHashAgg.register(docs.sparkSession)
      docs
        .select(col("doc_id"), explode(tokens()).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("w"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"), col("w"))
        .groupBy(col("doc_id"))
        .agg(expr("graft_simhash_agg(h, w)").as("simhash"))
    }

  /** Hamming-≤3 pairs over DISTINCT signatures via 4×16-bit band join
    * (pigeonhole: ≤3 differing bits leave ≥1 of the 4 bands
    * identical). Bounded by distinct-signature cardinality, never doc
    * count. Input: one `simhash` column (pre-grouped); returns
    * (a_sig, b_sig) with a_sig < b_sig. */
  private def nearSigPairs(sigs: DataFrame): DataFrame = {
    val banded = sigs.select(col("simhash"), posexplode(expr(
      "transform(sequence(0, 3), b -> shiftright(simhash, b * 16) & 65535)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_bits")
    val l = banded.select(col("band"), col("band_bits"), col("simhash").as("a_sig"))
    val r = banded.select(col("band"), col("band_bits"), col("simhash").as("b_sig"))
    // Hamming filter BEFORE the distinct: a pair colliding in k bands
    // reaches the dedup shuffle k times, so cutting non-near pairs
    // first shrinks the distinct's input — same result, smaller shuffle
    l.join(r, Seq("band", "band_bits"))
      .filter(col("a_sig") < col("b_sig"))
      .filter(expr("bit_count(a_sig ^ b_sig) <= 3"))
      .select("a_sig", "b_sig").distinct()
  }

  private def qDedupSimhash(s: SparkSession, d: String): DataFrame =
    dedupSimhashPlan(s, d, ckpt = true)

  /** [[qDedupSimhash]] with the signature-group materialization
    * parametrized (AbWedge pair dsim_plain / dsim_ckpt). groups feeds
    * three consumers (both band-join sides and the final join); ckpt =
    * true (the suite path since the r14 A/B: 2.27 vs 3.75 s median,
    * 3/3 pairwise in the quiet window and 4/5 in the noisy rerun)
    * localCheckpoints it so the doc-grain signature build runs once
    * instead of relying on exchange reuse across the three
    * subtrees. */
  private[graft] def dedupSimhashPlan(s: SparkSession, d: String,
      ckpt: Boolean): DataFrame = {
    val sigs = simhashSigs(doubled(s, d))
    val groups0 = sigs.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_members"))
    val groups = if (ckpt) groups0.localCheckpoint() else groups0
    // symmetrize the ordered pairs back so each signature counts ALL
    // its near neighbors, exactly as the pre-refactor both-direction
    // band join did
    val pairs = nearSigPairs(groups.select("simhash"))
    val near = pairs
      .union(pairs.select(col("b_sig").as("a_sig"), col("a_sig").as("b_sig")))
      .groupBy(col("a_sig").as("simhash"))
      .agg(count(lit(1)).as("n_near_groups"))
    groups.join(near, Seq("simhash"), "left_outer")
      .withColumn("n_near_groups", coalesce(col("n_near_groups"), lit(0L)))
      .orderBy("simhash")
  }

  /** Cross-engine SimHash audit — q_dedup_simhash's oracled twin, the
    * same move q_minhash_estimate makes for MinHash: swap the
    * engine-specific xxhash64 token hashes for 60-bit md5-prefix
    * hashes (hex-parseable in both engines), keep EVERYTHING else —
    * the native one-pass graft_simhash_agg signature (bits 60–63 fold to
    * zero under always-negative sums), the signature-group-first
    * collapse, and the banded Hamming-≤3 near counting — and the whole
    * formulation becomes hash-comparable: the oracle recomputes the 60
    * weighted bit sums, signatures, groups, and near counts in plain
    * SQL. Production stays on xxhash64 (one integer mix vs an md5 per
    * distinct token); this query pins the formulation's semantics
    * cross-engine.
    */
  /** 60-bit md5-family SimHash signatures — the cross-engine hash
    * family shared by q_simhash_estimate and q_simhash_closure. */
  private def md5SimhashSigs(s: SparkSession, docs: DataFrame): DataFrame =
    md5SimhashSigsPlan(s, docs, onePass = true)

  /** [[md5SimhashSigs]] with the build form parametrized (AbWedge
    * pair sigmd5_agg / sigmd5_expr) — same one-pass rationale as
    * [[simhashSigsPlan]]; the md5-family DuckDB oracles recompute the
    * weighted bit sums from tokens in SQL, so the hash gate pins the
    * two forms to the same signatures end-to-end. */
  private[graft] def md5SimhashSigsPlan(s: SparkSession, docs: DataFrame,
      onePass: Boolean): DataFrame =
    if (onePass) {
      graft.functions.SimHashDoc.register(s)
      docs.select(col("doc_id"),
        call_function("graft_simhash_doc_md5", tokens()).as("simhash"))
    } else {
      graft.functions.SimHashAgg.register(s)
      docs
        .select(col("doc_id"), explode(tokens()).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("w"))
        .select(col("doc_id"),
          expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"),
          col("w"))
        .groupBy(col("doc_id"))
        .agg(expr("graft_simhash_agg(h, w)").as("simhash"))
    }

  /** Cross-QUERY memo for the md5-family signature graph: SIX queries
    * (estimate, closure, sizes, degrees, pagerank, keeper_quality)
    * consume the same
    * signature frame / keeper groups / near-pair graph / CC labels
    * over the same doubled corpus, and a pipeline run (graft.Verify,
    * or a production multi-report job) should build each intermediate
    * ONCE — exactly the sharing the round-4 review prescribed ("share
    * the keeper-graph CC machinery's intermediate, keyed by hash
    * family"). Entries are localCheckpoint-materialized frames keyed
    * by (session identity, data dir); the session reference in the
    * value keeps the key's identityHashCode stable. graft.Bench CLEARS
    * this memo before every timed repetition (alongside its existing
    * residue unpersist, which would orphan the checkpoint blocks
    * anyway), so published per-query times stay COLD-path honest —
    * the memo accelerates pipeline-shaped runs, never the benchmark.
    */
  private val graphCache =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]

  /** Drop all memoized graph intermediates (bench/test isolation). */
  def clearGraphCache(): Unit = graphCache.clear()

  private def cachedGraph[T <: AnyRef](s: SparkSession, d: String,
      kind: String)(build: => T): T =
    graphCache.getOrElseUpdate(
      s"$kind|${System.identityHashCode(s)}|$d", build).asInstanceOf[T]

  /** Materialized (sigsM, groups) for the md5 family over `d`'s
    * doubled corpus — groups carry per-signature member stats so any
    * consumer can roll up without touching per-doc rows. */
  private def md5SigsGroups(s: SparkSession, d: String): (DataFrame, DataFrame) =
    cachedGraph[(DataFrame, DataFrame)](s, d, "sg") {
      val sigsM = md5SimhashSigs(s, doubled(s, d)).localCheckpoint()
      val groups = sigsM.groupBy(col("simhash"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_members"),
          max(col("doc_id")).as("max_member"))
        .localCheckpoint()
      (sigsM, groups)
    }

  /** Hamming-≤3 DISTINCT-signature pairs (a_sig < b_sig). */
  private def md5SigPairs(s: SparkSession, d: String): DataFrame =
    cachedGraph[DataFrame](s, d, "pairs") {
      nearSigPairs(md5SigsGroups(s, d)._2.select("simhash")).localCheckpoint()
    }

  /** Keeper-to-keeper near edges (src, dst), one per signature pair. */
  private def md5NearEdges(s: SparkSession, d: String): DataFrame =
    cachedGraph[DataFrame](s, d, "edges") {
      val groups = md5SigsGroups(s, d)._2
      md5SigPairs(s, d)
        .join(groups.select(col("simhash").as("a_sig"), col("keeper_id").as("src")), Seq("a_sig"))
        .join(groups.select(col("simhash").as("b_sig"), col("keeper_id").as("dst")), Seq("b_sig"))
        .select("src", "dst")
    }

  /** CC labels over the md5 keeper graph (keeper_id, label). */
  private def md5KeeperLabels(s: SparkSession, d: String): DataFrame =
    cachedGraph[DataFrame](s, d, "labels") {
      val groups = md5SigsGroups(s, d)._2
      connectedComponents(
        groups.select(col("keeper_id").as("doc_id")), md5NearEdges(s, d))
        .withColumnRenamed("doc_id", "keeper_id")
    }

  private def qSimhashEstimate(s: SparkSession, d: String): DataFrame = {
    val groups = md5SigsGroups(s, d)._2
    val pairs = md5SigPairs(s, d)
    val near = pairs
      .union(pairs.select(col("b_sig").as("a_sig"), col("a_sig").as("b_sig")))
      .groupBy(col("a_sig").as("simhash"))
      .agg(count(lit(1)).as("n_near_groups"))
    groups.join(near, Seq("simhash"), "left_outer")
      .withColumn("n_near_groups", coalesce(col("n_near_groups"), lit(0L)))
      .select("simhash", "keeper_id", "n_members", "n_near_groups")
      .orderBy("simhash")
  }

  /** SimHash near-dup clusters END-TO-END — the step qDedupSimhash
    * stops short of: signatures → exact-signature star edges + one
    * keeper-to-keeper edge per Hamming-≤3 DISTINCT-signature pair →
    * connected components → per-doc cluster label (= min doc_id of the
    * cluster), i.e. actual keep/drop decisions. Every stage is bounded
    * the scale-safe way: star edges are d−1 per block, the near-pair
    * join runs over distinct signatures only, and CC is pointer-doubled
    * min-label propagation with a fail-loud round cap. Engine-specific
    * hashing → no oracle; the planted 2-bit-variant cluster test pins
    * the semantics. */
  def simhashClusters(docs: DataFrame): DataFrame =
    simhashClustersFromSigs(simhashSigs(docs))

  /** Shared core of the cluster queries: signature frame and keeper
    * groups (each materialized ONCE — both feed three consumers, and
    * without a checkpoint Spark re-runs the full signature build per
    * consumer; measured 7.0 s → 5.4 s on the sf0.1 suite), the
    * Hamming-≤3 keeper graph, and the CC labels over it. Groups carry
    * per-signature member stats so per-cluster aggregates can roll up
    * WITHOUT touching per-doc rows.
    * @return (sigsM, groups(simhash, keeper_id, n_members, max_member),
    *          keeperLabels(keeper_id, label)) */
  private def sigComponents(sigs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val sigsM = sigs.localCheckpoint()
    val groups = sigsM.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_members"),
        max(col("doc_id")).as("max_member"))
      .localCheckpoint()
    // near-signature blocks connect keeper-to-keeper: one edge per
    // signature PAIR, not per doc pair — a 10⁶-copy boilerplate block
    // adds zero near edges beyond its two keepers' link
    val nearEdges = nearSigPairs(groups.select("simhash"))
      .join(groups.select(col("simhash").as("a_sig"), col("keeper_id").as("src")), Seq("a_sig"))
      .join(groups.select(col("simhash").as("b_sig"), col("keeper_id").as("dst")), Seq("b_sig"))
      .select("src", "dst")
    // the iterative CC loop runs over the KEEPER graph only — distinct
    // signatures, not documents (orders of magnitude fewer nodes and a
    // smaller diameter on a clustered corpus, so fewer rounds AND less
    // data per round). Members then take their signature keeper's
    // component label via one join: keeper_id is already the min doc
    // of its block, so min-keeper-per-component = min doc overall —
    // labels identical to running CC over the full doc set with
    // per-doc star edges (the planted-fixture test pins this against
    // an exact driver-side closure).
    val keeperLabels = connectedComponents(
      groups.select(col("keeper_id").as("doc_id")), nearEdges)
      .withColumnRenamed("doc_id", "keeper_id")
    (sigsM, groups, keeperLabels)
  }

  /** Per-doc labels from the three materialized parts — the shared
    * final join of the cluster queries. */
  private def clusterLabelJoin(sigsM: DataFrame, groups: DataFrame,
      keeperLabels: DataFrame): DataFrame =
    sigsM.join(groups.select("simhash", "keeper_id"), Seq("simhash"))
      .join(keeperLabels, Seq("keeper_id"))
      .select(col("doc_id"), col("label").as("cluster_keeper"))

  /** Clustering over a precomputed (doc_id, simhash) frame — the
    * hash-family-agnostic core of simhashClusters; the md5-family
    * q_simhash_closure runs the same composition through the
    * cross-query memo instead. */
  def simhashClustersFromSigs(sigs: DataFrame): DataFrame = {
    val (sigsM, groups, keeperLabels) = sigComponents(sigs)
    clusterLabelJoin(sigsM, groups, keeperLabels)
  }

  private def qSimhashClusters(s: SparkSession, d: String): DataFrame =
    simhashClusters(doubled(s, d)).orderBy("doc_id")

  // The clustering composition's ORACLED twin: md5-family signatures
  // (cross-engine, q_simhash_estimate's family) through the SAME
  // keeper-graph CC — and the expected labels are recomputed in DuckDB
  // as a recursive-CTE transitive closure over the Hamming-≤3 keeper
  // graph. Distributed pointer-doubling min-label propagation vs a
  // declarative fixpoint closure in a different engine agreeing row
  // for row is the strongest cross-check the cluster stage can get.
  private def qSimhashClosure(s: SparkSession, d: String): DataFrame = {
    val (sigsM, groups) = md5SigsGroups(s, d)
    clusterLabelJoin(sigsM, groups, md5KeeperLabels(s, d)).orderBy("doc_id")
  }

  /** md5-family cluster chain cut at its memoized prefixes for the
    * AbWedge cost profile (memos are cleared before each timed pass,
    * so each stage prices its full cold build): 1 = signatures +
    * keeper groups, 2 = + Hamming-≤3 signature pairs, 3 = + keeper CC
    * labels, 4 = the full q_simhash_closure (per-doc label join +
    * order). */
  /** The closure chain's CC stage with the doubling deferral
    * parametrized (AbWedge pair cc_dbl / cc_hybrid): groups and near
    * edges ride the memo, the CC labels are built fresh with the
    * given `doubleAfter`. Output identical either way (both converge
    * to the component-min fixpoint). */
  private[graft] def closureCcPlan(s: SparkSession, d: String,
      doubleAfter: Int): DataFrame = {
    val groups = md5SigsGroups(s, d)._2
    connectedComponents(
      groups.select(col("keeper_id").as("doc_id")), md5NearEdges(s, d),
      doubleAfter = doubleAfter)
  }

  /** Cold signature-build plan over the doubled corpus for the
    * AbWedge sig pairs (family = "xx" | "md5"). */
  private[graft] def sigBuildPlan(s: SparkSession, d: String,
      family: String, onePass: Boolean): DataFrame =
    sigBuildPlanForTest(s, doubled(s, d), family, onePass)

  /** Signature build over an arbitrary (doc_id, text) frame — the
    * parity property's entry point. */
  private[graft] def sigBuildPlanForTest(s: SparkSession, docs: DataFrame,
      family: String, onePass: Boolean): DataFrame =
    if (family == "md5") md5SimhashSigsPlan(s, docs, onePass)
    else simhashSigsPlan(docs, onePass)

  private[graft] def simhashClosureStage(s: SparkSession, d: String,
      stage: Int): DataFrame = stage match {
    case 1 => md5SigsGroups(s, d)._2
    case 2 => md5SigPairs(s, d)
    case 3 => md5KeeperLabels(s, d)
    case _ => qSimhashClosure(s, d)
  }

  // Per-CLUSTER aggregate over the same md5-family CC labels — the
  // keep/drop accounting a dedup stage reports (cluster size, last
  // member, multi-doc flag), hash-gated end-to-end: the oracle runs
  // the recursive-CTE closure AND the aggregation, so CC + agg sit
  // under the gate together, not just the per-doc labels. The rollup
  // happens at DISTINCT-SIGNATURE granularity: per-signature member
  // counts/maxima (already on the groups frame) sum up through the
  // keeper labels, so no per-doc row survives past the signature
  // aggregate — at 10⁶-copy block sizes the difference between
  // aggregating documents and aggregating signatures.
  private def qSimhashSizes(s: SparkSession, d: String): DataFrame = {
    val groups = md5SigsGroups(s, d)._2
    groups.join(md5KeeperLabels(s, d), Seq("keeper_id"))
      .groupBy(col("label"))
      .agg(sum(col("n_members")).as("n_docs"), max(col("max_member")).as("max_member"))
      .select(col("label").as("cluster_keeper"), col("n_docs"), col("max_member"),
        (col("n_docs") > 1).as("is_multi"))
      .orderBy("cluster_keeper")
  }

  /** Quality-aware keeper election — the final decision of a near-dup
    * dedup stage: within each md5-family CC cluster
    * (q_simhash_closure's labels, via the shared graph memo) keep the
    * HIGHEST-QUALITY member (q_quality_score's z, ties to the lowest
    * doc_id) instead of merely the lowest id. Composes three oracled
    * stages — signature clustering, transitive closure, quality
    * scoring — into one end-to-end keep/drop verdict, all under the
    * hash gate: the oracle re-runs the recursive-CTE closure AND the
    * quality chain and must elect the same keeper row for row. Cost:
    * cluster labels come from the memoized graph build, z is a narrow
    * map, and the election is one cluster-partitioned window. */
  private def qKeeperQuality(s: SparkSession, d: String): DataFrame =
    keeperQualityPlan(s, d, argMax = true)

  /** [[qKeeperQuality]] with the per-cluster election parametrized
    * (AbWedge pair keeperq_window / keeperq_argmax). The winner is
    * "highest z, lowest doc_id on ties"; argMax = true (the suite
    * path) computes the IDENTICAL winner as `max(struct(z, -doc_id))`
    * — struct order compares z first, then −doc_id — running as a
    * hash aggregate with map-side partial aggregation instead of a
    * doc-grain partition sort (the LPA trim's pattern). z is non-null
    * (a computed score) and doc_id ≥ 0, so neither field perturbs the
    * struct ordering. */
  private[graft] def keeperQualityPlan(s: SparkSession, d: String,
      argMax: Boolean): DataFrame = {
    val (sigsM, groups) = md5SigsGroups(s, d)
    val labels = clusterLabelJoin(sigsM, groups, md5KeeperLabels(s, d))
    val z = withQualityZ(doubled(s, d)).select(col("doc_id"), col("z"))
    val lab = labels.join(z, Seq("doc_id"))
    val best =
      if (argMax)
        lab.groupBy(col("cluster_keeper"))
          .agg(max(struct(col("z"), (-col("doc_id")).as("nd"))).as("m"))
          .select(col("cluster_keeper"), (-col("m.nd")).as("best_id"))
      else {
        val byQ = Window.partitionBy(col("cluster_keeper"))
          .orderBy(col("z").desc, col("doc_id"))
        lab.withColumn("rk", row_number().over(byQ))
          .filter(col("rk") === 1)
          .select(col("cluster_keeper"), col("doc_id").as("best_id"))
      }
    lab.join(best, Seq("cluster_keeper"))
      .select(col("doc_id"), col("cluster_keeper"), col("z"),
        col("best_id"), (col("doc_id") === col("best_id")).as("is_best"))
      .orderBy("doc_id")
  }

  /** Structural audit of the near-dup keeper graph — per-keeper degree
    * and distinct ≤2-hop neighborhood size (md5 family, so the whole
    * graph is cross-engine): the connectivity profile an operator
    * reads before trusting CC output — a sudden hub (boilerplate
    * bridging unrelated clusters) shows up here as a degree/2-hop
    * spike before it merges clusters downstream. Pure integer
    * arithmetic end to end. The 2-hop self-join is the audit's cost
    * (bounded by Σdeg² over keepers — fine at distinct-signature
    * cardinality; production monitors degree alone, which is one
    * hash agg). */
  private def qGraphDegrees(s: SparkSession, d: String): DataFrame = {
    val groups = md5SigsGroups(s, d)._2
    val edges = md5NearEdges(s, d)
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src").as("keeper_id")).agg(count(lit(1)).as("degree"))
    val twoHop = sym.select(col("src"), col("dst").as("mid"))
      .join(sym.select(col("src").as("mid"), col("dst").as("hop2")), Seq("mid"))
      .filter(col("hop2") =!= col("src"))
      .select(col("src"), col("hop2").as("nb"))
      .union(sym.select(col("src"), col("dst").as("nb")))
      .distinct()
      .groupBy(col("src").as("keeper_id")).agg(count(lit(1)).as("n_within_2"))
    groups.select("keeper_id")
      .join(deg, Seq("keeper_id"), "left_outer")
      .join(twoHop, Seq("keeper_id"), "left_outer")
      .select(col("keeper_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_within_2"), lit(0L)).as("n_within_2"))
      .withColumn("is_isolated", col("degree") === 0)
      .orderBy("keeper_id")
  }

  /** PageRank (2 unrolled iterations, d = 0.85) over the md5-family
    * near-dup keeper graph — the hub-scoring pass that ranks which
    * boilerplate families DOMINATE a corpus's duplicate structure.
    * A distributed iterative float computation under the hash gate:
    * ranks start uniform, every per-edge contribution r/deg is pinned
    * to DECIMAL(18,12) before the neighbor sum (exact, partition-
    * order-independent — the q_doc_entropy technique), and the
    * damping arithmetic is plain IEEE doubles on both engines, so the
    * oracle can unroll both iterations in SQL and match bit for bit
    * (same move as q_sim_ivf's Lloyd unroll). Dangling (isolated)
    * keepers keep their damped base mass; their outflow is dropped —
    * the standard simplification, stated here because it changes the
    * global sum. Per iteration: one edge join + one hash agg. */
  private def qPagerank(s: SparkSession, d: String): DataFrame = {
    val groups = md5SigsGroups(s, d)._2
    val edges = md5NearEdges(s, d)
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy(col("src").as("keeper_id")).agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    val nRow = groups.agg(count(lit(1)).as("n_k"))
    val nodes = groups.select("keeper_id").crossJoin(broadcast(nRow)).localCheckpoint()
    var rank = nodes.withColumn("r", lit(1.0) / col("n_k").cast("double"))
    for (_ <- 1 to 2) {
      val contrib = sym
        .join(rank.select(col("keeper_id").as("src"), col("r")), Seq("src"))
        .join(deg.select(col("keeper_id").as("src"), col("degree")), Seq("src"))
        .withColumn("c", expr("CAST(r / CAST(degree AS DOUBLE) AS DECIMAL(18,12))"))
        .groupBy(col("dst").as("keeper_id"))
        .agg(sum(col("c")).as("sc"))
      rank = nodes.join(contrib, Seq("keeper_id"), "left_outer")
        .withColumn("r",
          lit(0.15) / col("n_k").cast("double")
            + lit(0.85) * coalesce(col("sc").cast("double"), lit(0.0)))
        .select("keeper_id", "n_k", "r")
    }
    rank.join(deg, Seq("keeper_id"), "left_outer")
      .select(col("keeper_id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        expr("CAST(CAST(r AS DECIMAL(18,12)) AS DOUBLE)").as("pagerank"))
      .orderBy("keeper_id")
  }

  /** Distributed connected components over a near-dup edge set:
    * iterative min-label propagation with DEFERRED pointer doubling —
    * the first `doubleAfter` rounds run plain min propagation (one
    * edge join + one min agg), and only rounds after that add the
    * label(u) ← label(label(u)) self-join hop. Rationale (r14 cold
    * A/B over the md5 keeper graph: cc_hybrid 6.45 s vs cc_dbl
    * 11.26 s median, 5/5 pairwise): near-dup components are star/clique
    * shaped — banded Hamming blocks and exact-digest stars have
    * diameter 1–3 — so unconditional doubling paid an extra
    * node-keyed self-join (two more exchanges) EVERY round to save
    * rounds that shallow graphs never run. A pathological chain still
    * converges in O(doubleAfter + log D) total rounds once doubling
    * kicks in, so the asymptotic guarantee survives. The loop is
    * driver-coordinated but every round is a distributed join+agg;
    * localCheckpoint truncates the growing lineage; the only
    * driver-side action per round is a one-row label-sum fetch (the
    * monotone convergence probe — see the comment at `labelSum`).
    *
    * Fails LOUDLY if the round cap is hit — silently returning
    * unconverged labels would split real clusters and leak duplicates
    * into a training corpus. With doubling from round `doubleAfter`,
    * 25 rounds still cover diameters up to ~2²⁰, so the throw is a
    * defect signal, never a data path.
    *
    * @param nodes (doc_id)   — one row per document
    * @param edges (src, dst) — near-dup pairs, symmetrized internally
    * @param doubleAfter rounds of plain propagation before the
    *   doubling hop joins in (0 = always double, the pre-r14 form)
    * @return (doc_id, label) — label = min doc_id of the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25, doubleAfter: Int = 4): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    // convergence probe: every label is monotone non-increasing round
    // over round (least() of itself and others; the doubling hop
    // label(label(u)) ≤ label(u) because label(x) ≤ x always), so the
    // label SUM is strictly decreasing until the fixpoint — comparing
    // two driver-side decimals replaces the former join+isEmpty probe
    // with one aggregate scan of the just-materialized frame.
    // DECIMAL(38,0): at 10¹⁰ docs × 10¹⁰ max id a BIGINT sum overflows.
    // A NULL sum is legal only for the empty frame; on a non-empty
    // frame it means the decimal aggregate itself overflowed (non-ANSI
    // Spark returns NULL), and silently coalescing that to 0 would make
    // two consecutive overflow rounds compare equal — reporting
    // convergence with wrong labels. Fail loudly instead, matching the
    // round-cap philosophy. (Unreachable below ~10²⁸ docs, but the
    // probe's correctness argument should not rest on "unreachable".)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(
        sum(col("label").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head
      if (row.isNullAt(0)) {
        if (row.getLong(1) != 0L) throw new IllegalStateException(
          "connectedComponents: label sum overflowed DECIMAL(38,0) on a " +
            "non-empty frame — convergence probe unsound; do not consume")
        java.math.BigDecimal.ZERO
      } else row.getDecimal(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // one fused propagation: neighbor labels stream through the edge
      // join, the node's own label rides along via the union, and a
      // single min-agg produces least(own, neighbors) — two shuffles
      // instead of the three a separate neighbor-min + left-join spends
      val propagated = sym
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("label"))
        .union(labels)
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"))
      // pointer doubling (deferred, see scaladoc): follow the label
      // one hop (labels are always doc_ids, so the hop is a
      // self-join) — halves remaining depth on deep components
      val next = (
        if (iter < doubleAfter) propagated
        else propagated
          .join(propagated.select(col("doc_id").as("label"), col("label").as("hop")),
            Seq("label"), "left_outer")
          .select(col("doc_id"), coalesce(col("hop"), col("label")).as("label"))
        ).localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: labels not converged after $maxIter rounds — " +
        "component diameter exceeds 2^rounds; raise maxIter rather than " +
        "consuming unconverged (over-split) clusters")
    labels
  }

  /** Star edges for equivalence blocking: every member of a block
    * (same `key`) links to the block's minimum id — d members emit
    * d−1 edges, versus d²/2 for the within-block all-pairs self-join,
    * and the connected components are identical (the star spans the
    * block). At web-corpus scale one boilerplate page can have 10⁶
    * exact copies; all-pairs would emit 5×10¹¹ edges on one shuffle
    * key, the star emits 10⁶−1. One window, no join.
    */
  def starEdges(keyed: DataFrame, key: String = "dig",
      id: String = "doc_id"): DataFrame =
    keyed
      .withColumn("min_id", min(col(id)).over(Window.partitionBy(col(key))))
      .filter(col(id) =!= col("min_id"))
      .select(col("min_id").as("src"), col(id).as("dst"))

  // Dedup cluster formation: near-dup blocks → star edges → connected
  // components → one keeper per cluster. This is the step that turns
  // similarity output into keep/drop decisions for a training corpus.
  // Edge source here: exact-content blocks (same md5 digest — each doc
  // blocks with its replay twin); any near-dup pair stream (minhash/
  // simhash/ngram output) plugs into connectedComponents identically.
  private def qDedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = doubled(s, d)
    val byDigest = docs.select(md5(col("text")).as("dig"), col("doc_id"))
    connectedComponents(docs.select("doc_id"), starEdges(byDigest))
      .groupBy(col("label").as("cluster_keeper"))
      .agg(count(lit(1)).as("cluster_size"),
        max(col("doc_id")).as("max_member"))
      .orderBy("cluster_keeper")
  }

  // Per-DOC cluster labels through the same star-edges + CC machinery
  // q_dedup_clusters aggregates — oracled row by row (the DuckDB side
  // is a window min over the digest blocks), so the distributed label
  // propagation itself sits under the hash gate, not just its group
  // counts. This is the keep/drop frame a dedup stage actually joins
  // back to the corpus; q_simhash_clusters reuses the identical
  // machinery for near-dup (engine-hash) edges.
  private def qClusterLabels(s: SparkSession, d: String): DataFrame = {
    val docs = doubled(s, d)
    val byDigest = docs.select(md5(col("text")).as("dig"), col("doc_id"))
    connectedComponents(docs.select("doc_id"), starEdges(byDigest))
      .withColumn("is_keeper", col("doc_id") === col("label"))
      .orderBy("doc_id")
  }

  /** End-to-end training-MIX assembly — the composition a multilingual
    * pipeline runs to turn a raw corpus into a balanced training set,
    * as ONE declarative plan: canonicalize → collapse exact dups
    * (keeper = min doc_id per normalized digest) → token-count quality
    * gate → α=0.5 temperature weights over the gated per-language
    * counts → per-language integer budgets by LARGEST-REMAINDER
    * apportionment (floor(weight·B), then the rounding residue
    * B − Σfloor goes one slot each to the languages with the biggest
    * fractional remainder, tie-broken by lang — so Σtarget = B exactly,
    * no stranded slots) → md5-ranked selection up to each budget.
    * The remainder rank is an IEEE-deterministic double (w·B and its
    * floor are bit-identical cross-engine), so the apportionment is
    * oracle-comparable. Every stage is exact
    * integer/decimal/IEEE arithmetic, so the SELECTED SET ITSELF is
    * oracle-comparable — the whole mix decision is reproducible across
    * engines, reruns, and partitionings. Shuffles: the digest window,
    * the per-lang window, and a broadcast of the L-row budget table.
    */
  private def qCorpusMix(s: SparkSession, d: String): DataFrame = {
    val budget = 200.0
    val norm = doubled(s, d)
      .withColumn("text_norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .withColumn("norm_md5", md5(col("text_norm")))
      .withColumn("n_tokens", size(split(col("text_norm"), " ")).cast("long"))
    val keepers = norm
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("norm_md5")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1 && col("n_tokens") >= 30)
      .select("doc_id", "lang")
    val budgets = keepers.groupBy(col("lang")).agg(count(lit(1)).as("n_gated"))
      .withColumn("n_total", expr("CAST(SUM(n_gated) OVER () AS BIGINT)"))
      .withColumn("w_raw",
        sqrt(col("n_gated").cast("double") / col("n_total").cast("double")))
      .withColumn("exact", expr(
        s"""w_raw / CAST(SUM(CAST(w_raw AS DECIMAL(18,12))) OVER () AS DOUBLE)
              * $budget"""))
      .withColumn("floor_t", expr("CAST(FLOOR(exact) AS BIGINT)"))
      .withColumn("residue", expr(
        s"CAST($budget AS BIGINT) - CAST(SUM(floor_t) OVER () AS BIGINT)"))
      // largest-remainder: the L-row budget table fits one partition,
      // so the unpartitioned rank window is a non-issue at any scale
      .withColumn("rem_rank", row_number().over(
        Window.orderBy((col("exact") - col("floor_t").cast("double")).desc,
          col("lang"))).cast("long"))
      .withColumn("target",
        col("floor_t") + when(col("rem_rank") <= col("residue"), 1L).otherwise(0L))
      .select("lang", "n_gated", "target")
    val ranked = keepers
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
    ranked.join(broadcast(budgets), Seq("lang"))
      .filter(col("rk") <= col("target"))
      .select("lang", "rk", "doc_id", "n_gated", "target")
      .orderBy("lang", "rk")
  }

  /** TF-IDF top terms per document (SURVEY §7.1 M4 "tf-idf-lite via
    * joins+aggs"): tf per (doc, token) × ln(N/df), top-3 per doc.
    * The corpus size N joins in as a broadcast scalar (no driver-side
    * count), df is a shared aggregate over the tf table — the same DF
    * statistic that powers the shingle cap. Ranking uses the raw
    * double score (exact ties ⇒ identical (tf, df) on both engines,
    * broken by token); the COMPARED score column is pinned through a
    * DECIMAL(18,6) round because ln() may differ in the last ulp
    * between the two engines' libm implementations.
    */
  private def qTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // one explicit hash partitioning on doc_id serves BOTH the tf
    // aggregate (HashPartitioning(doc_id) satisfies clustering on
    // (doc_id, token)) and the later top-3 window on doc_id — the
    // exploded token stream (the largest intermediate at 100 TB) is
    // shuffled once, not twice
    // localCheckpoint: tf feeds BOTH the df aggregate and the ranking
    // join; without materialization the self-referencing join re-runs
    // the explode+shuffle (Spark re-aliases one side, so exchange
    // reuse can't kick in) — the largest intermediate would be
    // computed twice
    val tf = docs.select(col("doc_id"), explode(tokens()).as("token"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double")
          * log(col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
        expr("CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE)").as("score_r6"))
      .orderBy("doc_id", "rank")
  }

  /** End-to-end corpus-cleaning decision — the composition every
    * training-data pipeline actually runs, as ONE declarative plan:
    * canonicalize text → collapse exact duplicates on the normalized
    * digest (keeper = min doc_id) → token-count quality gate →
    * deterministic split assignment → final `selected` verdict.
    * Runs on the doubled corpus so the dedup stage has real work.
    * Single shuffle on the digest (row_number window) + the harness
    * sort; everything else is narrow maps.
    */
  private def qCorpusClean(s: SparkSession, d: String): DataFrame = {
    val norm = doubled(s, d)
      .withColumn("text_norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .withColumn("norm_md5", md5(col("text_norm")))
      .withColumn("n_tokens", size(split(col("text_norm"), " ")).cast("long"))
    val w = Window.partitionBy(col("norm_md5")).orderBy(col("doc_id"))
    norm
      .withColumn("keep_dedup", row_number().over(w) === 1)
      .withColumn("is_quality", col("n_tokens") >= 30)
      .withColumn("split", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
      .withColumn("selected",
        col("keep_dedup") && col("is_quality") && col("split") === "train")
      .select("doc_id", "lang", "norm_md5", "n_tokens",
        "keep_dedup", "is_quality", "split", "selected")
      .orderBy("doc_id")
  }

  /** RAG/training chunking parameters: 64-token windows on a 48-token
    * stride (16-token overlap) — the fixed-size sliding chunking every
    * retrieval index and long-doc training pipeline runs. */
  private val ChunkLen = 64
  private val ChunkStride = 48

  /** Sliding-window document chunking — one row per (doc, chunk):
    * chunk index, token count, and the chunk digest (the key a chunk-
    * level dedup or embedding index would use; the full text stays in
    * the doc store). Chunk starts advance by the stride while inside
    * the doc, so every token lands in ≥1 chunk and consecutive chunks
    * share ChunkLen−ChunkStride tokens. Pure narrow maps — the explode
    * is the only row expansion and it is bounded by ~n_tokens/stride
    * per doc, so the operator is embarrassingly parallel at any scale.
    */
  private def qChunk(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens())
      .select(col("doc_id"), col("lang"), posexplode(expr(
        s"""transform(
              sequence(0, CAST(floor((size(toks) - 1) / $ChunkStride.0) AS INT)),
              i -> concat_ws(' ', slice(toks, i * $ChunkStride + 1, $ChunkLen)))""")))
      .select(col("doc_id"), col("lang"), col("pos").cast("long").as("chunk_idx"),
        size(split(col("col"), " ")).cast("long").as("chunk_tokens"),
        md5(col("col")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** Context-window size for sequence packing. */
  private val SeqLen = 256

  /** Concat-then-split sequence packing — the accounting LLM
    * pretraining does when it concatenates a language's documents in
    * a deterministic order and slices the stream into fixed
    * SeqLen-token context windows: each doc's window is the one its
    * STARTING offset falls in (integer running-sum arithmetic, so the
    * whole assignment is engine-exact). Per (lang, seq) the query
    * reports how many docs start there, their token mass, the id span,
    * and the spill past the window boundary (tokens a straddling doc
    * pushes into later windows). One shuffle: the per-lang running-sum
    * window; the aggregate reuses its partitioning.
    */
  private def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("n_tokens", size(tokens()).cast("long"))
      .withColumn("cum_end", sum(col("n_tokens")).over(wOrd))
      .withColumn("seq_id", expr(s"(cum_end - n_tokens) DIV $SeqLen"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        greatest(max(col("cum_end")) - (col("seq_id") + 1) * SeqLen, lit(0L))
          .as("spill_tokens"))
      .orderBy("lang", "seq_id")
  }

  /** Exact heavy hitters — top-10 tokens per language by corpus
    * frequency (the vocabulary head a tokenizer trainer or stopword
    * auditor reads first). Hash-aggregate + per-lang top-k window; the
    * deterministic (freq desc, token) order makes the kept set
    * oracle-comparable. The CountMinSketch accuracy test in
    * OperatorsSpec pins Spark's native `count_min_sketch` aggregate
    * against these exact counts — the sketch is the 100 TB path when
    * the (lang, token) keyspace itself is too wide to materialize.
    */
  private def qHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("freq").desc, col("token"))
    Tables.documents(s, d)
      .select(col("lang"), explode(tokens()).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy("lang", "rank")
  }

  /** Misra–Gries frequent items under the error-bound-flag device —
    * the q_cms_watchlist discipline applied to the custom
    * [[graft.functions.MisraGriesAgg]] summary: ONE corpus pass folds
    * every token into a ≤64-counter map (constant buffer per partial
    * aggregate — at 100 TB the shuffle carries k entries per task, not
    * the token keyspace), and the hash-compared output is the exact
    * top-20 (a groupBy the small-SF oracle can replay) plus the
    * theorem facts asserted AS COLUMNS: every above-guarantee token
    * (count·(k+1) > N) must be present in the summary, and every
    * token's estimate must sit in [count − N/(k+1), count]. The raw
    * MG counter values are deliberately NOT exposed — the merged
    * summary's counters are merge-order-dependent (only the bounds
    * are invariant), and Spark does not fix combine order. */
  private def qFrequentItems(s: SparkSession, d: String): DataFrame = {
    graft.functions.MisraGriesAgg.register(s)
    val tok = Tables.documents(s, d).select(explode(tokens()).as("token"))
    val model = tok.agg(
      expr("graft_mg_agg(token, 64)").as("mg"),
      count(lit(1)).as("n"))
    val top = tok.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token")).limit(20)
    top.crossJoin(broadcast(model))
      .withColumn("est", expr("try_element_at(mg, token)"))
      .select(col("token"), col("exact_count"),
        (col("exact_count") * 65L > col("n")).as("above_guarantee"),
        (col("exact_count") * 65L <= col("n") || col("est").isNotNull)
          .as("found_ok"),
        (coalesce(col("est"), lit(0L)) <= col("exact_count") &&
          (col("exact_count") - coalesce(col("est"), lit(0L))) * 65L <= col("n"))
          .as("bound_ok"))
      .orderBy(col("exact_count").desc, col("token"))
  }

  /** PMI collocation mining — the bigram-association table a tokenizer
    * or phrase-vocabulary builder reads: for adjacent token pairs,
    * pmi = ln(P(w1,w2) / (P(w1)·P(w2))) over the bigram stream's
    * left/right marginals, min-count 5, top 50 by association. Shape:
    * one bigram explode, two marginal hash aggs joined back (the w1
    * marginal reuses the bigram agg's partitioning), a broadcast 1-row
    * N. The ln goes through the DECIMAL(18,9) pin (q_doc_entropy's
    * technique) so ranking and values are engine-exact. */
  private def qCollocations(s: SparkSession, d: String): DataFrame = {
    val bigrams = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(toks[i-1] AS w1, toks[i] AS w2))""")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val pair = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds the w1/w2 marginals AND the final join
    val left = pair.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val right = pair.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = pair.agg(sum(col("c12")).as("n_bi"))
    pair.filter(col("c12") >= 5)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi", expr(
        """CAST(CAST(ln((CAST(c12 AS DOUBLE) * CAST(n_bi AS DOUBLE))
             / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) AS DECIMAL(18,9)) AS DOUBLE)"""))
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
      .select("rank", "w1", "w2", "c12", "c1", "c2", "pmi")
      .orderBy("rank")
  }

  /** Corpus-LM quality score — per-document mean bigram log-probability
    * under an add-1-smoothed bigram model estimated from the corpus
    * itself: the "perplexity filter without a model" a training
    * pipeline runs when no external LM is available (word-salad and
    * boilerplate documents score low against the corpus's own
    * statistics). ln((c12+1)/(c1+V)) per bigram goes through the
    * DECIMAL(18,9) pin, the per-doc sum is an exact decimal, and the
    * mean is one double division — engine-exact end to end. Shape:
    * the doc-bigram stream joins the (w1,w2) count table on its own
    * partitioning (one shuffle pair), V and nothing else broadcasts.
    */
  private def qLmScore(s: SparkSession, d: String): DataFrame = {
    val docBigrams = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(toks[i-1] AS w1, toks[i] AS w2))""")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val pair = docBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val left = pair.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = pair.agg(countDistinct(col("w2")).as("v"))
    docBigrams
      .join(pair, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp", expr(
        """CAST(ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE))
             AS DECIMAL(18,9))"""))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("CAST(SUM(logp) AS DOUBLE)").as("sum_logp"))
      .withColumn("avg_logp", col("sum_logp") / col("n_bigrams").cast("double"))
      .withColumn("is_low_quality", col("avg_logp") < -8.0)
      .orderBy("doc_id")
  }

  /** Interpolated Kneser–Ney bigram scoring — the smoothing that
    * actually ships in n-gram LMs (KenLM's default), and the standard
    * perplexity-filter backbone for corpus curation: unlike add-one
    * (q_lm_score), the backoff mass of a context is proportional to
    * its FOLLOWER DIVERSITY and the unigram backoff is the
    * continuation probability ("how many contexts precede w"), so
    * boilerplate bigrams stop inflating scores. Fixed discount
    * D = 0.75 (binary-exact):
    *   P(w2|w1) = max(c12−D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T
    * with all four counts exact BIGINTs (pair count, context total,
    * follower diversity, predecessor diversity; T = distinct bigram
    * types). Each P is ONE fixed-shape IEEE expression over them,
    * ln(P) is pinned to DECIMAL(18,9), and per-doc sums are exact —
    * the q_lm_score determinism discipline. P > 0 always (the
    * continuation term is strictly positive), so ln is total. Scale
    * shape: one bigram hash agg (map-side partials), two
    * model-sized diversity aggs, key-shuffled joins back to the doc
    * bigram stream, one scalar broadcast — no all-pairs anything. */
  private def qKneserNey(s: SparkSession, d: String): DataFrame = {
    val docBigrams = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
             i -> struct(toks[i-1] AS w1, toks[i] AS w2))""")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val pair = docBigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val ctx = pair.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val pred = pair.groupBy(col("w2")).agg(count(lit(1)).as("n1p"))
    val types = pair.agg(count(lit(1)).as("t"))
    docBigrams
      .join(pair, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(pred, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("logp", expr(
        """CAST(ln(
             (greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE))
             + ((0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
                * (CAST(n1p AS DOUBLE) / CAST(t AS DOUBLE)))
           ) AS DECIMAL(18,9))"""))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("CAST(SUM(logp) AS DOUBLE)").as("sum_logp_kn"))
      .withColumn("avg_logp_kn", col("sum_logp_kn") / col("n_bigrams").cast("double"))
      .orderBy("doc_id")
  }

  /** Distributed BPE merge learning — two unrolled rounds of the
    * byte-pair-encoding trainer loop over the corpus vocabulary:
    * words → char symbol arrays weighted by corpus frequency →
    * adjacent-pair counts (one hash agg) → deterministic argmax merge
    * (count desc, pair asc; restricted to a ≠ b so merge sites cannot
    * overlap and the positional rewrite below is exact) → apply the
    * merge inside every word (a pure per-row array transform) →
    * repeat. Output is the learned merge table, the artifact a BPE
    * tokenizer trainer actually produces. Scale shape: each round is
    * one explode + hash agg over the DISTINCT-WORD table (not the
    * corpus), a 1-row argmax broadcast, and a narrow map — the
    * canonical distributed-BPE round. Engine-exact end to end
    * (integer counts, string equality), so the DuckDB oracle unrolls
    * both rounds and matches the merge table bit for bit. */
  /** Corpus vocabulary as (word, freq, char-symbol array) — the frame
    * every BPE round (trainer AND encoder) runs over: merges apply
    * once per DISTINCT word, never per corpus token. */
  private def bpeVocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens()).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()

  // single-symbol words carry no pairs — and must not reach the
  // explode: Spark's sequence(1, 0) DESCENDS (step −1), so an
  // unguarded transform would index past the array under ANSI
  private def bpeBestPair(ws: DataFrame): DataFrame = ws
    .filter(size(col("s")) >= 2)
    .select(col("freq"), explode(expr(
      """transform(sequence(1, size(s) - 1),
           i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))""")).as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("freq")).as("cnt"))
    .filter(col("a") =!= col("b"))
    .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)

  private def bpeApplyMerge(ws: DataFrame, best: DataFrame): DataFrame = ws
    .crossJoin(broadcast(best.select(col("a").as("ma"), col("b").as("mb"))))
    .withColumn("s", expr(
      """filter(transform(sequence(1, size(s)), i ->
           CASE WHEN i < size(s) AND element_at(s, i) = ma
                     AND element_at(s, i + 1) = mb THEN concat(ma, mb)
                WHEN i > 1 AND element_at(s, i - 1) = ma
                     AND element_at(s, i) = mb THEN NULL
                ELSE element_at(s, i) END), x -> x IS NOT NULL)"""))
    .drop("ma", "mb")

  private def qBpeMerges(s: SparkSession, d: String): DataFrame = {
    val words = bpeVocab(s, d)
    val b1 = bpeBestPair(words).localCheckpoint()
    val w1 = bpeApplyMerge(words, b1)
    val b2 = bpeBestPair(w1).localCheckpoint()
    b1.withColumn("round", lit(1L))
      .unionByName(b2.withColumn("round", lit(2L)))
      .select("round", "a", "b", "cnt")
      .orderBy("round")
  }

  /** BPE ENCODING — the application half of the tokenizer loop
    * q_bpe_merges trains: apply both learned merges to the vocabulary
    * and account each document's token budget under the resulting
    * segmentation (symbols before = characters, symbols after = BPE
    * tokens). This is the "how many tokens is my corpus" question
    * every training run prices first. Scale shape: the merge rewrites
    * touch the DISTINCT-word table only; documents then re-join their
    * words on the vocab's own partitioning (word → n_sym is the only
    * shuffled pair) and aggregate per doc — corpus rows never carry
    * symbol arrays. Integer counts end to end; the per-doc compression
    * ratio is one exact-integer double division. */
  private def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val words = bpeVocab(s, d)
    val w1 = bpeApplyMerge(words, bpeBestPair(words).localCheckpoint())
    val w2 = bpeApplyMerge(w1, bpeBestPair(w1).localCheckpoint())
    val enc = w2.select(col("word"), size(col("s")).cast("long").as("n_sym"))
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens()).as("word"))
      .join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(col("n_sym")).as("n_sym_bpe"))
      .withColumn("compression",
        col("n_sym_bpe").cast("double") / col("n_chars").cast("double"))
      .orderBy("doc_id")
  }

  /** Incremental-ingest dedup — the shape a PRODUCTION corpus runs
    * daily: not "dedup the whole corpus" but "which of today's
    * arrivals are novel?". The corpus/arrival split is deterministic
    * (md5(doc_id) prefix, same device as the sampling family); each
    * arrival is classified as
    *   - dup_of_existing (digest already in the corpus keeper set),
    *   - dup_in_batch    (novel digest, but a lower-id arrival in the
    *                      SAME batch owns it — the window dedupe), or
    *   - novel           (first sighting anywhere),
    * with the keeper it collapses into. Scale shape: the corpus side
    * reduces to DISTINCT (digest, min-id) — 8-byte-ish keys, the only
    * big shuffle — and the arrival batch (small by construction) joins
    * against it; at 100 TB the keeper set is a fraction of corpus rows
    * and the daily batch a fraction of that.
    */
  private def qDedupIncremental(s: SparkSession, d: String): DataFrame = {
    val all = doubled(s, d)
      .withColumn("dig", md5(col("text")))
      .withColumn("is_arrival",
        substring(md5(col("doc_id").cast("string")), 1, 1) < "4")
    val corpus = all.filter(!col("is_arrival"))
      .groupBy(col("dig")).agg(min(col("doc_id")).as("corpus_keeper"))
    val wBatch = Window.partitionBy(col("dig")).orderBy(col("doc_id"))
    all.filter(col("is_arrival"))
      .withColumn("batch_rn", row_number().over(wBatch))
      .withColumn("batch_keeper",
        min(col("doc_id")).over(Window.partitionBy(col("dig"))))
      .join(corpus, Seq("dig"), "left_outer")
      .select(
        col("doc_id"), col("dig"),
        when(col("corpus_keeper").isNotNull, "dup_of_existing")
          .when(col("batch_rn") > 1, "dup_in_batch")
          .otherwise("novel").as("status"),
        coalesce(col("corpus_keeper"), col("batch_keeper")).as("keeper_id"))
      .orderBy("doc_id")
  }

  /** Bloom sizing for [[qBloomNovel]]: ~16 bits/item → ~½%
    * false-positive rate AT EVERY SF — the item estimate comes from
    * the corpus row count, not a constant, so the sketch cannot
    * saturate as the corpus grows (a fixed 80k-bit sketch held the
    * ½% claim only near sf0.001; past it, saturation would silently
    * route nearly the whole arrival batch through the exact
    * anti-join — still correct, but with the stated pruning gone). */
  private val BloomBitsPerItem = 16L

  /** The bloom-flagged arrival frame (doc_id, text, maybe_known) —
    * exposed so the spec can assert the two Bloom guarantees
    * (no false negatives; real pruning) that the exact-verified
    * output, by design, cannot reveal. */
  private[graft] def bloomFlagged(s: SparkSession, d: String): DataFrame = {
    graft.functions.BloomExpressions.register(s)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val arrivals = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" graft-novel-suffix")))
        .otherwise(col("text")).as("text"))
    // size the sketch from the corpus row count: BloomFilterAggregate
    // needs estItems/numBits as FOLDABLE literals, so the count runs
    // first — a parquet metadata count (no column scan), the same
    // "one scalar before planning" shape as the k-core median probe
    val estItems = math.max(docs.count(), 1L)
    val numBits = math.max(BloomBitsPerItem * estItems, 1024L)
    // the sketch is DRIVER-HELD MODEL STATE (numBits/8 = 2 bytes/doc —
    // the Lloyd-centroid class of collect, never data): might_contain
    // requires a constant/scalar-subquery filter side, and inlining the
    // aggregated sketch as a literal is exactly how AQE's runtime
    // filters plant it — the predicate then rides the scan per-row
    // with no join at all
    val bf = docs.agg(
      expr(s"graft_bloom_agg(xxhash64(text), ${estItems}L, ${numBits}L)").as("bf"))
      .head.getAs[Array[Byte]]("bf")
    arrivals.withColumn("maybe_known",
      call_function("graft_might_contain", lit(bf), xxhash64(col("text"))))
  }

  /** Bloom-prefiltered corpus-membership (novelty) check — the 100 TB
    * twin of q_dedup_incremental's digest anti-join: instead of
    * shuffling the full corpus digest set against every arrival batch,
    * the corpus aggregates ONCE into a kilobyte-scale Bloom sketch
    * (Spark's own BloomFilterAggregate — deterministic hashing,
    * order-independent merge) that broadcasts to every executor. A
    * Bloom "no" is definite, so the certain-novel mass exits with ZERO
    * shuffle; only the "maybe" residue (true members + the ~½%
    * false-positive rate BloomBits buys) pays the exact md5 anti-join.
    * The OUTPUT is exact either way — the sketch prunes, never
    * decides — which is what makes the query oracle-able: DuckDB
    * replays the plain NOT IN. Arrivals are the corpus with every 5th
    * doc's text deterministically perturbed, so the expected novel set
    * is known and non-trivial at every SF. */
  private def qBloomNovel(s: SparkSession, d: String): DataFrame = {
    val flagged = bloomFlagged(s, d).localCheckpoint() // two consumers
    val corpusDigs = Tables.documents(s, d)
      .select(md5(col("text")).as("text_md5")).distinct()
    val sure = flagged.filter(!col("maybe_known"))
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    val verified = flagged.filter(col("maybe_known"))
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .join(corpusDigs, Seq("text_md5"), "left_anti")
    sure.select("doc_id", "text_md5")
      .unionAll(verified.select("doc_id", "text_md5"))
      .orderBy("doc_id")
  }

  /** Segment granularity for line-level dedup: non-overlapping
    * 10-token spans (the corpus has no newlines, so fixed token spans
    * stand in for "lines" — same grid a paragraph-dedup pass uses). */
  private val SegLen = 10

  /** Line-level boilerplate removal — the C4/CCNet-style pass that
    * deletes text SEGMENTS repeated across documents (navigation bars,
    * license footers, template fill) while keeping each document's
    * unique remainder, as opposed to whole-document dedup which keeps
    * or drops documents atomically. Each doc is cut into
    * [[SegLen]]-token segments on a fixed grid; a segment whose md5
    * digest appears in ≥2 DISTINCT documents is boilerplate; the
    * surviving segments re-concatenate in order.
    *
    * Scale shape: segments shuffle by 16-byte digest, not text (the
    * segment groupBy and the join back are the only wide exchanges —
    * the exact-dedup pattern at segment granularity); reassembly is
    * one per-doc hash agg whose collect_list is bounded by segments
    * per document, and the deterministic order comes from
    * array_sort on (seg_idx, …) structs, never from collect order.
    * Engine-exact end to end (string equality, integer counts), so
    * the whole keep/drop decision sits under the DuckDB hash gate. */
  private def qLineDedup(s: SparkSession, d: String): DataFrame = {
    val segs = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
              sequence(0, CAST(floor((size(toks) - 1) / $SegLen.0) AS INT)),
              i -> concat_ws(' ', slice(toks, i * $SegLen + 1, $SegLen)))""")))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        col("col").as("seg_text"), md5(col("col")).as("seg_key"))
    val boiler = segs
      .select("seg_key", "doc_id").distinct()
      .groupBy(col("seg_key")).agg(count(lit(1)).as("n_docs_seg"))
      .filter(col("n_docs_seg") >= 2)
      .select(col("seg_key"), lit(true).as("is_boiler"))
    segs.join(boiler, Seq("seg_key"), "left_outer")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(col("is_boiler").cast("long")).as("n_removed"),
        array_sort(collect_list(struct(col("seg_idx"), col("seg_text"), col("is_boiler"))))
          .as("arr"))
      .select(col("doc_id"), col("n_segs"), col("n_removed"),
        concat_ws(" ",
          expr("transform(filter(arr, x -> NOT x.is_boiler), x -> x.seg_text)"))
          .as("kept_text"))
      .withColumn("is_modified", col("n_removed") > 0)
      .orderBy("doc_id")
  }

  /** PII redaction — the scrubbing pass a training pipeline runs
    * before text leaves the raw zone: emails then digit runs are
    * rewritten to placeholder tokens, with per-doc match accounting.
    * The corpus has no natural PII, so the query PLANTS a
    * deterministic contact trailer derived from (source, doc_id) —
    * same fixture-planting device as the 2-bit-variant cluster test —
    * and the redaction machinery itself (two regexp_replace passes,
    * two regexp_count audits) is what the hash gate checks, including
    * Java-regex vs RE2 agreement on the patterns. Order matters and is
    * pinned: emails are counted and redacted FIRST so their digits
    * never double-count as numbers. Pure per-row codegen expressions —
    * embarrassingly parallel, no shuffle until the final sort. */
  private def qPiiRedact(s: SparkSession, d: String): DataFrame = {
    val emailPat = "[a-z0-9.]+@[a-z.]+"
    val numPat = "[0-9]+"
    Tables.documents(s, d)
      .withColumn("raw", concat(
        col("text"), lit(" contact "),
        regexp_replace(lower(col("source")), "[^a-z0-9]", ""),
        lit("."), col("doc_id").cast("string"),
        lit("@mail.example or call "),
        ((col("doc_id") * 7919) % 10000000).cast("string"),
        lit(" ext "), (col("doc_id") % 100).cast("string")))
      .withColumn("n_emails", regexp_count(col("raw"), lit(emailPat)).cast("long"))
      .withColumn("r1", regexp_replace(col("raw"), emailPat, "<EMAIL>"))
      .withColumn("n_numbers", regexp_count(col("r1"), lit(numPat)).cast("long"))
      .withColumn("redacted", regexp_replace(col("r1"), numPat, "<NUM>"))
      .select(col("doc_id"), col("n_emails"), col("n_numbers"),
        length(col("redacted")).cast("long").as("n_chars_red"),
        md5(col("redacted")).as("red_md5"))
      .orderBy("doc_id")
  }

  /** Linear quality scorer — the fastText-classifier-shaped gate a
    * training pipeline runs when thresholds (q_corpus_clean's
    * is_quality) are too blunt: a fixed-weight logistic model over
    * per-doc features (uniqueness ratio, stopword ratio, saturating
    * length). Determinism engineering: every feature is an exact
    * integer division, the length feature saturates RATIONALLY
    * (n/(n+50), no ln), and the squashing function is the rational
    * sigmoid σ(z) = 1/2 + z/(2(1+|z|)) — same shape, fixpoint at
    * z=0 — so the ENTIRE scorer is plain IEEE arithmetic with no
    * libm call, bit-identical across engines with no DECIMAL pin
    * needed. Keep decision ⟺ z ≥ 0 ⟺ score ≥ 0.5. Weights are
    * fixture-plausible stand-ins for a trained model's; swapping in
    * learned weights changes literals, not the plan. Pure narrow maps. */
  /** Shared feature chain of the quality-model family: token counts,
    * uniqueness/stopword ratios, saturating length, and the linear
    * score z — factored so q_domain_cap can rank on the SAME z without
    * re-stating the feature pipeline (its SQL twin is
    * [[qualityZSql]]). */
  private[graft] def withQualityZ(df: DataFrame): DataFrame = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    df
      .withColumn("n_tokens", size(tokens()).cast("long"))
      .withColumn("n_uniq", size(array_distinct(tokens())).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))")).cast("long"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens").cast("double"))
      .withColumn("len_sat",
        col("n_tokens").cast("double") / (col("n_tokens").cast("double") + lit(50.0)))
      .withColumn("z",
        lit(-1.5) + lit(2.0) * col("uniq_ratio")
          - lit(3.0) * col("stop_ratio") + lit(2.5) * col("len_sat"))
  }

  private def qQualityScore(s: SparkSession, d: String): DataFrame =
    withQualityZ(Tables.documents(s, d))
      .withColumn("score",
        lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("uniq_ratio"), col("stop_ratio"), col("len_sat"),
        col("z"), col("score"), (col("z") >= 0.0).as("is_keep"))
      .orderBy("doc_id")

  /** Per-domain (source) cap — the crawl-pipeline knob that stops one
    * domain from dominating a training mix: rank each source's docs by
    * the SAME quality z as q_quality_score (ties broken by doc_id) and
    * keep the top [[DomainCap]]. One window over a source-partitioned
    * shuffle — at 100 TB the partition key is the domain; a
    * pathological hub domain is exactly the skew case the cap itself
    * bounds, since everything past rank [[DomainCap]] is dropped
    * before any downstream work. */
  private def qDomainCap(s: SparkSession, d: String): DataFrame = {
    val byZ = Window.partitionBy(col("source"))
      .orderBy(col("z").desc, col("doc_id"))
    val bySrc = Window.partitionBy(col("source"))
    withQualityZ(Tables.documents(s, d))
      .withColumn("rk", row_number().over(byZ).cast("long"))
      .withColumn("n_source", count(lit(1)).over(bySrc))
      .select(col("doc_id"), col("source"), col("z"), col("rk"),
        col("n_source"), (col("rk") <= DomainCap).as("is_kept"))
      .orderBy("doc_id")
  }

  /** The composed curation flagship — one query that runs the whole
    * batch pipeline a training-data team ships: exact dedup on
    * normalized text (keep-first), the shared quality-z gate (z ≥ 0,
    * q_quality_score's bar), the per-source domain cap ranked on the
    * SAME z among the docs that SURVIVED the earlier stages (capping
    * before dedup would waste budget on copies), the deterministic
    * hash split, and a shard assignment for the selected training
    * rows — emitted as a manifest with one audit flag per stage, so
    * a dropped doc says which gate dropped it. Every stage reuses the
    * exact semantics of its standalone query (q_dedup_exact /
    * q_quality_score / q_domain_cap / q_split_assign / q_shard_plan),
    * so this is the integration proof that the pieces compose. Scale
    * shape: one norm_md5 window + one source window over the
    * SURVIVOR subset + a doc_id-keyed self-join for the rank —
    * nothing wider than the standalone stages. */
  private def qTrainingManifest(s: SparkSession, d: String): DataFrame = {
    val flagged = withQualityZ(Tables.documents(s, d))
      .withColumn("text_norm",
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .withColumn("norm_md5", md5(col("text_norm")))
      .withColumn("keep_dedup", row_number().over(
        Window.partitionBy(col("norm_md5")).orderBy(col("doc_id"))) === 1)
      .withColumn("keep_quality", col("z") >= 0.0)
    // survivor rank WITHOUT a self-join: a running count of survivors
    // over the same (z DESC, doc_id) source order IS each survivor's
    // rank among survivors (non-survivors don't increment and get
    // NULL) — one extra window instead of re-deriving the whole
    // flagged frame for a filtered rank and joining it back, which
    // would scan and shuffle the corpus twice at 100 TB
    val bySrcZ = Window.partitionBy(col("source"))
      .orderBy(col("z").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged
      .withColumn("rk", when(col("keep_dedup") && col("keep_quality"),
        sum(when(col("keep_dedup") && col("keep_quality"), 1L).otherwise(0L))
          .over(bySrcZ)))
      .withColumn("keep_cap", coalesce(col("rk") <= DomainCap, lit(false)))
      .withColumn("split", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
      .withColumn("selected", col("keep_dedup") && col("keep_quality")
        && col("keep_cap") && col("split") === "train")
      .withColumn("shard", when(col("selected"), expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 16")))
      .select("doc_id", "source", "lang", "n_tokens", "z", "keep_dedup",
        "keep_quality", "rk", "keep_cap", "split", "selected", "shard")
      .orderBy("doc_id")
  }

  /** GROUP-SAFE split assignment — the leakage fix q_leakage measures
    * the need for: a per-doc hash split lets two copies of the same
    * text land in train AND test (on the doubled corpus it is
    * guaranteed for ~1/4 of the clusters), silently inflating eval.
    * The fix is to key the split on the CLUSTER, not the doc: every
    * doc inherits the split of its exact-dup cluster (norm_md5), so
    * copies co-travel by construction. The query emits both
    * assignments plus the would-leak flag (naive split ≠ some
    * cluster-mate's naive split), so the audit and the fix are one
    * artifact. Scale shape: one norm_md5-keyed window — the same
    * shuffle q_dedup_exact already pays; the split itself is pure
    * per-row hashing. */
  private def qSplitGroupsafe(s: SparkSession, d: String): DataFrame = {
    val byCluster = Window.partitionBy(col("norm_md5"))
    doubled(s, d)
      .withColumn("norm_md5", md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))))
      .withColumn("split_naive", Sampling.splitOf(Sampling.hexKey(col("doc_id"))))
      .withColumn("split_safe", Sampling.splitOf(
        substring(col("norm_md5"), 1, 2)))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("would_leak",
        min(col("split_naive")).over(byCluster) =!=
          max(col("split_naive")).over(byCluster))
      .select("doc_id", "norm_md5", "cluster_size",
        "split_naive", "split_safe", "would_leak")
      .orderBy("doc_id")
  }

  /** ccnet-style quality tiers: NTILE(3) over the shared quality z
    * WITHIN each language — head (tier 1), middle, tail — the standard
    * "train on head, sample middle, drop tail" partitioning of a
    * crawled corpus. Tie order is (z DESC, doc_id), the same
    * deterministic pin as every other quality consumer; NTILE fill
    * semantics (earlier buckets absorb the remainder) are the SQL
    * standard on both engines. One language-partitioned window — the
    * same shuffle shape as q_domain_cap, so the 100 TB posture is
    * identical (languages are the partition key; per-language windows
    * sort locally). */
  private def qQualityTiers(s: SparkSession, d: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
      .orderBy(col("z").desc, col("doc_id"))
    withQualityZ(Tables.documents(s, d))
      .withColumn("tier", ntile(3).over(byLang).cast("long"))
      .select(col("doc_id"), col("lang"), col("z"), col("tier"))
      .orderBy("doc_id")
  }

  /** Duplicated-SPAN detection — the suffix-array-style exact
    * substring dedup metric ("what fraction of this doc's tokens sit
    * inside a span that occurs elsewhere"): every stride-1
    * [[SpanK]]-token span is keyed by md5; an occurrence is duplicated
    * iff its key occurs ≥ 2 times corpus-wide (cross-doc OR
    * intra-doc). Per doc the query reports span counts plus the UNION
    * length of its duplicated spans (overlapping consecutive spans
    * don't double-count: one lead() pass over sorted starts, each span
    * contributing min(K, gap)). The corpus has no natural boilerplate,
    * so a deterministic 12-token trailer is PLANTED on every 7th doc
    * (same fixture device as q_pii_redact) — the machinery under the
    * hash gate is the span explode + occurrence count + interval
    * union. Scale shape: the explode is ≤ n_tokens rows per doc
    * (token-bounded — NO pair join anywhere, unlike shingle-Jaccard),
    * the occurrence count is one hash agg, membership is a key-equi
    * join, the union pass is one per-doc window — every stage linear
    * in corpus tokens, which is what lets ExactSubstr-style dedup run
    * where all-pairs methods can't. */
  /** Per-doc span-coverage frame (doc_id, source, n_tokens, n_spans,
    * n_dup, covered, cover_frac) — the shared core of q_span_dedup and
    * the evaluation-metric queries (q_auc / q_pr_curve score the
    * cover_frac detector against the planted-trailer ground truth), so
    * detector and evaluation can never drift. */
  private def spanCoverage(s: SparkSession, d: String): DataFrame = {
    val k = SpanK
    val base = Tables.documents(s, d)
      .withColumn("txt",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" " + BoilerTrailer)))
          .otherwise(col("text")))
      .withColumn("toks", tokens("txt"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_spans", greatest(col("n_tokens") - (k - 1), lit(0L)))
    val spans = base.select(col("doc_id"), posexplode(expr(
        s"""CASE WHEN size(toks) >= $k
              THEN transform(sequence(0, size(toks) - $k),
                             i -> md5(concat_ws(' ', slice(toks, i + 1, $k))))
              ELSE CAST(array() AS ARRAY<STRING>) END""")))
      .select(col("doc_id"), col("pos").cast("long").as("start"), col("col").as("key"))
    val dupKeys = spans.groupBy(col("key")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2).select("key")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val cov = spans.join(dupKeys, Seq("key"))
      .withColumn("contrib", least(lit(k.toLong),
        coalesce(lead(col("start"), 1).over(w), col("start") + k) - col("start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"), sum(col("contrib")).as("covered"))
    base.select("doc_id", "source", "n_tokens", "n_spans")
      .join(cov, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("covered"), lit(0L)).as("covered"))
      .withColumn("cover_frac",
        col("covered").cast("double") / col("n_tokens").cast("double"))
  }

  private def qSpanDedup(s: SparkSession, d: String): DataFrame =
    spanCoverage(s, d)
      .withColumn("is_flagged", col("cover_frac") >= lit(0.2))
      .drop("source")
      .orderBy("doc_id")

  // ---- Evaluation metrics: exact AUC + per-source PR curve ---------
  //
  // A data pipeline that SCORES documents needs to evaluate those
  // scores against ground truth at corpus scale. The detector under
  // test is the span-coverage boilerplate score (cover_frac) and the
  // gold labels are the corpus's planted trailer docs (doc_id % 7 = 0
  // — the same planted-ground-truth device every recall spec uses).
  //
  // q_auc is the tie-corrected Mann-Whitney AUC in EXACT integer
  // arithmetic: group docs by score (the grouped frame IS the score
  // histogram — at 100 TB the cumsum runs over distinct scores, not
  // docs, and is range-partitionable), cumulative counts give each tie
  // group's doubled average rank 2·start + c − 1 without any division,
  // and AUC = (2U)/(2·n⁺·n⁻) divides two exact BIGINTs once at the
  // end. The giant tie group at cover_frac = 0 exercises the tie
  // correction for real. u2 = 2U is emitted so the gate compares an
  // exact integer, not only the derived double.
  private def qAuc(s: SparkSession, d: String): DataFrame = {
    val g = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .groupBy("cover_frac")
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
    val cum = Window.orderBy("cover_frac")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("before", coalesce(sum(col("c")).over(cum), lit(0L)))
      .agg(
        sum(col("p")).as("npos"),
        sum(col("c") - col("p")).as("nneg"),
        sum(col("p") * (lit(2L) * (col("before") + lit(1L)) + col("c") - lit(1L))).as("s2"))
      .select(
        col("npos").as("n_pos"), col("nneg").as("n_neg"),
        (col("s2") - col("npos") * (col("npos") + lit(1L))).as("u2"),
        ((col("s2") - col("npos") * (col("npos") + lit(1L))).cast("double")
          / (lit(2L) * col("npos") * col("nneg")).cast("double")).as("auc"))
  }

  // q_auc_by_source: the fairness slice of q_auc — the same exact
  // tie-corrected Mann-Whitney machinery partitioned per source, so a
  // detector that looks fine pooled can be caught discriminating on a
  // slice (the eval every curation gate should run per domain/lang).
  // All arithmetic identical to q_auc but with source-partitioned
  // histograms and cumulative windows; sources whose slice is all-
  // positive or all-negative yield NULL AUC via the CASE guard on
  // both engines. One (source, score) hash agg + a source-partitioned
  // window — range-partitionable, nothing global.
  private def qAucBySource(s: SparkSession, d: String): DataFrame = {
    val g = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .groupBy("source", "cover_frac")
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
    val cum = Window.partitionBy("source").orderBy("cover_frac")
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("before", coalesce(sum(col("c")).over(cum), lit(0L)))
      .groupBy("source")
      .agg(
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        (sum(col("p") * (lit(2L) * (col("before") + lit(1L)) + col("c") - lit(1L)))
          - sum(col("p")) * (sum(col("p")) + lit(1L))).as("u2"))
      .withColumn("auc", when(col("n_pos") > 0L && col("n_neg") > 0L,
        col("u2").cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
      .select("source", "n_pos", "n_neg", "u2", "auc")
      .orderBy("source")
  }

  // q_mutual_info: I(lang; source) over the corpus — the "is my
  // language mix confounded with my source mix" diagnostic a mixture
  // designer checks before reweighting one axis independently of the
  // other. Joint/marginal counts are exact BIGINTs from ONE joint
  // aggregate (marginals re-aggregate the model-sized joint frame);
  // each entropy is a sum of DECIMAL(18,9)-pinned p·ln p terms (the
  // q_doc_entropy discipline — sums over the model-sized label
  // domains, order-free once pinned), and MI = H(lang) + H(source) −
  // H(joint) is a fixed-shape IEEE expression over those three.
  private def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    val joint = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
    val nF = joint.agg(sum(col("c")).as("n"))
    def entropy(grouped: DataFrame): DataFrame =
      grouped.crossJoin(broadcast(nF))
        .withColumn("term", expr(
          """CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9))"""))
        .agg((lit(0.0) - expr("CAST(SUM(term) AS DOUBLE)")).as("h"),
          count(lit(1)).as("k"))
    val hJoint = entropy(joint)
      .select(col("h").as("h_joint"), col("k").as("n_cells"))
    val hLang = entropy(joint.groupBy("lang").agg(sum(col("c")).as("c")))
      .select(col("h").as("h_lang"), col("k").as("n_langs"))
    val hSrc = entropy(joint.groupBy("source").agg(sum(col("c")).as("c")))
      .select(col("h").as("h_source"), col("k").as("n_sources"))
    nF.crossJoin(broadcast(hLang)).crossJoin(broadcast(hSrc))
      .crossJoin(broadcast(hJoint))
      .withColumn("mi", col("h_lang") + col("h_source") - col("h_joint"))
      .select(col("n").as("n_docs"), col("n_langs"), col("n_sources"),
        col("n_cells"), col("h_lang"), col("h_source"), col("h_joint"),
        col("mi"))
  }

  // q_pr_curve: precision/recall of the same detector at the 10
  // within-source rank-decile cutoffs (rank by cover_frac DESC, ties
  // by doc_id). Source-partitioned windows — the q_domain_cap shuffle
  // shape — then one hash aggregate per (source, k): every count is an
  // exact BIGINT and the two divisions are deterministic; a source
  // with no positives yields NULL recall on both engines (CASE guard).
  private def qPrCurve(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy("source")
    val r = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("cover_frac").desc, col("doc_id"))).cast("long"))
      .withColumn("nl", count(lit(1)).over(bySrc))
      .withColumn("npos_l", sum(col("pos")).over(bySrc))
    r.withColumn("k", explode(expr("sequence(1L, 10L)")))
      .withColumn("cutoff", expr("CAST((k * nl + 9) DIV 10 AS BIGINT)"))
      .groupBy("source", "k")
      .agg(
        min("cutoff").as("n_kept"),
        sum(when(col("rn") <= col("cutoff"), col("pos")).otherwise(0L)).as("tp"),
        sum(when(col("rn") <= col("cutoff"), lit(1L) - col("pos")).otherwise(0L)).as("fp"),
        min("npos_l").as("npos_l"))
      .select(col("source"), col("k"), col("n_kept"), col("tp"), col("fp"),
        (col("tp").cast("double") / col("n_kept").cast("double")).as("p_at_k"),
        when(col("npos_l") > 0,
          col("tp").cast("double") / col("npos_l").cast("double")).as("r_at_k"))
      .orderBy("source", "k")
  }

  // q_calibration: the reliability table of the same detector — bucket
  // cover_frac into 10 equal-width bins and report per-bin volume and
  // observed positive rate. AUC says whether the scorer RANKS well;
  // the calibration table says whether its absolute values can be
  // trusted as probabilities (the question a quality-threshold picker
  // actually asks). Bin ids and counts are exact ints (floor of an
  // IEEE multiply is deterministic cross-engine); the two emitted
  // doubles are one exact division each — fully hash-gated. Scale:
  // one hash aggregate over ≤10 groups, map-side partials.
  private def qCalibration(s: SparkSession, d: String): DataFrame =
    spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("bin",
        least(floor(col("cover_frac") * lit(10.0)).cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
      .select(col("bin"), (col("bin").cast("double") / lit(10.0)).as("bin_lo"),
        col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
      .orderBy("bin")

  /** Expected calibration error of the span-coverage detector — the
    * scalar summary of q_calibration's reliability table: ece =
    * Σ_b (n_b/N)·|pos_rate_b − mean_conf_b| over the same 10
    * equal-width confidence bins. Mean confidence per bin is a sum of
    * doubles, so each cover_frac is DECIMAL(18,9)-pinned before the
    * bin sum (tie-safe: cover_frac is p/q with q = n_tokens ≤ ~112,
    * which can never land on a half-ulp decimal boundary), and each
    * bin's weighted gap is pinned again before the final sum. Scale
    * shape: rides the shared spanCoverage chain, then two hash
    * aggregations over ≤ 10 bin rows. */
  private def qEce(s: SparkSession, d: String): DataFrame = {
    val bins = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("bin",
        least(floor(col("cover_frac") * lit(10.0)).cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        expr("CAST(SUM(CAST(cover_frac AS DECIMAL(18,9))) AS DOUBLE)").as("conf_sum"))
    bins.agg(
      count(lit(1)).cast("long").as("n_bins"),
      sum(col("n")).cast("long").as("n_docs"),
      expr("""CAST(SUM(CAST(
                CAST(n AS DOUBLE) * abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
                  - conf_sum / CAST(n AS DOUBLE))
              AS DECIMAL(18,9))) AS DOUBLE)""").as("wsum"))
      .withColumn("ece", col("wsum") / col("n_docs").cast("double"))
      .select("n_bins", "n_docs", "ece")
  }

  /** Thresholded confusion matrix + the derived classification
    * metrics of the same span-coverage detector (predict positive at
    * cover_frac ≥ 0.2 — q_span_dedup's flag threshold — truth the
    * planted doc_id % 7 trailer): tp/fp/fn/tn as exact BIGINTs, then
    * accuracy, precision, recall, F1, and Cohen's κ. Every double is
    * derived from the four integer cells by the same literal IEEE
    * expression on both engines — no sums of doubles anywhere, so no
    * pinning needed. Scale shape: rides the shared spanCoverage
    * chain, then ONE hash aggregate to four counters — the cheapest
    * possible evaluation pass at any corpus size. */
  private def qConfusion(s: SparkSession, d: String): DataFrame = {
    val cells = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("pred", when(col("cover_frac") >= 0.2, 1L).otherwise(0L))
      .agg(
        sum(col("pred") * col("pos")).as("tp"),
        sum(col("pred") * (lit(1L) - col("pos"))).as("fp"),
        sum((lit(1L) - col("pred")) * col("pos")).as("fn"),
        sum((lit(1L) - col("pred")) * (lit(1L) - col("pos"))).as("tn"))
    cells
      .withColumn("n", col("tp") + col("fp") + col("fn") + col("tn"))
      .withColumn("accuracy",
        (col("tp") + col("tn")).cast("double") / col("n").cast("double"))
      .withColumn("precision",
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
      .withColumn("recall",
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
      .withColumn("f1",
        lit(2.0) * col("tp").cast("double")
          / (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
      // κ = (po − pe)/(1 − pe) with pe from the exact marginal
      // products — the ratio is formed from two exact BIGINT-derived
      // doubles with one division each, identical cross-engine
      .withColumn("pe",
        ((col("tp") + col("fp")) * (col("tp") + col("fn"))
          + (col("fn") + col("tn")) * (col("fp") + col("tn"))).cast("double")
          / (col("n") * col("n")).cast("double"))
      .withColumn("kappa", (col("accuracy") - col("pe")) / (lit(1.0) - col("pe")))
      .select("tp", "fp", "fn", "tn", "n", "accuracy", "precision", "recall", "f1", "kappa")
  }

  /** Brier score with Murphy's reliability/resolution/uncertainty
    * decomposition of the same span-coverage detector (forecast p =
    * cover_frac, outcome the planted doc_id % 7 trailer), 10 bins as
    * in q_ece. INTEGER-EXACT throughout (the q_auc discipline): the
    * forecast is quantized to a fixed 1e4 denominator with pure
    * BIGINT round-half-up ((20000·covered + n_tokens) DIV 2n_tokens),
    * the bin is integer floor-division, and every sum is a BIGINT of
    * squared integers — no double is ever summed or pinned, because
    * double→decimal casts of arbitrary reals round apart across
    * engines (observed at the 9th decimal at sf0.01/sf0.001). Each
    * output is then ONE IEEE division of exact integers. The per-bin
    * DIV n in rel/res drops a sub-unit remainder (≤10 quanta of
    * 1e-8·N total — quantization, not noise, and identical in both
    * engines since all operands are nonnegative, where Spark's DIV
    * and DuckDB's // agree). Magnitude envelope: squares ≤ 1e8·n_k²
    * hold in BIGINT to ~1e9 docs per bin; past that the documented
    * switch is DECIMAL(38,0) sums (ANSI keeps the overflow loud).
    * (With non-constant forecasts inside a bin, rel − res + unc only
    * approximates the raw score — the gap is the within-bin
    * variance; both sides are reported, none asserted.) Scale shape:
    * rides the shared spanCoverage chain, one 10-key aggregate, two
    * 1-row broadcasts — a single evaluation pass at any corpus
    * size. */
  private def qBrier(s: SparkSession, d: String): DataFrame = {
    val scp = spanCoverage(s, d)
      .withColumn("pos", when(col("doc_id") % 7 === 0, 1L).otherwise(0L))
      .withColumn("p4", expr(
        "(CAST(covered AS BIGINT) * 20000 + n_tokens) DIV (2 * CAST(n_tokens AS BIGINT))"))
      .withColumn("bin", expr(
        "least((CAST(covered AS BIGINT) * 10) DIV CAST(n_tokens AS BIGINT), 9)"))
    val raw = scp.agg(
      count(lit(1)).as("n_docs"),
      sum(expr("(p4 - 10000 * pos) * (p4 - 10000 * pos)")).as("sq_scaled"),
      sum(col("pos")).as("tot_pos"))
    val bins = scp.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("p4")).as("s4"))
    val comp = bins.crossJoin(broadcast(raw))
      .agg(
        sum(expr("((s4 - 10000 * n_pos) * (s4 - 10000 * n_pos)) DIV n"))
          .as("rel_scaled"),
        sum(expr(
          "((n_pos * n_docs - tot_pos * n) * (n_pos * n_docs - tot_pos * n)) DIV n"))
          .as("res_scaled"))
    raw.crossJoin(broadcast(comp))
      .select(col("n_docs"),
        (col("sq_scaled").cast("double")
          / (lit(1.0e8) * col("n_docs").cast("double"))).as("brier"),
        (col("rel_scaled").cast("double")
          / (lit(1.0e8) * col("n_docs").cast("double"))).as("reliability"),
        (col("res_scaled").cast("double")
          / (col("n_docs").cast("double") * col("n_docs").cast("double")
            * col("n_docs").cast("double"))).as("resolution"),
        ((col("tot_pos").cast("double") / col("n_docs").cast("double"))
          * (lit(1.0) - col("tot_pos").cast("double") / col("n_docs").cast("double")))
          .as("uncertainty"))
  }

  /** Dirichlet prior scale for q_source_terms (Monroe et al.'s
    * informative prior: α_w = α0·y_w/n). Shared literal so both
    * engines parse the same double. */
  private val LogOddsAlpha0 = "20.0"

  /** Per-source distinctive terms by log-odds-ratio with informative
    * Dirichlet prior (Monroe, Colaresi & Quinn 2008) — the curation
    * question "what characterizes this source vs the rest of the
    * corpus", answered more robustly than tf-idf (the prior shrinks
    * rare-term noise). δ_sw compares the term's odds within source s
    * against its odds in the remaining corpus, both smoothed by
    * α0·y_w/n. All ln inputs are exact-integer-derived doubles, each
    * δ is a PER-ROW expression pinned to DECIMAL(18,9) (no sums of
    * doubles anywhere), and the per-source top-5 ranks on the pinned
    * value with a term tiebreak. Scale shape: one (source, term)
    * hash agg, term-keyed and source-keyed model joins, a 1-row
    * broadcast of corpus totals, and a per-source top-k window —
    * nothing wider than the vocabulary ever shuffles. */
  private def qSourceTerms(s: SparkSession, d: String): DataFrame = {
    val a0 = LogOddsAlpha0
    val ysw = Tables.documents(s, d)
      .select(col("source"), explode(tokens()).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("y_sw"))
    val yw = ysw.groupBy("term").agg(sum(col("y_sw")).as("y_w"))
    val ns = ysw.groupBy("source").agg(sum(col("y_sw")).as("n_s"))
    val n = yw.agg(sum(col("y_w")).as("n_tot"))
    ysw.join(yw, Seq("term")).join(ns, Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("delta", expr(
        s"""CAST(CAST(
              ln((CAST(y_sw AS DOUBLE) + $a0 * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
                 / (CAST(n_s AS DOUBLE) + $a0 - CAST(y_sw AS DOUBLE)
                    - $a0 * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE)))
              - ln((CAST(y_w - y_sw AS DOUBLE) + $a0 * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE))
                 / (CAST(n_tot - n_s AS DOUBLE) + $a0 - CAST(y_w - y_sw AS DOUBLE)
                    - $a0 * CAST(y_w AS DOUBLE) / CAST(n_tot AS DOUBLE)))
            AS DECIMAL(18,9)) AS DOUBLE)"""))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("delta").desc, col("term"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("source", "rank", "term", "y_sw", "delta")
      .orderBy("source", "rank")
  }

  /** Per-source Zipf slope — the corpus-health diagnostic (natural
    * text shows slope ≈ −1 on the log-log rank/frequency line; a
    * too-flat slope flags synthetic or templated text, exactly what a
    * crawl-curation pass screens for). OLS over (ln rank, ln freq)
    * with every summand pinned to DECIMAL(18,9) before the per-source
    * sums (x, y ≤ ln(vocab) so the pin is far from the decimal
    * boundary), slope/intercept then closed-form divisions of
    * identical doubles. Rank ties break on the term for a total
    * order. Scale shape: one (source, term) hash agg, a per-source
    * rank window over vocabulary-sized partitions, one per-source
    * aggregation — the whole query is vocabulary-bounded after the
    * token explode. */
  /** Boilerplate n-gram detection — the C4/RefinedWeb curation step
    * that finds template text (nav bars, license footers, cookie
    * banners) by DOCUMENT frequency: a 3-gram occurring in ≥1 % of
    * the corpus is template, not content. Emits the flagged gram
    * table (df = distinct docs, n_occ = total occurrences) a cleaning
    * pass would subtract. Scale shape: the gram explode is a narrow
    * per-doc map (≤ n_tokens rows each); the distinct-per-doc cut
    * happens inside the same aggregation (count + count(DISTINCT
    * doc_id) share one shuffle on gram); the ≥1 % filter makes the
    * output tiny before the final rank sort. The n_docs scalar is a
    * broadcast. */
  private def qBoilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens().as("t"))
      .filter(size(col("t")) >= 3)
    val nDocs = Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"))
    docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 2), i -> concat_ws(' ', slice(t, i, 3)))")).as("gram"))
      .groupBy(col("gram"))
      .agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * lit(100L) >= col("n_docs"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("df").desc, col("gram"))).cast("long"))
      .select(
        col("rank"), col("gram"), col("df"), col("n_occ"), col("n_docs"),
        (col("df").cast("double") / col("n_docs")).as("df_frac"))
      .orderBy("rank")
  }

  private def qZipf(s: SparkSession, d: String): DataFrame = {
    val xy = Tables.documents(s, d)
      .select(col("source"), explode(tokens()).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("freq").desc, col("term"))).cast("long"))
      .select(col("source"),
        expr("CAST(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)").as("x"),
        expr("CAST(CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE)").as("y"))
    xy.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        expr("CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE)").as("sx"),
        expr("CAST(SUM(CAST(y AS DECIMAL(18,9))) AS DOUBLE)").as("sy"),
        expr("CAST(SUM(CAST(x * y AS DECIMAL(18,9))) AS DOUBLE)").as("sxy"),
        expr("CAST(SUM(CAST(x * x AS DECIMAL(18,9))) AS DOUBLE)").as("sxx"))
      .withColumn("zipf_slope",
        (col("sxy") - col("sx") * col("sy") / col("n_terms").cast("double"))
          / (col("sxx") - col("sx") * col("sx") / col("n_terms").cast("double")))
      .withColumn("intercept",
        (col("sy") - col("zipf_slope") * col("sx")) / col("n_terms").cast("double"))
      .select("source", "n_terms", "zipf_slope", "intercept")
      .orderBy("source")
  }

  // ---- URL canonicalization (crawl-dedup key) -----------------------
  //
  // Crawl curation dedups by CANONICAL URL before any content pass:
  // scheme/host case, default ports, www prefixes, tracking params and
  // fragments all produce distinct raw strings for the same resource.
  // The fixture has no URL column, so a messy deterministic URL is
  // synthesized per doc (mixed-case scheme+host, :443, www., utm_*
  // params around a real one, a fragment) and then canonicalized with
  // the rule chain a crawler ships: lowercase scheme+host, strip the
  // default https port and www., drop the fragment, remove utm_*
  // params while preserving the rest. Pure per-row regex/string
  // expressions (narrow map, codegen'd, no shuffle); the oracle runs
  // the identical rule chain, and the construction was cross-checked
  // against python urllib parsing. Patterns stay in the RE2 ∩ Java
  // regex common subset (no lookaround/backrefs) — the cross-engine
  // contract for every regexp in this file.
  private def qUrlCanonicalize(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("url", concat(
        lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/"),
        col("source"), lit("/Doc/"), col("doc_id"),
        lit("/?utm_source=agg&ref="), col("lang"),
        lit("&utm_medium=rss#sec"), col("doc_id") % 5))
    docs
      .withColumn("scheme",
        lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)))
      .withColumn("host",
        regexp_replace(regexp_replace(
          lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1)),
          ":443$", ""), "^www\\.", ""))
      .withColumn("rest",
        regexp_replace(regexp_replace(regexp_replace(
          regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^#]*)", 1),
          "&utm_[A-Za-z0-9_]*=[^&]*", ""),
          "[?]utm_[A-Za-z0-9_]*=[^&]*&", "?"),
          "[?]utm_[A-Za-z0-9_]*=[^&]*$", ""))
      .select(col("doc_id"), col("url"),
        concat(col("scheme"), lit("://"), col("host"), col("rest")).as("canon_url"),
        col("host"))
      .orderBy("doc_id")
  }

  // ---- Cross-source overlap (container-level mirroring) ------------
  //
  // The "which domains mirror each other" curation diagnostic: exact
  // Jaccard and containment between each source pair's DISTINCT
  // 3-shingle sets. Doc-level dedup misses systematic mirroring (a
  // domain republishing another's content across MANY docs); the
  // container-level overlap matrix is how crawl curation finds it.
  // Scale shape: the shingle join's fan-out per key is bounded by the
  // number of SOURCES sharing the shingle (≤ S, so ≤ S² pair rows per
  // key — container count, not corpus size), and the shuffle is linear
  // in Σ per-source distinct shingles. At web scale (millions of
  // domains) the deployment adds the same DF cap / MinHash move as the
  // doc-level path; at the harness's 20 sources the exact join IS the
  // production shape.
  private def qSourceOverlap(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .select(col("source"), explode(expr(
        """array_distinct(transform(sequence(1, greatest(size(toks) - 2, 1)),
             i -> concat_ws(' ', slice(toks, i, 3))))""")).as("sh"))
      .distinct()
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val inter = st.select(col("source").as("src_a"), col("sh"))
      .join(st.select(col("source").as("src_b"), col("sh")), Seq("sh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("n_sh").as("n_a")), Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("n_sh").as("n_b")), Seq("src_b"))
      .withColumn("jaccard", col("n_common").cast("double")
        / (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .withColumn("containment", col("n_common").cast("double")
        / least(col("n_a"), col("n_b")).cast("double"))
      .select("src_a", "src_b", "n_a", "n_b", "n_common", "jaccard", "containment")
      .orderBy("src_a", "src_b")
  }

  // ---- Novelty curve (crawl-saturation diagnostic) -----------------
  //
  // Per-doc novelty = the fraction of its distinct 3-shingles whose
  // FIRST corpus occurrence (min doc_id, the ingest-order proxy; a
  // deployment uses ingest timestamps) is this document. Plotted over
  // ingest order this is the curve that tells a crawl team when new
  // data stops adding content — diminishing novelty = saturation =
  // the point where further crawling buys dedup work, not tokens.
  // Scale shape: one shingle-keyed min-agg (map-side combine), one
  // join back, one per-doc agg — all linear, no pair joins.
  private def qNoveltyCurve(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("toks", tokens())
      .select(col("doc_id"), explode(array_distinct(
        expr("""transform(sequence(1, greatest(size(toks) - 2, 1)),
                 i -> concat_ws(' ', slice(toks, i, 3)))"""))).as("sh"))
    val first = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_sh").cast("double"))
      .orderBy("doc_id")
  }

  /** Fixed query-term set for the retrieval family (BM25 / hybrid) —
    * deterministic stand-in for a user query; all three terms occur in
    * the corpus with distinct document frequencies. */
  private val Bm25Query = Seq("spark", "vector", "hash")

  /** Per-doc Okapi BM25 scores (k1=1.2, b=0.75, Lucene's
    * ln(1 + (N−df+0.5)/(df+0.5)) idf so scores stay positive when a
    * term's df exceeds N/2 — true for every term in this tiny-vocab
    * corpus). Cross-engine determinism: the only libm call is ln(),
    * and each TERM's score (idf × tf-saturation) is pinned to
    * DECIMAL(18,9) before the per-doc sum — the q_doc_entropy device —
    * so the sum is order-independent and the exposed double identical
    * in both engines. Scale shape: tf is one hash agg over the
    * query-filtered token stream (the filter prunes the explode to
    * |Q| terms per doc), df is an agg over tf, and the score join
    * broadcasts the 2-row corpus stats — no shuffle carries more than
    * (doc, term ∈ Q) rows. */
  /** Per-(doc, query-term) counts — the tf frame shared by the BM25
    * scorer and the retrieval-evaluation queries (graded relevance is
    * defined over the SAME counts the ranker consumes). */
  private def bm25Tf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens()).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Per-(doc, query-term) PINNED BM25 contribution `sterm`
    * (DECIMAL(18,9)) — the shared posting-score frame the full scorer
    * sums per doc and the WAND pruner bounds per term. */
  private def bm25TermScores(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("dl", size(tokens()).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = bm25Tf(docs)
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dft, Seq("term"))
      .join(docs.select("doc_id", "dl"), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("sterm", expr(
        """CAST(
             ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
           AS DECIMAL(18,9))"""))
      .select("doc_id", "term", "sterm")
  }

  private def bm25Frame(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("dl", size(tokens()).cast("long"))
    val scored = bm25TermScores(s, d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        expr("CAST(SUM(sterm) AS DOUBLE)").as("score"))
    docs.select("doc_id", "dl").join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("dl"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** WAND/MaxScore-style PRUNED BM25 top-k (Broder et al. 2003,
    * "Efficient query evaluation using a two-level retrieval
    * process") — batch re-expression of the posting-skipping idea:
    * (1) per-term upper bound ub(t) = max posting score (a DECIMAL
    * max — exact); (2) a seed pass fully scores only the RAREST
    * term's postings and takes its k-th best score as threshold θ;
    * (3) only docs whose Σ ub over matched terms ≥ θ are fully
    * scored. LOSSLESS by the subset argument: θ ≤ the global k-th
    * best (a subset's k-th order statistic never exceeds the
    * corpus's), and any true top-k doc has ub_sum ≥ score ≥ θ, with
    * both inequalities exact in the decimal domain and preserved by
    * the monotone double cast — which is why the ORACLE is the plain
    * exhaustive top-k SQL: the hash gate itself proves the pruning
    * drops no answer. Scale shape: the seed is one posting list, the
    * bound pass is a (doc,term∈Q) agg against a |Q|-row broadcast,
    * and full scoring touches only survivors — the batch analog of
    * skipping posting blocks. */
  private[graft] def bm25WandFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val k = 20
    val ts = bm25TermScores(s, d).localCheckpoint() // ub, seed, bound and final passes share it
    val ub = ts.groupBy("term").agg(max(col("sterm")).as("ub"))
    val rare = ts.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df"), col("term")).limit(1)
    val seedDocs = ts.join(broadcast(rare.select("term")), Seq("term"))
      .select("doc_id").distinct()
    val theta = ts.join(seedDocs, Seq("doc_id"))
      .groupBy("doc_id").agg(expr("CAST(SUM(sterm) AS DOUBLE)").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .agg(min(col("score")).as("theta"), count(lit(1)).as("n_seed"))
    val cand = ts.join(broadcast(ub), Seq("term"))
      .groupBy("doc_id").agg(expr("CAST(SUM(ub) AS DOUBLE)").as("ub_sum"))
      .crossJoin(broadcast(theta))
      .filter(col("n_seed") < k || col("ub_sum") >= col("theta"))
      .select("doc_id")
    val res = ts.join(cand, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"),
        expr("CAST(SUM(sterm) AS DOUBLE)").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k) // TakeOrderedAndProject over the survivors — no global sort
      .withColumn("rank", row_number().over( // k-row frame only
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "n_matched", "score")
      .orderBy("rank")
    (res, cand)
  }

  private def qBm25Wand(s: SparkSession, d: String): DataFrame =
    bm25WandFrames(s, d)._1

  /** The BM25 scoring chain as oracle CTEs ending in per-doc
    * `bm(doc_id, dl, n_matched, score)` — the SQL twin of
    * [[bm25Frame]], shared by the q_bm25 and q_hybrid_rrf oracles. */
  private def bm25Sql: String = {
    val qlist = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""dd AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |         string_split(text, ' ') AS toks
       |  FROM documents
       |), st AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(dl) AS BIGINT) AS sum_dl
       |  FROM dd
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS term FROM dd
       |), tft AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
       |  WHERE term IN ($qlist) GROUP BY doc_id, term
       |), dft AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tft GROUP BY term
       |), sc AS (
       |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
       |         CAST(SUM(CAST(
       |           ln(1.0 + (CAST(s.n_docs - f.df AS DOUBLE) + 0.5) / (CAST(f.df AS DOUBLE) + 0.5))
       |           * ((CAST(t.tf AS DOUBLE) * 2.2)
       |              / (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
       |                   / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
       |         AS DECIMAL(18,9))) AS DOUBLE) AS score
       |  FROM tft t JOIN dft f USING (term) JOIN dd d USING (doc_id) CROSS JOIN st s
       |  GROUP BY t.doc_id
       |), bm AS (
       |  SELECT d.doc_id, d.dl,
       |         CAST(COALESCE(sc.n_matched, 0) AS BIGINT) AS n_matched,
       |         COALESCE(sc.score, 0.0) AS score
       |  FROM dd d LEFT JOIN sc USING (doc_id)
       |)""".stripMargin
  }

  // rank via the two-level ScaleRank primitive (negated score keeps
  // the bucket monotone with the DESC order): the per-doc frame is
  // corpus-grain, so a global row_number window would single-partition
  // the corpus — the exact class q_deciles/q_rfm were rewritten for
  private def qBm25(s: SparkSession, d: String): DataFrame =
    // per-doc frame pinned once — ScaleRank's two model passes would
    // otherwise replay the BM25 chain per pass
    ScaleRank.withGlobalRank(bm25Frame(s, d).localCheckpoint(), -col("score"),
        Seq(col("score").desc, col("doc_id")), "rank", "__n")
      .select("doc_id", "dl", "n_matched", "score", "rank")
      .orderBy("doc_id")

  /** Hybrid retrieval via reciprocal-rank fusion — the standard way a
    * search stack combines a lexical ranker with a vector ranker
    * WITHOUT commensurating their score scales: each candidate scores
    * 1/(60+rank_lex) + 1/(60+rank_vec). Lexical ranks come from the
    * shared BM25 chain; vector ranks from exact cosine against a fixed
    * query embedding (vec_id 0), joined on doc_id = vec_id. RRF is the
    * determinism-friendly fusion: the fused score is pure rational
    * arithmetic over INTEGER ranks, so unlike score-interpolation
    * there is no cross-engine float risk beyond the already-pinned
    * inputs. Scale shape: both per-doc rank frames ride the two-level
    * ScaleRank primitive (the old global windows single-partitioned
    * the corpus-grain score/cosine frames), one broadcast of the
    * 1-row query vector, one equi-join of the two rank frames, and
    * the fused top-20 is an orderBy+limit (TakeOrderedAndProject —
    * per-partition top-k, no global sort) with the output rank
    * numbered over the 20 survivors only. */
  private def qHybridRrf(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    // both per-doc score frames pinned once (multi-consumer rule:
    // ScaleRank's model passes would replay the scoring chains)
    val lexRank = ScaleRank.withGlobalRank(
        bm25Frame(s, d).localCheckpoint(), -col("score"),
        Seq(col("score").desc, col("doc_id")), "rank_lex", "__nl")
      .select("doc_id", "rank_lex")
    val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("q_vec"))
    val cosFrame = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("c_vec"))
      .crossJoin(broadcast(qv))
      .withColumn("cos", expr("graft_cosine(c_vec, q_vec)"))
      .localCheckpoint()
    val vecRank = ScaleRank.withGlobalRank(cosFrame, -col("cos"),
        Seq(col("cos").desc, col("doc_id")), "rank_vec", "__nv")
      .select("doc_id", "rank_vec")
    val top = lexRank.join(vecRank, Seq("doc_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(60.0) + col("rank_lex").cast("double"))
          + lit(1.0) / (lit(60.0) + col("rank_vec").cast("double")))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
    top
      .withColumn("rank", row_number().over( // over the 20 survivors only
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank_lex", "rank_vec", "rrf", "rank")
      .orderBy("rank")
  }

  /** Inverted-index build — the search-engine-shard artifact: per
    * term, document frequency, corpus frequency, and the head of the
    * doc_id-ordered posting list ("doc:tf" pairs, capped at 10 for the
    * comparable output; production writes the full list). Scale shape:
    * this is THE shard-by-term workload — one (term, doc) hash agg,
    * one per-term agg whose collect_list is bounded by the posting cap
    * only in the output projection (the full list aggregation is the
    * honest cost, stated here); partitioning by term is what makes a
    * distributed index build linear. */
  private def qInvertedIndex(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens()).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        concat_ws(",", expr(
          """transform(slice(array_sort(collect_list(struct(doc_id, tf))), 1, 10),
               x -> concat(CAST(x.doc_id AS STRING), ':', CAST(x.tf AS STRING)))"""))
          .as("postings_head"))
      .orderBy("term")

  /** Rank cutoffs shared by the retrieval-evaluation queries. */
  private val EvalCutoffs = Seq(1L, 3L, 5L, 10L, 20L)

  /** Binary-relevance bar for q_retrieval_metrics: a doc is relevant
    * when its graded relevance (total query-term occurrences) reaches
    * this threshold — strict enough (66 of 500 docs at sf0.01) that
    * BM25's tf-saturation actually disagrees with the raw counts and
    * P@k / MRR are non-trivial. */
  private val RelevanceBar = 10L

  /** BM25 ranking relevance-joined: (doc_id, rel, rank) — graded rel
    * from the shared tf frame, system rank from the shared scorer.
    * The global rank rides ScaleRank (two-level, bucket-partitioned
    * windows only): the per-doc frame is corpus-grain, so the old
    * `row_number() OVER (ORDER BY score)` would serialize the corpus
    * onto one executor at 100 TB. */
  private def rankedRelevance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val rel = bm25Tf(docs).groupBy("doc_id").agg(sum(col("tf")).as("rel"))
    // pin the per-doc frame once: ScaleRank's model passes (min/max
    // agg + bucket counts) plus the output plan would otherwise replay
    // the whole BM25 scoring chain three times per consumer (the
    // multi-consumer lineage-replay rule)
    val joined = bm25Frame(s, d).join(rel, Seq("doc_id"), "left_outer")
      .withColumn("rel", coalesce(col("rel"), lit(0L)).cast("long"))
      .localCheckpoint()
    ScaleRank.withGlobalRank(joined, -col("score"),
        Seq(col("score").desc, col("doc_id")), "rank", "__n")
      .select("doc_id", "rel", "rank")
  }

  /** NDCG@k of the BM25 ranking against graded relevance (query-term
    * occurrence counts — the relevance signal available without human
    * judgments), at cutoffs 1/3/5/10/20. Linear-gain DCG with the
    * standard 1/log2(rank+1) discount; IDCG from the ideal (rel desc)
    * ordering of the same docs; each per-rank term is pinned to
    * DECIMAL(18,9) before the sum (the BM25 device) so the exposed
    * doubles are cross-engine identical, and ndcg = dcg/idcg is one
    * IEEE division of two identical doubles. Scale shape: BOTH global
    * ranks ride the two-level ScaleRank primitive (no unpartitioned
    * window anywhere — the multi-query production shape is also
    * demonstrated in-plan by q_eval_multiprobe); the cutoff join
    * broadcasts a 5-row frame; everything else is hash aggregation. */
  private def qNdcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NOT re-pinned: rankedRelevance pins its per-doc frame internally,
    // so consumer replays only repeat the cheap bucket window — an A/B
    // showed a second checkpoint here costs more than it saves
    val ranked = rankedRelevance(s, d)
    val ideal = ScaleRank.withGlobalRank(ranked, -col("rel"),
      Seq(col("rel").desc, col("doc_id")), "irank", "__ni")
    val ks = broadcast(EvalCutoffs.toDF("k"))
    val gain =
      """CAST(SUM(CAST(CAST(rel AS DOUBLE)
        |  / (ln(CAST(%s + 1 AS DOUBLE)) / ln(2.0))
        |  AS DECIMAL(18,9))) AS DOUBLE)""".stripMargin
    val dcg = ks.join(ranked, col("rank") <= col("k"))
      .groupBy("k")
      .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_scored"),
        expr(gain.format("rank")).as("dcg"))
    val idcg = ks.join(ideal, col("irank") <= col("k"))
      .groupBy("k").agg(expr(gain.format("irank")).as("idcg"))
    dcg.join(idcg, Seq("k"))
      .withColumn("ndcg", col("dcg") / col("idcg"))
      .select("k", "n_scored", "dcg", "idcg", "ndcg")
      .orderBy("k")
  }

  /** Binary retrieval metrics of the BM25 ranking — precision@k,
    * recall@k at cutoffs 1/3/5/10/20, plus rank-wide average
    * precision (AP: mean of P@rank at each relevant hit) and MRR —
    * relevant = graded rel >= RelevanceBar. All metrics are rational
    * arithmetic over integer ranks/counts: the P@i AP terms are
    * DECIMAL(18,9)-pinned before the sum, every other exposed double
    * is a single IEEE division of exact integers. Scale shape: the
    * global rank AND the running relevant-count both ride the
    * two-level ScaleRank primitives (rank via rankedRelevance, the
    * cumulative count via withPrefixSum — no unpartitioned window in
    * the plan), 5-row broadcast cutoff join, 1-row broadcast of the
    * AP/MRR/total aggregates. */
  private def qRetrievalMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flagged = rankedRelevance(s, d)
      .withColumn("is_rel", when(col("rel") >= RelevanceBar, 1L).otherwise(0L))
      .localCheckpoint() // consumed by the prefix sum's model passes + plan
    val cum = ScaleRank.withPrefixSum(flagged, col("rank"), Seq(col("rank")),
        col("is_rel"), "__pref")
      .withColumn("cum_rel", (col("__pref") + col("is_rel")).cast("long"))
      .drop("__pref")
    val tot = cum.agg(sum(col("is_rel")).cast("long").as("n_rel"),
      expr("""CAST(SUM(CASE WHEN is_rel = 1 THEN
                CAST(CAST(cum_rel AS DOUBLE) / CAST(rank AS DOUBLE) AS DECIMAL(18,9))
              END) AS DOUBLE)""").as("ap_sum"),
      min(when(col("is_rel") === 1L, col("rank"))).as("first_rel"))
    val ks = broadcast(EvalCutoffs.toDF("k"))
    ks.join(cum, col("rank") <= col("k"))
      .groupBy("k")
      .agg(max(when(col("rank") === col("k"), col("cum_rel"))).as("rel_at_k"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("rel_at_k"),
        (col("rel_at_k").cast("double") / col("k").cast("double")).as("p_at_k"),
        (col("rel_at_k").cast("double") / col("n_rel").cast("double")).as("r_at_k"),
        (col("ap_sum") / col("n_rel").cast("double")).as("avg_prec"),
        (lit(1.0) / col("first_rel").cast("double")).as("mrr"),
        col("n_rel"))
      .orderBy("k")
  }

  /** Deterministic multi-query probe set for the SHARDED retrieval
    * eval — four stand-in "user queries" with disjoint term sets
    * spanning distinct document frequencies (dup is rare: ~25 docs at
    * sf0.01). Disjointness keeps per-term df unambiguous; the scorer
    * uses countDistinct anyway so overlap would stay correct. */
  private val MultiProbes: Seq[(String, Seq[String])] = Seq(
    "p1" -> Seq("spark", "vector", "hash"),
    "p2" -> Seq("stream", "window", "join"),
    "p3" -> Seq("sort", "merge", "dup"),
    "p4" -> Seq("filter", "scan"))

  /** NDCG@k per PROBE QUERY — the production shape of the q_ndcg
    * evaluation: a probe SET scored in one pass and ranked with
    * `Window.partitionBy(q_id)`, so every rank window in the plan is
    * PARTITIONED (the single-query family's "production shards by
    * query id" comment, demonstrated in-plan; PlanAuditSpec pins zero
    * unpartitioned WindowExec here). Scale shape: ONE corpus token
    * scan serves all probes (broadcast join against the |probes|-row
    * term table — the asymmetric eval-broadcast device from the
    * decontamination family), per-(q,doc) frames carry only matched
    * docs, and ranking parallelizes across query shards exactly as a
    * 100 TB eval over thousands of probes would. Determinism: the
    * same DECIMAL(18,9) per-term pins as q_bm25/q_ndcg. */
  private def qEvalMultiprobe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probes = broadcast(
      MultiProbes.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("q_id", "term"))
    val docs = Tables.documents(s, d).withColumn("dl", size(tokens()).cast("long"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("doc_id"), explode(tokens()).as("term"))
      .join(probes, Seq("term"))
      .groupBy(col("q_id"), col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf.join(broadcast(dft), Seq("term"))
      .join(docs.select("doc_id", "dl"), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("sterm", expr(
        """CAST(
             ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
           AS DECIMAL(18,9))"""))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(expr("CAST(SUM(sterm) AS DOUBLE)").as("score"),
        sum(col("tf")).as("rel"))
    val ranked = scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .withColumn("irank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("rel").desc, col("doc_id"))).cast("long"))
    val ks = broadcast(EvalCutoffs.toDF("k"))
    val gain =
      """CAST(SUM(CAST(CAST(rel AS DOUBLE)
        |  / (ln(CAST(%s + 1 AS DOUBLE)) / ln(2.0))
        |  AS DECIMAL(18,9))) AS DOUBLE)""".stripMargin
    val dcg = ks.join(ranked, col("rank") <= col("k"))
      .groupBy("q_id", "k")
      .agg(sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_scored"),
        expr(gain.format("rank")).as("dcg"))
    val idcg = ks.join(ranked, col("irank") <= col("k"))
      .groupBy("q_id", "k").agg(expr(gain.format("irank")).as("idcg"))
    dcg.join(idcg, Seq("q_id", "k"))
      .withColumn("ndcg", col("dcg") / col("idcg"))
      .select("q_id", "k", "n_scored", "dcg", "idcg", "ndcg")
      .orderBy("q_id", "k")
  }

  /** Winnowing window size (consecutive k-grams per window) — w=5
    * with 4-token grams guarantees any shared run of >= w+k-1 = 8
    * tokens between two docs shares a fingerprint (Schleimer et al.'s
    * winnowing theorem), at expected density 2/(w+1) ~ 1/3. */
  private val WinnowW = 5

  /** Fingerprint df-cap for q_winnow_pairs: fingerprints selected by
    * more than this many docs (boilerplate at corpus scale) are
    * dropped before the pair join — the same hot-key guard as the
    * shingle ShingleDfCap; inert at sf0.01 (max df 6) but the reason
    * the pair join stays bounded at 100 TB. */
  private val WinnowDfCap = 16L

  /** Per-doc winnowing fingerprints, computed entirely as narrow
    * per-row array expressions: gram hashes = 15-hex-char md5 prefix
    * of each 4-token gram (fixed-width lowercase hex, so string MIN
    * is numeric MIN in both engines — the md5-family device); the
    * selected set = distinct minima of each w-wide window. ZERO
    * shuffle — fingerprint extraction is embarrassingly parallel. */
  private[graft] def winnowFrame(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens())
      .withColumn("m", size(col("toks")).cast("long"))
      .withColumn("hs",
        when(col("m") < 4L, expr("CAST(array() AS ARRAY<STRING>)"))
          .otherwise(expr(
            """transform(sequence(1, CAST(m - 3 AS INT)),
               i -> substring(md5(concat_ws(' ', slice(toks, i, 4))), 1, 15))""")))
      // `hs` is bound as the HOF ARGUMENT (evaluated once per row) and
      // the window lambda references the bound variable `hsv`, NOT the
      // attribute: CollapseProject inlines a once-referenced alias
      // into the lambda body, where it would re-evaluate PER WINDOW —
      // measured 9× on q_winnow (O(m²) md5 calls per doc, 5.2 s →
      // 0.6 s at sf0.01). transform(array(x), v -> body)[1] is the
      // Spark-SQL "let".
      .withColumn("fps",
        when(col("m") < lit(3L + WinnowW), expr("CAST(array() AS ARRAY<STRING>)"))
          .otherwise(expr(
            s"""element_at(transform(array(hs), hsv ->
                  array_distinct(transform(sequence(1, CAST(m - ${2 + WinnowW} AS INT)),
                    p -> array_min(slice(hsv, p, $WinnowW))))), 1)""")))
      .select(col("doc_id"),
        greatest(col("m") - 3L, lit(0L)).as("n_grams"),
        greatest(col("m") - lit(2L + WinnowW), lit(0L)).as("n_windows"),
        size(col("fps")).cast("long").as("n_fps"),
        col("fps"))

  /** Per-doc winnowing fingerprint report — gram/window/fingerprint
    * counts, selection density (~2/(w+1) by the winnowing theorem;
    * DECIMAL-pinned), and the minimum fingerprint as a spot value so
    * the hash gate pins the actual selected hashes, not just counts. */
  private def qWinnow(s: SparkSession, d: String): DataFrame =
    winnowFrame(Tables.documents(s, d))
      .select(col("doc_id"), col("n_grams"), col("n_windows"), col("n_fps"),
        when(col("n_windows") === 0L, lit(0.0)).otherwise(
          expr("""CAST(CAST(CAST(n_fps AS DOUBLE) / CAST(n_windows AS DOUBLE)
                  AS DECIMAL(18,9)) AS DOUBLE)""")).as("density"),
        coalesce(array_min(col("fps")), lit("")).as("min_fp"))
      .orderBy("doc_id")

  /** Winnowing-fingerprint near-dup pairs over the doubled corpus —
    * the MOSS move: two docs sharing >= 2 selected fingerprints have
    * (with w=5, k=4) shared 8-token runs; containment = shared /
    * min(|fps|). Scale shape: extraction is shuffle-free (above), the
    * candidate join is keyed by fingerprint with the df-cap bounding
    * any hot fingerprint's fan-out — the exact posture of the shingle
    * and LSH dedup paths, never all-pairs. */
  private def qWinnowPairs(s: SparkSession, d: String): DataFrame = {
    // checkpoint: the fingerprint stream feeds the df agg AND both
    // sides of the pair join — without the pin the O(tokens) md5
    // extraction re-runs per consumer (same device as qKcore's edge
    // pin; priced inside this query's own clock, never memoized)
    val sel = winnowFrame(doubled(s, d))
      .select(col("doc_id"), col("n_fps"), explode(col("fps")).as("fp"))
      .localCheckpoint()
    val fpd = sel.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= WinnowDfCap)
    val cap = sel.join(fpd.select("fp"), Seq("fp"))
    val a = cap.select(col("fp"), col("doc_id").as("a_id"), col("n_fps").as("a_fps"))
    val b = cap.select(col("fp"), col("doc_id").as("b_id"), col("n_fps").as("b_fps"))
    a.join(b, Seq("fp")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_fps", "b_fps")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2L)
      .withColumn("containment",
        col("n_shared").cast("double") / least(col("a_fps"), col("b_fps")).cast("double"))
      .select("a_id", "b_id", "a_fps", "b_fps", "n_shared", "containment")
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (qBm25 _),
    "q_ndcg" -> (qNdcg _),
    "q_eval_multiprobe" -> (qEvalMultiprobe _),
    "q_retrieval_metrics" -> (qRetrievalMetrics _),
    "q_winnow" -> (qWinnow _),
    "q_winnow_pairs" -> (qWinnowPairs _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_line_dedup" -> (qLineDedup _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_quality_score" -> (qQualityScore _),
    "q_quality_tiers" -> (qQualityTiers _),
    "q_training_manifest" -> (qTrainingManifest _),
    "q_sim_histogram" -> (qSimHistogram _),
    "q_split_groupsafe" -> (qSplitGroupsafe _),
    "q_domain_cap" -> (qDomainCap _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_auc" -> (qAuc _),
    "q_auc_by_source" -> (qAucBySource _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_pr_curve" -> (qPrCurve _),
    "q_calibration" -> (qCalibration _),
    "q_ece" -> (qEce _),
    "q_confusion" -> (qConfusion _),
    "q_brier" -> (qBrier _),
    "q_source_terms" -> (qSourceTerms _),
    "q_zipf" -> (qZipf _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_url_canonicalize" -> (qUrlCanonicalize _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_novelty_curve" -> (qNoveltyCurve _),
    "q_keeper_quality" -> (qKeeperQuality _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_bloom_novel" -> (qBloomNovel _),
    "q_collocations" -> (qCollocations _),
    "q_lm_score" -> (qLmScore _),
    "q_kneser_ney" -> (qKneserNey _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_chunk" -> (qChunk _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_frequent_items" -> (qFrequentItems _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_cluster_labels" -> (qClusterLabels _),
    "q_corpus_clean" -> (qCorpusClean _),
    "q_tfidf" -> (qTfidf _),
    "q_text_normalize" -> (qTextNormalize _),
    "q_text_stats" -> (qTextStats _),
    "q_text_quality" -> (qTextQuality _),
    "q_token_count" -> (qTokenCount _),
    "q_lang_id" -> (qLangId _),
    "q_kappa" -> (qKappa _),
    "q_readability" -> (qReadability _),
    "q_feature_hash" -> (qFeatureHash _),
    "q_bm25_wand" -> (qBm25Wand _),
    "q_rake" -> (qRake _),
    "q_percolate" -> (qPercolate _),
    "q_fingerprint" -> (qFingerprint _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_stats" -> (qDedupStats _),
    "q_blocklist" -> (qBlocklist _),
    "q_dedup_ngram" -> (qDedupNgram _),
    "q_dedup_prefix" -> (qDedupPrefix _),
    "q_containment" -> (qContainment _),
    "q_dedup_edit" -> (qDedupEdit _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_minhash_recall" -> (qMinhashRecall _),
    "q_decontaminate_fuzzy" -> (qDecontaminateFuzzy _),
    "q_minhash_estimate" -> (qMinhashEstimate _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_simhash_clusters" -> (qSimhashClusters _),
    "q_simhash_estimate" -> (qSimhashEstimate _),
    "q_simhash_closure" -> (qSimhashClosure _),
    "q_simhash_sizes" -> (qSimhashSizes _),
    "q_graph_degrees" -> (qGraphDegrees _),
    "q_pagerank" -> (qPagerank _),
    "q_repetition" -> (qRepetition _),
    "q_doc_entropy" -> (qDocEntropy _),
    "q_corpus_mix" -> (qCorpusMix _)
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_incremental" ->
      s"""WITH $doubledSql,
         |all_docs AS (
         |  SELECT doc_id, md5(text) AS dig,
         |         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4' AS is_arrival
         |  FROM doubled
         |), corpus AS (
         |  SELECT dig, MIN(doc_id) AS corpus_keeper
         |  FROM all_docs WHERE NOT is_arrival GROUP BY dig
         |), arrivals AS (
         |  SELECT doc_id, dig,
         |         ROW_NUMBER() OVER (PARTITION BY dig ORDER BY doc_id) AS batch_rn,
         |         MIN(doc_id) OVER (PARTITION BY dig) AS batch_keeper
         |  FROM all_docs WHERE is_arrival
         |)
         |SELECT a.doc_id, a.dig,
         |       CASE WHEN c.corpus_keeper IS NOT NULL THEN 'dup_of_existing'
         |            WHEN a.batch_rn > 1 THEN 'dup_in_batch'
         |            ELSE 'novel' END AS status,
         |       COALESCE(c.corpus_keeper, a.batch_keeper) AS keeper_id
         |FROM arrivals a LEFT JOIN corpus c USING (dig)
         |ORDER BY doc_id""".stripMargin,
    // the Bloom sketch prunes, never decides — so the oracle is the
    // plain exact NOT IN the sketch accelerates
    "q_bloom_novel" ->
      """WITH arrivals AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' graft-novel-suffix'
        |              ELSE text END AS text
        |  FROM documents
        |)
        |SELECT doc_id, md5(text) AS text_md5
        |FROM arrivals
        |WHERE md5(text) NOT IN (SELECT DISTINCT md5(text) FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
         |), c AS (
         |  SELECT doc_id, lang,
         |         unnest(list_zip(
         |           list_transform(
         |             range(0, CAST(floor((len(toks) - 1) / $ChunkStride.0) AS BIGINT) + 1),
         |             i -> array_to_string(toks[i*$ChunkStride+1 : i*$ChunkStride+$ChunkLen], ' ')),
         |           range(0, CAST(floor((len(toks) - 1) / $ChunkStride.0) AS BIGINT) + 1))) AS z
         |  FROM t
         |)
         |SELECT doc_id, lang, CAST(z[2] AS BIGINT) AS chunk_idx,
         |       CAST(len(string_split(CAST(z[1] AS VARCHAR), ' ')) AS BIGINT) AS chunk_tokens,
         |       md5(CAST(z[1] AS VARCHAR)) AS chunk_md5
         |FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, lang, n_tokens,
         |         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS cum_end
         |  FROM t
         |), b AS (
         |  SELECT doc_id, lang, n_tokens, cum_end,
         |         (cum_end - n_tokens) // $SeqLen AS seq_id
         |  FROM r
         |)
         |SELECT lang, seq_id, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
         |       greatest(MAX(cum_end) - (seq_id + 1) * $SeqLen, 0) AS spill_tokens
         |FROM b
         |GROUP BY lang, seq_id
         |ORDER BY lang, seq_id""".stripMargin,
    "q_frequent_items" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), n AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
        |), top AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
        |  FROM tok GROUP BY token
        |  ORDER BY exact_count DESC, token LIMIT 20
        |)
        |SELECT token, exact_count,
        |       exact_count * 65 > n AS above_guarantee,
        |       TRUE AS found_ok,
        |       TRUE AS bound_ok
        |FROM top, n
        |ORDER BY exact_count DESC, token""".stripMargin,
    "q_heavy_hitters" ->
      """WITH tf AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
        |), f AS (
        |  SELECT lang, token, COUNT(*) AS freq FROM tf GROUP BY lang, token
        |)
        |SELECT lang, token, freq, rank FROM (
        |  SELECT lang, token, freq,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY lang ORDER BY freq DESC, token) AS BIGINT) AS rank
        |  FROM f)
        |WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,
    "q_corpus_mix" ->
      s"""WITH $doubledSql,
         |norm AS (
         |  SELECT doc_id, lang,
         |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text_norm
         |  FROM doubled
         |), meta AS (
         |  SELECT doc_id, lang, md5(text_norm) AS norm_md5,
         |         len(string_split(text_norm, ' ')) AS n_tokens
         |  FROM norm
         |), keepers AS (
         |  SELECT doc_id, lang FROM (
         |    SELECT doc_id, lang, n_tokens,
         |           ROW_NUMBER() OVER (PARTITION BY norm_md5 ORDER BY doc_id) AS rn
         |    FROM meta)
         |  WHERE rn = 1 AND n_tokens >= 30
         |), w AS (
         |  SELECT lang, COUNT(*) AS n_gated FROM keepers GROUP BY lang
         |), w2 AS (
         |  SELECT lang, n_gated, CAST(SUM(n_gated) OVER () AS BIGINT) AS n_total FROM w
         |), w3 AS (
         |  SELECT lang, n_gated,
         |         sqrt(CAST(n_gated AS DOUBLE) / CAST(n_total AS DOUBLE)) AS w_raw
         |  FROM w2
         |), ex AS (
         |  SELECT lang, n_gated,
         |         w_raw / CAST(SUM(CAST(w_raw AS DECIMAL(18,12))) OVER () AS DOUBLE)
         |           * 200.0 AS exact_t
         |  FROM w3
         |), fl AS (
         |  SELECT lang, n_gated, exact_t,
         |         CAST(FLOOR(exact_t) AS BIGINT) AS floor_t,
         |         200 - CAST(SUM(CAST(FLOOR(exact_t) AS BIGINT)) OVER () AS BIGINT) AS residue,
         |         ROW_NUMBER() OVER (ORDER BY exact_t - FLOOR(exact_t) DESC, lang) AS rem_rank
         |  FROM ex
         |), budgets AS (
         |  SELECT lang, n_gated,
         |         CAST(floor_t + CASE WHEN rem_rank <= residue THEN 1 ELSE 0 END AS BIGINT) AS target
         |  FROM fl
         |), ranked AS (
         |  SELECT lang, doc_id,
         |         CAST(ROW_NUMBER() OVER (
         |           PARTITION BY lang
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
         |  FROM keepers)
         |SELECT r.lang, r.rk, r.doc_id, b.n_gated, b.target
         |FROM ranked r JOIN budgets b ON r.lang = b.lang
         |WHERE r.rk <= b.target
         |ORDER BY r.lang, r.rk""".stripMargin,
    "q_repetition" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         list_transform(
        |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')) AS tris
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(tris) AS BIGINT) AS n_tri,
        |       CAST(len(list_distinct(tris)) AS BIGINT) AS n_tri_uniq,
        |       1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / CAST(len(tris) AS DOUBLE) AS rep_ratio,
        |       (1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / CAST(len(tris) AS DOUBLE)) > 0.2 AS is_repetitive
        |FROM sh
        |ORDER BY doc_id""".stripMargin,
    "q_doc_entropy" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok
        |), wn AS (
        |  SELECT doc_id, c,
        |         CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |  FROM tf
        |), terms AS (
        |  SELECT doc_id, n,
        |         CAST((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |           * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)) AS term
        |  FROM wn)
        |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
        |       COUNT(*) AS n_uniq_tokens,
        |       0.0 - CAST(SUM(term) AS DOUBLE) AS entropy_nats
        |FROM terms
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // distributed label propagation must assign every doc the min id
    // of its digest block — expressible as a window min, no recursion
    "q_cluster_labels" ->
      s"""WITH $doubledSql
         |SELECT doc_id,
         |       MIN(doc_id) OVER (PARTITION BY md5(text)) AS label,
         |       doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_keeper
         |FROM doubled
         |ORDER BY doc_id""".stripMargin,
    // label propagation over same-digest cliques must converge to
    // exactly the digest groups — expressible without recursion
    "q_dedup_clusters" ->
      s"""WITH $doubledSql
         |SELECT MIN(doc_id) AS cluster_keeper, COUNT(*) AS cluster_size,
         |       MAX(doc_id) AS max_member
         |FROM doubled
         |GROUP BY md5(text)
         |ORDER BY cluster_keeper""".stripMargin,
    "q_corpus_clean" ->
      s"""WITH $doubledSql,
         |norm AS (
         |  SELECT doc_id, lang,
         |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text_norm
         |  FROM doubled
         |), k AS (
         |  SELECT doc_id, lang, md5(text_norm) AS norm_md5,
         |         CAST(len(string_split(text_norm, ' ')) AS BIGINT) AS n_tokens,
         |         ROW_NUMBER() OVER (PARTITION BY md5(text_norm) ORDER BY doc_id) AS rn,
         |         ${Sampling.splitSql} AS split
         |  FROM norm
         |)
         |SELECT doc_id, lang, norm_md5, n_tokens,
         |       rn = 1 AS keep_dedup,
         |       n_tokens >= 30 AS is_quality,
         |       split,
         |       (rn = 1 AND n_tokens >= 30 AND split = 'train') AS selected
         |FROM k
         |ORDER BY doc_id""".stripMargin,
    "q_text_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text_norm,
        |       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) != text AS changed,
        |       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5,
        |       CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, lang, source,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars_calc,
        |       n_chars,
        |       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id, lang,
        |       len(string_split(text, ' ')) AS n_tokens,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop,
        |       len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
        |       (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |         * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality_score,
        |       len(string_split(text, ' ')) < 30 AS is_short
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT lang,
        |       COUNT(DISTINCT doc_id) AS n_docs,
        |       COUNT(*) AS n_tokens,
        |       COUNT(DISTINCT token) AS n_uniq_tokens
        |FROM (SELECT lang, doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS token
        |      FROM documents)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q_percolate" -> {
      val vals = PercolateQueries
        .map { case (id, q2) => s"($id, '$q2')" }.mkString(", ")
      s"""WITH reg(qid, query) AS (VALUES $vals),
         |regt AS (
         |  SELECT qid, CAST(len(string_split(query, ' ')) AS BIGINT) AS n_terms,
         |         unnest(string_split(query, ' ')) AS tok
         |  FROM reg
         |), dt AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |), hit AS (
         |  SELECT qid, n_terms, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
         |  FROM dt JOIN regt USING (tok)
         |  GROUP BY qid, n_terms, doc_id
         |), m AS (
         |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |  FROM hit WHERE n_hit = n_terms GROUP BY qid
         |)
         |SELECT CAST(reg.qid AS BIGINT) AS qid, reg.query AS query,
         |       CAST(len(string_split(reg.query, ' ')) AS BIGINT) AS n_terms,
         |       COALESCE(m.n_docs, 0) AS n_docs, m.first_doc, m.last_doc
         |FROM reg LEFT JOIN m ON m.qid = reg.qid
         |ORDER BY reg.qid""".stripMargin
    },
    "q_rake" ->
      """WITH pos AS (
        |  SELECT doc_id, p.i AS i, p.tok AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |       unnest(list_transform(range(1, len(toks) + 1),
        |              i -> struct_pack(i := i, tok := toks[i]))) AS u(p)
        |), flagged AS (
        |  SELECT doc_id, i, tok, tok IN ('the', 'a') AS is_stop,
        |         CAST(SUM(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END)
        |              OVER (PARTITION BY doc_id ORDER BY i
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS pid
        |  FROM pos
        |), phr AS (
        |  SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len,
        |         string_agg(tok, ' ' ORDER BY i) AS phrase
        |  FROM flagged WHERE NOT is_stop
        |  GROUP BY doc_id, pid
        |  HAVING COUNT(*) <= 4
        |), wocc AS (
        |  SELECT doc_id, pid, phrase, len, unnest(string_split(phrase, ' ')) AS w
        |  FROM phr
        |), words AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(len) AS BIGINT) AS deg
        |  FROM wocc GROUP BY w
        |), wr AS (
        |  SELECT w, CAST(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS DECIMAL(18,9)) AS r
        |  FROM words
        |), pscore AS (
        |  SELECT doc_id, pid, phrase, len, CAST(SUM(r) AS DOUBLE) AS score
        |  FROM wocc JOIN wr USING (w)
        |  GROUP BY doc_id, pid, phrase, len
        |)
        |SELECT phrase, MIN(len) AS n_words, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |       MIN(score) AS score
        |FROM pscore GROUP BY phrase
        |ORDER BY score DESC, phrase
        |LIMIT 30""".stripMargin,
    "q_feature_hash" ->
      s"""${XxOracleSql.prelude}WITH tf AS (
         |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY doc_id, tok
         |), tokset AS (SELECT DISTINCT tok FROM tf),
         |  ${XxOracleSql.stages("tokset", "tok", "tok", "h64", 32, "g")},
         |vocab AS (
         |  SELECT tok, h64 & 255 AS bucket,
         |         CASE WHEN (h64 & 256) = 0 THEN CAST(1 AS BIGINT)
         |              ELSE CAST(-1 AS BIGINT) END AS sign
         |  FROM gfin
         |)
         |SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |       CAST(SUM(tf) AS BIGINT) AS n_tok,
         |       CAST(SUM(sign * tf) AS BIGINT) AS feat
         |FROM tf JOIN vocab USING (tok)
         |GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin,
    "q_readability" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, lang, n_tokens,
        |         (n_tokens + 11) // 12 AS n_sentences, n_syllables,
        |         CAST(n_tokens AS DOUBLE) / CAST((n_tokens + 11) // 12 AS DOUBLE) AS wps,
        |         CAST(n_syllables AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS spw
        |  FROM base
        |), f AS (
        |  SELECT doc_id, lang, n_tokens, n_sentences, n_syllables, wps, spw,
        |         206.835 - 1.015 * wps - 84.6 * spw AS flesch
        |  FROM m
        |)
        |SELECT doc_id, lang, n_tokens, n_sentences, n_syllables, wps, spw, flesch,
        |       CASE WHEN flesch >= 90.0 THEN 'very_easy'
        |            WHEN flesch >= 70.0 THEN 'easy'
        |            WHEN flesch >= 50.0 THEN 'medium'
        |            WHEN flesch >= 30.0 THEN 'hard'
        |            ELSE 'very_hard' END AS band
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    "q_kappa" ->
      """WITH pred AS (
        |  SELECT lang,
        |         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS score_en,
        |         len(list_filter(string_split(text, ' '), x -> x IN ('table', 'line'))) AS score_fr,
        |         len(list_filter(string_split(text, ' '), x -> x IN ('data', 'row'))) AS score_es,
        |         len(list_filter(string_split(text, ' '), x -> x IN ('fast', 'slow'))) AS score_de,
        |         len(list_filter(string_split(text, ' '), x -> x IN ('spark', 'big'))) AS score_zh,
        |         CASE
        |           WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de AND score_en >= score_zh THEN 'en'
        |           WHEN score_fr >= score_en AND score_fr >= score_es AND score_fr >= score_de AND score_fr >= score_zh THEN 'fr'
        |           WHEN score_es >= score_en AND score_es >= score_fr AND score_es >= score_de AND score_es >= score_zh THEN 'es'
        |           WHEN score_de >= score_en AND score_de >= score_fr AND score_de >= score_es AND score_de >= score_zh THEN 'de'
        |           ELSE 'zh' END AS predicted
        |  FROM documents
        |), cm AS (
        |  SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM pred GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN lang = predicted THEN c ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM cm
        |), r AS (
        |  SELECT lang AS lab, CAST(SUM(c) AS BIGINT) AS row_n FROM cm GROUP BY 1
        |), co AS (
        |  SELECT predicted AS lab, CAST(SUM(c) AS BIGINT) AS col_n FROM cm GROUP BY 1
        |), rc AS (
        |  SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0)) AS BIGINT) AS sum_rc
        |  FROM r FULL JOIN co USING (lab)
        |)
        |SELECT n, n_agree, sum_rc,
        |       CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |       CAST(sum_rc AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
        |       (CAST(n AS DOUBLE) * CAST(n_agree AS DOUBLE) - CAST(sum_rc AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(sum_rc AS DOUBLE)) AS kappa
        |FROM tot, rc""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, lang,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS score_en,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('table', 'line'))) AS score_fr,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('data', 'row'))) AS score_es,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('fast', 'slow'))) AS score_de,
        |       len(list_filter(string_split(text, ' '), x -> x IN ('spark', 'big'))) AS score_zh,
        |       CASE
        |         WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de AND score_en >= score_zh THEN 'en'
        |         WHEN score_fr >= score_en AND score_fr >= score_es AND score_fr >= score_de AND score_fr >= score_zh THEN 'fr'
        |         WHEN score_es >= score_en AND score_es >= score_fr AND score_es >= score_de AND score_es >= score_zh THEN 'es'
        |         WHEN score_de >= score_en AND score_de >= score_fr AND score_de >= score_es AND score_de >= score_zh THEN 'de'
        |         ELSE 'zh' END AS predicted,
        |       predicted = lang AS is_match
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5, sha256(text) AS fp_sha256,
        |       substring(md5(text), 1, 8) AS fp_bucket
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      s"""WITH $doubledSql
         |SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id,
         |       COUNT(*) AS n_copies, MIN(lang) AS lang
         |FROM doubled
         |GROUP BY md5(text)
         |ORDER BY text_md5""".stripMargin,
    "q_dedup_stats" ->
      s"""WITH $doubledSql,
         |g AS (
         |  SELECT source, md5(text) AS text_md5, COUNT(*) AS n_copies
         |  FROM doubled GROUP BY source, md5(text)
         |)
         |SELECT source,
         |       CAST(SUM(n_copies) AS BIGINT) AS n_docs,
         |       COUNT(*) AS n_texts,
         |       CAST(MAX(n_copies) AS BIGINT) AS max_clone,
         |       CAST(SUM(n_copies - 1) AS BIGINT) AS n_dup_docs,
         |       CAST(SUM(n_copies - 1) AS DOUBLE) / CAST(SUM(n_copies) AS DOUBLE) AS dup_ratio
         |FROM g GROUP BY source
         |ORDER BY source""".stripMargin,
    "q_blocklist" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), e AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |         unnest(toks) AS tok
         |  FROM t
         |)
         |SELECT doc_id, n_tokens,
         |       COUNT(*) AS n_hits,
         |       COUNT(DISTINCT tok) AS n_terms_hit,
         |       array_to_string(list_sort(list(DISTINCT tok)), ',') AS terms,
         |       CAST(COUNT(*) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS hit_rate,
         |       COUNT(*) * 25 >= n_tokens * 2 AS blocked
         |FROM e
         |WHERE tok IN (${Blocklist.map(t => s"'$t'").mkString(", ")})
         |GROUP BY doc_id, n_tokens
         |ORDER BY doc_id""".stripMargin,
    "q_split_groupsafe" ->
      s"""WITH $doubledSql,
         |k AS (
         |  SELECT doc_id,
         |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
         |  FROM doubled
         |), f AS (
         |  SELECT doc_id, norm_md5,
         |         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
         |              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
         |              ELSE 'test' END AS split_naive,
         |         CASE WHEN substring(norm_md5, 1, 1) <= 'b' THEN 'train'
         |              WHEN substring(norm_md5, 1, 1) <= 'd' THEN 'val'
         |              ELSE 'test' END AS split_safe
         |  FROM k
         |)
         |SELECT doc_id, norm_md5,
         |       CAST(COUNT(*) OVER (PARTITION BY norm_md5) AS BIGINT) AS cluster_size,
         |       split_naive, split_safe,
         |       MIN(split_naive) OVER (PARTITION BY norm_md5)
         |         <> MAX(split_naive) OVER (PARTITION BY norm_md5) AS would_leak
         |FROM f
         |ORDER BY doc_id""".stripMargin,
    "q_sim_histogram" ->
      s"""WITH $doubledSql,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh
         |), dfd AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex
         |), kept AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
         |  FROM dfd WHERE df <= $ShingleDfCap
         |), cand AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |         CAST(COUNT(*) AS DOUBLE)
         |           / CAST(a.n_sh + b.n_sh - COUNT(*) AS DOUBLE) AS jaccard
         |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |), binned AS (
         |  SELECT least(CAST(floor(jaccard * 10) AS BIGINT), 9) AS bin,
         |         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         MIN(jaccard) AS j_min, MAX(jaccard) AS j_max
         |  FROM cand GROUP BY 1
         |), tot AS (
         |  SELECT CAST(SUM(n_pairs) AS BIGINT) AS total FROM binned
         |)
         |SELECT bin, n_pairs, j_min, j_max,
         |       CAST(n_pairs AS DOUBLE) / CAST(total AS DOUBLE) AS share
         |FROM binned, tot
         |ORDER BY bin""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH $doubledSql,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh
         |), dfd AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex
         |), kept AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
         |  FROM dfd WHERE df <= $ShingleDfCap
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common,
         |       CAST(COUNT(*) AS DOUBLE)
         |         / CAST(a.n_sh + b.n_sh - COUNT(*) AS DOUBLE) AS jaccard
         |FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |HAVING CAST(COUNT(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - COUNT(*) AS DOUBLE) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_prefix" ->
      s"""WITH $doubledSql,
         |shl AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM shl
         |), dft AS (
         |  SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY s
         |), ord AS (
         |  SELECT e.doc_id, e.s,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY f.df, e.s)
         |              AS BIGINT) AS pos,
         |         CAST(COUNT(*) OVER (PARTITION BY e.doc_id) AS BIGINT) AS sz
         |  FROM ex e JOIN dft f USING (s)
         |), pref AS (
         |  SELECT doc_id, s, pos, sz FROM ord
         |  WHERE pos <= sz - CAST(ceil($PrefixJaccard * CAST(sz AS DOUBLE)) AS BIGINT) + 1
         |), cand AS (
         |  SELECT a_id, b_id FROM (
         |    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |           MIN(a.pos) AS am, MIN(b.pos) AS bm,
         |           MIN(a.sz) AS asz, MIN(b.sz) AS bsz
         |    FROM pref a JOIN pref b ON a.s = b.s AND a.doc_id < b.doc_id
         |    WHERE $PrefixJaccard * greatest(a.sz, b.sz) <= least(a.sz, b.sz)
         |    GROUP BY a.doc_id, b.doc_id)
         |  WHERE 1 + least(asz - am, bsz - bm)
         |        >= CAST(ceil($PrefixAlpha * CAST(asz + bsz AS DOUBLE)) AS BIGINT)
         |), com AS (
         |  SELECT c.a_id, c.b_id, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM cand c
         |  JOIN ex x ON x.doc_id = c.a_id
         |  JOIN ex y ON y.doc_id = c.b_id AND y.s = x.s
         |  GROUP BY c.a_id, c.b_id
         |), szs AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM ex GROUP BY doc_id
         |)
         |SELECT a_id, b_id, sa.sz AS a_sz, sb.sz AS b_sz, common,
         |       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
         |FROM com JOIN szs sa ON sa.doc_id = a_id JOIN szs sb ON sb.doc_id = b_id
         |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE)
         |        >= $PrefixJaccard
         |ORDER BY a_id, b_id""".stripMargin,
    // distributed pointer-doubling min-label CC vs a declarative
    // recursive-CTE fixpoint closure in a different engine, agreeing
    // row for row on per-doc labels — the strongest cross-check the
    // cluster stage can get
    "q_simhash_closure" ->
      s"""WITH RECURSIVE $md5ClosureSql
         |SELECT s.doc_id, l.cluster_keeper
         |FROM sigd s JOIN groups g USING (simhash) JOIN lbl l USING (keeper_id)
         |ORDER BY doc_id""".stripMargin,
    "q_keeper_quality" ->
      s"""WITH RECURSIVE $md5ClosureSql, ${qualityZSql("doubled")},
         |lab AS (
         |  SELECT s.doc_id, l.cluster_keeper, zz.z
         |  FROM sigd s JOIN groups g USING (simhash) JOIN lbl l USING (keeper_id)
         |  JOIN zz ON zz.doc_id = s.doc_id
         |), best AS (
         |  SELECT cluster_keeper, doc_id AS best_id FROM (
         |    SELECT cluster_keeper, doc_id,
         |           ROW_NUMBER() OVER (PARTITION BY cluster_keeper
         |                              ORDER BY z DESC, doc_id) AS rk
         |    FROM lab)
         |  WHERE rk = 1
         |)
         |SELECT lab.doc_id, lab.cluster_keeper, lab.z, best.best_id,
         |       lab.doc_id = best.best_id AS is_best
         |FROM lab JOIN best USING (cluster_keeper)
         |ORDER BY doc_id""".stripMargin,
    "q_pagerank" ->
      s"""WITH $md5SigSql, groups AS (
         |  SELECT simhash, MIN(doc_id) AS keeper_id FROM sigd GROUP BY simhash
         |), near AS (
         |  SELECT a.keeper_id AS src, b.keeper_id AS dst
         |  FROM groups a JOIN groups b
         |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |), deg AS (
         |  SELECT src AS keeper_id, COUNT(*) AS degree FROM near GROUP BY src
         |), nn AS (SELECT COUNT(*) AS n_k FROM groups),
         |r0 AS (
         |  SELECT g.keeper_id, 1.0 / CAST(nn.n_k AS DOUBLE) AS r
         |  FROM groups g CROSS JOIN nn
         |), c1 AS (
         |  SELECT n.dst AS keeper_id,
         |         SUM(CAST(r0.r / CAST(d.degree AS DOUBLE) AS DECIMAL(18,12))) AS sc
         |  FROM near n JOIN r0 ON n.src = r0.keeper_id JOIN deg d ON n.src = d.keeper_id
         |  GROUP BY n.dst
         |), r1 AS (
         |  SELECT g.keeper_id,
         |         0.15 / CAST(nn.n_k AS DOUBLE)
         |           + 0.85 * COALESCE(CAST(c1.sc AS DOUBLE), 0.0) AS r
         |  FROM groups g CROSS JOIN nn LEFT JOIN c1 USING (keeper_id)
         |), c2 AS (
         |  SELECT n.dst AS keeper_id,
         |         SUM(CAST(r1.r / CAST(d.degree AS DOUBLE) AS DECIMAL(18,12))) AS sc
         |  FROM near n JOIN r1 ON n.src = r1.keeper_id JOIN deg d ON n.src = d.keeper_id
         |  GROUP BY n.dst
         |), r2 AS (
         |  SELECT g.keeper_id,
         |         0.15 / CAST(nn.n_k AS DOUBLE)
         |           + 0.85 * COALESCE(CAST(c2.sc AS DOUBLE), 0.0) AS r
         |  FROM groups g CROSS JOIN nn LEFT JOIN c2 USING (keeper_id)
         |)
         |SELECT r2.keeper_id,
         |       CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
         |       CAST(CAST(r2.r AS DECIMAL(18,12)) AS DOUBLE) AS pagerank
         |FROM r2 LEFT JOIN deg USING (keeper_id)
         |ORDER BY keeper_id""".stripMargin,
    "q_graph_degrees" ->
      s"""WITH $md5SigSql, groups AS (
         |  SELECT simhash, MIN(doc_id) AS keeper_id FROM sigd GROUP BY simhash
         |), near AS (
         |  SELECT a.keeper_id AS src, b.keeper_id AS dst
         |  FROM groups a JOIN groups b
         |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |), deg AS (
         |  SELECT src AS keeper_id, COUNT(*) AS degree FROM near GROUP BY src
         |), hop AS (
         |  SELECT n1.src, n2.dst AS nb
         |  FROM near n1 JOIN near n2 ON n1.dst = n2.src
         |  WHERE n2.dst <> n1.src
         |  UNION
         |  SELECT src, dst AS nb FROM near
         |), two AS (
         |  SELECT src AS keeper_id, COUNT(*) AS n_within_2 FROM hop GROUP BY src
         |)
         |SELECT g.keeper_id,
         |       CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
         |       CAST(COALESCE(two.n_within_2, 0) AS BIGINT) AS n_within_2,
         |       COALESCE(deg.degree, 0) = 0 AS is_isolated
         |FROM groups g
         |LEFT JOIN deg USING (keeper_id)
         |LEFT JOIN two USING (keeper_id)
         |ORDER BY keeper_id""".stripMargin,
    "q_simhash_sizes" ->
      s"""WITH RECURSIVE $md5ClosureSql, labels AS (
         |  SELECT s.doc_id, l.cluster_keeper
         |  FROM sigd s JOIN groups g USING (simhash) JOIN lbl l USING (keeper_id)
         |)
         |SELECT cluster_keeper, COUNT(*) AS n_docs, MAX(doc_id) AS max_member,
         |       COUNT(*) > 1 AS is_multi
         |FROM labels
         |GROUP BY cluster_keeper
         |ORDER BY cluster_keeper""".stripMargin,
    "q_line_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), c AS (
         |  SELECT doc_id,
         |         unnest(list_zip(
         |           list_transform(
         |             range(0, CAST(floor((len(toks) - 1) / $SegLen.0) AS BIGINT) + 1),
         |             i -> array_to_string(toks[i*$SegLen+1 : i*$SegLen+$SegLen], ' ')),
         |           range(0, CAST(floor((len(toks) - 1) / $SegLen.0) AS BIGINT) + 1))) AS z
         |  FROM t
         |), segs AS (
         |  SELECT doc_id, CAST(z[2] AS BIGINT) AS seg_idx,
         |         CAST(z[1] AS VARCHAR) AS seg_text,
         |         md5(CAST(z[1] AS VARCHAR)) AS seg_key
         |  FROM c
         |), boiler AS (
         |  SELECT seg_key FROM (SELECT DISTINCT seg_key, doc_id FROM segs)
         |  GROUP BY seg_key HAVING COUNT(*) >= 2
         |), m AS (
         |  SELECT s.doc_id, s.seg_idx, s.seg_text,
         |         (b.seg_key IS NOT NULL) AS is_boiler
         |  FROM segs s LEFT JOIN boiler b USING (seg_key)
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         |       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       COALESCE(string_agg(CASE WHEN NOT is_boiler THEN seg_text END,
         |                           ' ' ORDER BY seg_idx), '') AS kept_text,
         |       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) > 0 AS is_modified
         |FROM m
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""WITH ${qualityZSql()}
         |SELECT doc_id, lang, n_tokens, uniq_ratio, stop_ratio, len_sat, z,
         |       0.5 + z / (2.0 * (1.0 + abs(z))) AS score,
         |       z >= 0.0 AS is_keep
         |FROM zz
         |ORDER BY doc_id""".stripMargin,
    "q_quality_tiers" ->
      s"""WITH ${qualityZSql()}
         |SELECT doc_id, lang, z,
         |       CAST(NTILE(3) OVER (PARTITION BY lang
         |                           ORDER BY z DESC, doc_id) AS BIGINT) AS tier
         |FROM zz
         |ORDER BY doc_id""".stripMargin,
    "q_bm25" ->
      s"""WITH $bm25Sql
         |SELECT doc_id, dl, n_matched, score,
         |       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |FROM bm
         |ORDER BY doc_id""".stripMargin,
    // DELIBERATELY the exhaustive top-k: Spark runs the WAND-pruned
    // plan, the oracle scores everything — a hash match IS the
    // losslessness proof for the pruning
    "q_bm25_wand" ->
      s"""WITH $bm25Sql
         |SELECT rank, doc_id, n_matched, score FROM (
         |  SELECT doc_id, n_matched, score,
         |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |  FROM sc)
         |WHERE rank <= 20
         |ORDER BY rank""".stripMargin,
    "q_ndcg" ->
      s"""WITH $bm25Sql,
         |relv AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS rel FROM tft GROUP BY doc_id),
         |ranked AS (
         |  SELECT b.doc_id, CAST(COALESCE(r.rel, 0) AS BIGINT) AS rel,
         |         CAST(ROW_NUMBER() OVER (ORDER BY b.score DESC, b.doc_id) AS BIGINT) AS rank
         |  FROM bm b LEFT JOIN relv r USING (doc_id)
         |), ideal AS (
         |  SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
         |  FROM ranked
         |), ks AS (SELECT CAST(unnest([1, 3, 5, 10, 20]) AS BIGINT) AS k),
         |dcg AS (
         |  SELECT k.k,
         |         CAST(SUM(CASE WHEN r.rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |         CAST(SUM(CAST(CAST(r.rel AS DOUBLE)
         |           / (ln(CAST(r.rank + 1 AS DOUBLE)) / ln(2.0))
         |           AS DECIMAL(18,9))) AS DOUBLE) AS dcg
         |  FROM ks k JOIN ranked r ON r.rank <= k.k GROUP BY k.k
         |), idcg AS (
         |  SELECT k.k,
         |         CAST(SUM(CAST(CAST(i.rel AS DOUBLE)
         |           / (ln(CAST(i.irank + 1 AS DOUBLE)) / ln(2.0))
         |           AS DECIMAL(18,9))) AS DOUBLE) AS idcg
         |  FROM ks k JOIN ideal i ON i.irank <= k.k GROUP BY k.k
         |)
         |SELECT d.k, d.n_scored, d.dcg, i.idcg, d.dcg / i.idcg AS ndcg
         |FROM dcg d JOIN idcg i USING (k)
         |ORDER BY k""".stripMargin,
    "q_eval_multiprobe" ->
      s"""WITH probes(q_id, term) AS (VALUES ${MultiProbes.flatMap {
        case (q, ts) => ts.map(t => s"('$q', '$t')")
      }.mkString(", ")}),
         |dd AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM documents
         |), st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dd
         |), tok AS (
         |  SELECT doc_id, unnest(toks) AS term FROM dd
         |), tf AS (
         |  SELECT p.q_id, t.doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok t JOIN probes p USING (term) GROUP BY 1, 2, 3
         |), dft AS (
         |  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM tf GROUP BY 1
         |), sc AS (
         |  SELECT f.q_id, f.doc_id,
         |         CAST(SUM(CAST(
         |           ln(1.0 + (CAST(s.n_docs - x.df AS DOUBLE) + 0.5) / (CAST(x.df AS DOUBLE) + 0.5))
         |           * ((CAST(f.tf AS DOUBLE) * 2.2)
         |              / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
         |                   / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
         |         AS DECIMAL(18,9))) AS DOUBLE) AS score,
         |         CAST(SUM(f.tf) AS BIGINT) AS rel
         |  FROM tf f JOIN dft x USING (term) JOIN dd d USING (doc_id) CROSS JOIN st s
         |  GROUP BY 1, 2
         |), rk AS (
         |  SELECT q_id, rel,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id) AS BIGINT) AS irank
         |  FROM sc
         |), ks AS (SELECT CAST(unnest([1, 3, 5, 10, 20]) AS BIGINT) AS k),
         |dcg AS (
         |  SELECT r.q_id, k.k,
         |         CAST(SUM(CASE WHEN r.rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |         CAST(SUM(CAST(CAST(r.rel AS DOUBLE)
         |           / (ln(CAST(r.rank + 1 AS DOUBLE)) / ln(2.0))
         |           AS DECIMAL(18,9))) AS DOUBLE) AS dcg
         |  FROM ks k JOIN rk r ON r.rank <= k.k GROUP BY 1, 2
         |), idcg AS (
         |  SELECT r.q_id, k.k,
         |         CAST(SUM(CAST(CAST(r.rel AS DOUBLE)
         |           / (ln(CAST(r.irank + 1 AS DOUBLE)) / ln(2.0))
         |           AS DECIMAL(18,9))) AS DOUBLE) AS idcg
         |  FROM ks k JOIN rk r ON r.irank <= k.k GROUP BY 1, 2
         |)
         |SELECT d.q_id, d.k, d.n_scored, d.dcg, i.idcg, d.dcg / i.idcg AS ndcg
         |FROM dcg d JOIN idcg i USING (q_id, k)
         |ORDER BY q_id, k""".stripMargin,
    "q_retrieval_metrics" ->
      s"""WITH $bm25Sql,
         |relv AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS rel FROM tft GROUP BY doc_id),
         |cum AS (
         |  SELECT rank, is_rel,
         |         CAST(SUM(is_rel) OVER (ORDER BY rank) AS BIGINT) AS cum_rel
         |  FROM (
         |    SELECT CASE WHEN COALESCE(r.rel, 0) >= 10 THEN 1 ELSE 0 END AS is_rel,
         |           CAST(ROW_NUMBER() OVER (ORDER BY b.score DESC, b.doc_id) AS BIGINT) AS rank
         |    FROM bm b LEFT JOIN relv r USING (doc_id))
         |), tot AS (
         |  SELECT CAST(SUM(is_rel) AS BIGINT) AS n_rel,
         |         CAST(SUM(CASE WHEN is_rel = 1 THEN
         |           CAST(CAST(cum_rel AS DOUBLE) / CAST(rank AS DOUBLE) AS DECIMAL(18,9))
         |         END) AS DOUBLE) AS ap_sum,
         |         MIN(CASE WHEN is_rel = 1 THEN rank END) AS first_rel
         |  FROM cum
         |), ks AS (SELECT CAST(unnest([1, 3, 5, 10, 20]) AS BIGINT) AS k)
         |SELECT k.k,
         |       CAST(MAX(CASE WHEN c.rank = k.k THEN c.cum_rel END) AS BIGINT) AS rel_at_k,
         |       CAST(MAX(CASE WHEN c.rank = k.k THEN c.cum_rel END) AS DOUBLE)
         |         / CAST(k.k AS DOUBLE) AS p_at_k,
         |       CAST(MAX(CASE WHEN c.rank = k.k THEN c.cum_rel END) AS DOUBLE)
         |         / CAST(t.n_rel AS DOUBLE) AS r_at_k,
         |       t.ap_sum / CAST(t.n_rel AS DOUBLE) AS avg_prec,
         |       1.0 / CAST(t.first_rel AS DOUBLE) AS mrr,
         |       t.n_rel
         |FROM ks k JOIN cum c ON c.rank <= k.k CROSS JOIN tot t
         |GROUP BY k.k, t.n_rel, t.ap_sum, t.first_rel
         |ORDER BY k""".stripMargin,
    "q_winnow" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS m
         |  FROM documents
         |), hsx AS (
         |  SELECT doc_id, m,
         |         greatest(m - 3, 0) AS n_grams,
         |         greatest(m - 7, 0) AS n_windows,
         |         CASE WHEN m < 4 THEN [] ELSE
         |           list_transform(range(1, CAST(m - 3 AS INTEGER) + 1), i ->
         |             substring(md5(array_to_string(toks[i:i+3], ' ')), 1, 15))
         |         END AS hs
         |  FROM tk
         |), fpx AS (
         |  SELECT doc_id, n_grams, n_windows,
         |         CASE WHEN m < 8 THEN [] ELSE
         |           list_distinct(list_transform(range(1, CAST(m - 7 AS INTEGER) + 1), p ->
         |             list_min(hs[p:p+4])))
         |         END AS fps
         |  FROM hsx
         |)
         |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |       CAST(n_windows AS BIGINT) AS n_windows,
         |       CAST(len(fps) AS BIGINT) AS n_fps,
         |       CASE WHEN n_windows = 0 THEN 0.0 ELSE
         |         CAST(CAST(CAST(len(fps) AS DOUBLE) / CAST(n_windows AS DOUBLE)
         |              AS DECIMAL(18,9)) AS DOUBLE)
         |       END AS density,
         |       COALESCE(list_min(fps), '') AS min_fp
         |FROM fpx
         |ORDER BY doc_id""".stripMargin,
    "q_winnow_pairs" ->
      s"""WITH $doubledSql,
         |tk AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS m
         |  FROM doubled
         |), hsx AS (
         |  SELECT doc_id, m,
         |         CASE WHEN m < 4 THEN [] ELSE
         |           list_transform(range(1, CAST(m - 3 AS INTEGER) + 1), i ->
         |             substring(md5(array_to_string(toks[i:i+3], ' ')), 1, 15))
         |         END AS hs
         |  FROM tk
         |), fpx AS (
         |  SELECT doc_id,
         |         CASE WHEN m < 8 THEN [] ELSE
         |           list_distinct(list_transform(range(1, CAST(m - 7 AS INTEGER) + 1), p ->
         |             list_min(hs[p:p+4])))
         |         END AS fps
         |  FROM hsx
         |), sel AS (
         |  SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps, unnest(fps) AS fp FROM fpx
         |), fpd AS (
         |  SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= 16
         |), cap AS (
         |  SELECT s.doc_id, s.n_fps, s.fp FROM sel s JOIN fpd USING (fp)
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       a.n_fps AS a_fps, b.n_fps AS b_fps,
         |       CAST(COUNT(*) AS BIGINT) AS n_shared,
         |       CAST(COUNT(*) AS DOUBLE) / CAST(least(a.n_fps, b.n_fps) AS DOUBLE) AS containment
         |FROM cap a JOIN cap b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n_fps, b.n_fps
         |HAVING COUNT(*) >= 2
         |ORDER BY a_id, b_id""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH $bm25Sql,
         |lr AS (
         |  SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_lex
         |  FROM bm
         |), vq AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings WHERE vec_id = 0
         |), vr AS (
         |  SELECT vec_id AS doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY
         |           list_dot_product(CAST(embedding AS DOUBLE[]), q_vec)
         |             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
         |                * sqrt(list_dot_product(q_vec, q_vec))) DESC,
         |           vec_id) AS BIGINT) AS rank_vec
         |  FROM embeddings CROSS JOIN vq
         |), fused AS (
         |  SELECT lr.doc_id, lr.rank_lex, vr.rank_vec,
         |         1.0 / (60.0 + CAST(lr.rank_lex AS DOUBLE))
         |           + 1.0 / (60.0 + CAST(vr.rank_vec AS DOUBLE)) AS rrf
         |  FROM lr JOIN vr USING (doc_id)
         |)
         |SELECT doc_id, rank_lex, rank_vec, rrf, rank FROM (
         |  SELECT doc_id, rank_lex, rank_vec, rrf,
         |         CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused)
         |WHERE rank <= 20
         |ORDER BY rank""".stripMargin,
    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tft AS (
        |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY term, doc_id
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
        |       array_to_string(
        |         (list(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
        |               ORDER BY doc_id))[1:10], ',') AS postings_head
        |FROM tft
        |GROUP BY term
        |ORDER BY term""".stripMargin,
    "q_training_manifest" ->
      s"""WITH ${qualityZSql()},
         |norm AS (
         |  SELECT doc_id,
         |         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
         |  FROM documents
         |), f1 AS (
         |  SELECT zz.doc_id, zz.source, zz.lang, zz.n_tokens, zz.z,
         |         (ROW_NUMBER() OVER (PARTITION BY n.norm_md5 ORDER BY zz.doc_id) = 1) AS keep_dedup,
         |         (zz.z >= 0.0) AS keep_quality,
         |         ${Sampling.splitSql.replace("doc_id", "zz.doc_id")} AS split
         |  FROM zz JOIN norm n ON n.doc_id = zz.doc_id
         |), rnk AS (
         |  SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY z DESC, doc_id) AS BIGINT) AS rk
         |  FROM f1 WHERE keep_dedup AND keep_quality
         |), j AS (
         |  SELECT f1.*, rnk.rk,
         |         COALESCE(rnk.rk <= $DomainCap, FALSE) AS keep_cap
         |  FROM f1 LEFT JOIN rnk ON rnk.doc_id = f1.doc_id
         |)
         |SELECT doc_id, source, lang, n_tokens, z, keep_dedup, keep_quality,
         |       rk, keep_cap, split,
         |       (keep_dedup AND keep_quality AND keep_cap AND split = 'train') AS selected,
         |       CASE WHEN keep_dedup AND keep_quality AND keep_cap AND split = 'train'
         |            THEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 16
         |       END AS shard
         |FROM j
         |ORDER BY doc_id""".stripMargin,
    "q_domain_cap" ->
      s"""WITH ${qualityZSql()}
         |SELECT doc_id, source, z,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY z DESC, doc_id)
         |            AS BIGINT) AS rk,
         |       CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_source,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY z DESC, doc_id)
         |            AS BIGINT) <= $DomainCap AS is_kept
         |FROM zz
         |ORDER BY doc_id""".stripMargin,
    "q_span_dedup" ->
      s"""WITH $spanCoverageSql
         |SELECT doc_id, n_tokens, n_spans, n_dup, covered, cover_frac,
         |       cover_frac >= 0.2 AS is_flagged
         |FROM sc
         |ORDER BY doc_id""".stripMargin,
    "q_calibration" ->
      s"""WITH $spanCoverageSql,
         |cal AS (
         |  SELECT least(CAST(floor(cover_frac * 10) AS BIGINT), 9) AS bin,
         |         CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS pos
         |  FROM sc
         |)
         |SELECT bin, CAST(bin AS DOUBLE) / 10 AS bin_lo,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(pos) AS BIGINT) AS n_pos,
         |       CAST(SUM(pos) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
         |FROM cal GROUP BY bin
         |ORDER BY bin""".stripMargin,
    "q_ece" ->
      s"""WITH $spanCoverageSql,
         |binned AS (
         |  SELECT least(CAST(floor(cover_frac * 10.0) AS BIGINT), 9) AS bin,
         |         CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS pos,
         |         cover_frac
         |  FROM sc
         |), bins AS (
         |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
         |         CAST(SUM(CAST(cover_frac AS DECIMAL(18,9))) AS DOUBLE) AS conf_sum
         |  FROM binned GROUP BY bin
         |)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
         |       CAST(SUM(n) AS BIGINT) AS n_docs,
         |       CAST(SUM(CAST(
         |         CAST(n AS DOUBLE) * abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
         |           - conf_sum / CAST(n AS DOUBLE))
         |       AS DECIMAL(18,9))) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS ece
         |FROM bins""".stripMargin,
    "q_brier" ->
      s"""WITH $spanCoverageSql,
         |scp AS (
         |  SELECT CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS pos,
         |         (CAST(covered AS BIGINT) * 20000 + n_tokens) // (2 * CAST(n_tokens AS BIGINT)) AS p4,
         |         least((CAST(covered AS BIGINT) * 10) // CAST(n_tokens AS BIGINT), 9) AS bin
         |  FROM sc
         |), raw AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM((p4 - 10000 * pos) * (p4 - 10000 * pos)) AS BIGINT) AS sq_scaled,
         |         CAST(SUM(pos) AS BIGINT) AS tot_pos
         |  FROM scp
         |), bins AS (
         |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(pos) AS BIGINT) AS n_pos,
         |         CAST(SUM(p4) AS BIGINT) AS s4
         |  FROM scp GROUP BY bin
         |), comp AS (
         |  SELECT CAST(SUM(((s4 - 10000 * n_pos) * (s4 - 10000 * n_pos)) // n) AS BIGINT) AS rel_scaled,
         |         CAST(SUM(((n_pos * n_docs - tot_pos * n) * (n_pos * n_docs - tot_pos * n)) // n) AS BIGINT) AS res_scaled
         |  FROM bins, raw
         |)
         |SELECT n_docs,
         |       CAST(sq_scaled AS DOUBLE) / (100000000.0 * CAST(n_docs AS DOUBLE)) AS brier,
         |       CAST(rel_scaled AS DOUBLE) / (100000000.0 * CAST(n_docs AS DOUBLE)) AS reliability,
         |       CAST(res_scaled AS DOUBLE)
         |         / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS resolution,
         |       (CAST(tot_pos AS DOUBLE) / CAST(n_docs AS DOUBLE))
         |         * (1.0 - CAST(tot_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS uncertainty
         |FROM raw, comp""".stripMargin,
    "q_confusion" ->
      s"""WITH $spanCoverageSql,
         |cells AS (
         |  SELECT CAST(SUM(pred * pos) AS BIGINT) AS tp,
         |         CAST(SUM(pred * (1 - pos)) AS BIGINT) AS fp,
         |         CAST(SUM((1 - pred) * pos) AS BIGINT) AS fn,
         |         CAST(SUM((1 - pred) * (1 - pos)) AS BIGINT) AS tn
         |  FROM (SELECT CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS pos,
         |               CASE WHEN cover_frac >= 0.2 THEN 1 ELSE 0 END AS pred
         |        FROM sc)
         |), m AS (
         |  SELECT tp, fp, fn, tn, tp + fp + fn + tn AS n,
         |         CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy,
         |         CAST((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn) AS DOUBLE)
         |           / CAST((tp + fp + fn + tn) * (tp + fp + fn + tn) AS DOUBLE) AS pe
         |  FROM cells
         |)
         |SELECT tp, fp, fn, tn, n, accuracy,
         |       CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
         |       CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
         |       2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1,
         |       (accuracy - pe) / (1.0 - pe) AS kappa
         |FROM m""".stripMargin,
    "q_source_terms" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
         |), ysw AS (
         |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS y_sw FROM tok GROUP BY source, term
         |), yw AS (
         |  SELECT term, CAST(SUM(y_sw) AS BIGINT) AS y_w FROM ysw GROUP BY term
         |), ns AS (
         |  SELECT source, CAST(SUM(y_sw) AS BIGINT) AS n_s FROM ysw GROUP BY source
         |), n AS (
         |  SELECT CAST(SUM(y_w) AS BIGINT) AS n_tot FROM yw
         |), d AS (
         |  SELECT s.source, s.term, s.y_sw,
         |         CAST(CAST(
         |           ln((CAST(s.y_sw AS DOUBLE) + $LogOddsAlpha0 * CAST(w.y_w AS DOUBLE) / CAST(t.n_tot AS DOUBLE))
         |              / (CAST(g.n_s AS DOUBLE) + $LogOddsAlpha0 - CAST(s.y_sw AS DOUBLE)
         |                 - $LogOddsAlpha0 * CAST(w.y_w AS DOUBLE) / CAST(t.n_tot AS DOUBLE)))
         |           - ln((CAST(w.y_w - s.y_sw AS DOUBLE) + $LogOddsAlpha0 * CAST(w.y_w AS DOUBLE) / CAST(t.n_tot AS DOUBLE))
         |              / (CAST(t.n_tot - g.n_s AS DOUBLE) + $LogOddsAlpha0 - CAST(w.y_w - s.y_sw AS DOUBLE)
         |                 - $LogOddsAlpha0 * CAST(w.y_w AS DOUBLE) / CAST(t.n_tot AS DOUBLE)))
         |         AS DECIMAL(18,9)) AS DOUBLE) AS delta
         |  FROM ysw s JOIN yw w USING (term) JOIN ns g USING (source) CROSS JOIN n t
         |)
         |SELECT source, rank, term, y_sw, delta FROM (
         |  SELECT source, term, y_sw, delta,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source
         |                                 ORDER BY delta DESC, term) AS BIGINT) AS rank
         |  FROM d)
         |WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin,
    "q_zipf" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY source, term
        |), rk AS (
        |  SELECT source, freq,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |                                 ORDER BY freq DESC, term) AS BIGINT) AS rank
        |  FROM tf
        |), xy AS (
        |  SELECT source,
        |         CAST(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE) AS x,
        |         CAST(CAST(ln(CAST(freq AS DOUBLE)) AS DECIMAL(18,9)) AS DOUBLE) AS y
        |  FROM rk
        |), agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |         CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * y AS DECIMAL(18,9))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(18,9))) AS DOUBLE) AS sxx
        |  FROM xy GROUP BY source
        |), sl AS (
        |  SELECT source, n_terms, sx, sy,
        |         (sxy - sx * sy / CAST(n_terms AS DOUBLE))
        |           / (sxx - sx * sx / CAST(n_terms AS DOUBLE)) AS zipf_slope
        |  FROM agg
        |)
        |SELECT source, n_terms, zipf_slope,
        |       (sy - zipf_slope * sx) / CAST(n_terms AS DOUBLE) AS intercept
        |FROM sl
        |ORDER BY source""".stripMargin,
    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), g AS (
        |  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
        |  FROM toks, (SELECT unnest(generate_series(1, 4000)) AS i)
        |  WHERE i + 2 <= len(t)
        |), agg AS (
        |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM g GROUP BY gram
        |), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY df DESC, gram) AS BIGINT) AS rank,
        |       gram, df, n_occ, n_docs,
        |       CAST(df AS DOUBLE) / n_docs AS df_frac
        |FROM agg, nd
        |WHERE df * 100 >= n_docs
        |ORDER BY rank""".stripMargin,
    "q_url_canonicalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'HTTPS://WWW.' || source || '.Example.COM:443/' || source
        |           || '/Doc/' || doc_id || '/?utm_source=agg&ref=' || lang
        |           || '&utm_medium=rss#sec' || (doc_id % 5) AS url
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, url,
        |         lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |         regexp_replace(regexp_replace(
        |           lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
        |           ':443$', ''), '^www\.', '') AS host,
        |         regexp_replace(regexp_replace(regexp_replace(
        |           regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^#]*)', 1),
        |           '&utm_[A-Za-z0-9_]*=[^&]*', '', 'g'),
        |           '[?]utm_[A-Za-z0-9_]*=[^&]*&', '?', 'g'),
        |           '[?]utm_[A-Za-z0-9_]*=[^&]*$', '', 'g') AS rest
        |  FROM u
        |)
        |SELECT doc_id, url, scheme || '://' || host || rest AS canon_url, host
        |FROM p
        |ORDER BY doc_id""".stripMargin,
    "q_auc" ->
      s"""WITH $spanCoverageSql,
         |g AS (
         |  SELECT cover_frac, CAST(COUNT(*) AS BIGINT) AS c,
         |         CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
         |  FROM sc GROUP BY cover_frac
         |), w AS (
         |  SELECT c, p,
         |         CAST(COALESCE(SUM(c) OVER (ORDER BY cover_frac
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |              AS BIGINT) AS before
         |  FROM g
         |), t AS (
         |  SELECT CAST(SUM(p) AS BIGINT) AS npos,
         |         CAST(SUM(c - p) AS BIGINT) AS nneg,
         |         CAST(SUM(p * (2 * (before + 1) + c - 1)) AS BIGINT) AS s2
         |  FROM w
         |)
         |SELECT npos AS n_pos, nneg AS n_neg,
         |       s2 - npos * (npos + 1) AS u2,
         |       CAST(s2 - npos * (npos + 1) AS DOUBLE)
         |         / CAST(2 * npos * nneg AS DOUBLE) AS auc
         |FROM t""".stripMargin,
    "q_auc_by_source" ->
      s"""WITH $spanCoverageSql,
         |g AS (
         |  SELECT source, cover_frac, CAST(COUNT(*) AS BIGINT) AS c,
         |         CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
         |  FROM sc GROUP BY source, cover_frac
         |), w AS (
         |  SELECT source, c, p,
         |         CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY cover_frac
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |              AS BIGINT) AS before
         |  FROM g
         |), t AS (
         |  SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
         |         CAST(SUM(c - p) AS BIGINT) AS n_neg,
         |         CAST(SUM(p * (2 * (before + 1) + c - 1))
         |           - SUM(p) * (SUM(p) + 1) AS BIGINT) AS u2
         |  FROM w GROUP BY source
         |)
         |SELECT source, n_pos, n_neg, u2,
         |       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |         CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE)
         |       END AS auc
         |FROM t
         |ORDER BY source""".stripMargin,
    "q_mutual_info" ->
      """WITH joint AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY lang, source
        |), nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint),
        |hj AS (
        |  SELECT 0.0 - CAST(SUM(CAST(
        |           (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)))
        |         AS DOUBLE) AS h_joint,
        |         CAST(COUNT(*) AS BIGINT) AS n_cells
        |  FROM joint, nn
        |), ml AS (
        |  SELECT lang, CAST(SUM(c) AS BIGINT) AS c FROM joint GROUP BY lang
        |), hl AS (
        |  SELECT 0.0 - CAST(SUM(CAST(
        |           (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)))
        |         AS DOUBLE) AS h_lang,
        |         CAST(COUNT(*) AS BIGINT) AS n_langs
        |  FROM ml, nn
        |), ms AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS c FROM joint GROUP BY source
        |), hs AS (
        |  SELECT 0.0 - CAST(SUM(CAST(
        |           (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)))
        |         AS DOUBLE) AS h_source,
        |         CAST(COUNT(*) AS BIGINT) AS n_sources
        |  FROM ms, nn
        |)
        |SELECT n AS n_docs, n_langs, n_sources, n_cells,
        |       h_lang, h_source, h_joint,
        |       h_lang + h_source - h_joint AS mi
        |FROM nn, hl, hs, hj""".stripMargin,
    "q_novelty_curve" ->
      """WITH ex AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
        |  FROM documents
        |), fo AS (
        |  SELECT sh, MIN(doc_id) AS first_doc FROM ex GROUP BY sh
        |)
        |SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
        |       CAST(SUM(CASE WHEN fo.first_doc = ex.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN fo.first_doc = ex.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS novelty
        |FROM ex JOIN fo USING (sh)
        |GROUP BY ex.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_source_overlap" ->
      """WITH ex AS (
        |  SELECT source,
        |         unnest(list_distinct(list_transform(
        |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS sh
        |  FROM documents
        |), st AS (
        |  SELECT DISTINCT source, sh FROM ex
        |), sizes AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM st GROUP BY source
        |), inter AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM st a JOIN st b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY a.source, b.source
        |)
        |SELECT src_a, src_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_common,
        |       CAST(n_common AS DOUBLE)
        |         / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard,
        |       CAST(n_common AS DOUBLE)
        |         / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
        |FROM inter
        |JOIN sizes sa ON sa.source = src_a
        |JOIN sizes sb ON sb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "q_pr_curve" ->
      s"""WITH $spanCoverageSql,
         |r AS (
         |  SELECT doc_id, source, cover_frac,
         |         CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS pos,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source
         |                ORDER BY cover_frac DESC, doc_id) AS BIGINT) AS rn,
         |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS nl,
         |         CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
         |                OVER (PARTITION BY source) AS BIGINT) AS npos_l
         |  FROM sc
         |), e AS (
         |  SELECT source, CAST(i AS BIGINT) AS k,
         |         (CAST(i AS BIGINT) * nl + 9) // 10 AS cutoff,
         |         rn, pos, npos_l
         |  FROM r CROSS JOIN range(1, 11) kk(i)
         |), a AS (
         |  SELECT source, k,
         |         CAST(MIN(cutoff) AS BIGINT) AS n_kept,
         |         CAST(SUM(CASE WHEN rn <= cutoff THEN pos ELSE 0 END) AS BIGINT) AS tp,
         |         CAST(SUM(CASE WHEN rn <= cutoff THEN 1 - pos ELSE 0 END) AS BIGINT) AS fp,
         |         CAST(MIN(npos_l) AS BIGINT) AS npos_l
         |  FROM e GROUP BY source, k
         |)
         |SELECT source, k, n_kept, tp, fp,
         |       CAST(tp AS DOUBLE) / CAST(n_kept AS DOUBLE) AS p_at_k,
         |       CASE WHEN npos_l > 0
         |            THEN CAST(tp AS DOUBLE) / CAST(npos_l AS DOUBLE) END AS r_at_k
         |FROM a
         |ORDER BY source, k""".stripMargin,
    "q_pii_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |         text || ' contact ' ||
        |         regexp_replace(lower(source), '[^a-z0-9]', '', 'g') ||
        |         '.' || CAST(doc_id AS VARCHAR) ||
        |         '@mail.example or call ' ||
        |         CAST((doc_id * 7919) % 10000000 AS VARCHAR) ||
        |         ' ext ' || CAST(doc_id % 100 AS VARCHAR) AS raw
        |  FROM documents
        |), e AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z.]+')) AS BIGINT)
        |           AS n_emails,
        |         regexp_replace(raw, '[a-z0-9.]+@[a-z.]+', '<EMAIL>', 'g') AS r1
        |  FROM planted
        |)
        |SELECT doc_id, n_emails,
        |       CAST(len(regexp_extract_all(r1, '[0-9]+')) AS BIGINT) AS n_numbers,
        |       CAST(length(regexp_replace(r1, '[0-9]+', '<NUM>', 'g')) AS BIGINT)
        |         AS n_chars_red,
        |       md5(regexp_replace(r1, '[0-9]+', '<NUM>', 'g')) AS red_md5
        |FROM e
        |ORDER BY doc_id""".stripMargin,
    "q_bpe_merges" ->
      s"""WITH $bpeSql
         |SELECT CAST(1 AS BIGINT) AS round, a, b, cnt FROM b1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT) AS round, a, b, cnt FROM b2
         |ORDER BY round""".stripMargin,
    "q_bpe_encode" ->
      s"""WITH $bpeSql,
         |enc AS (
         |  SELECT word, CAST(len(s) AS BIGINT) AS n_sym FROM w2
         |), dw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(len(word)) AS BIGINT) AS n_chars,
         |       CAST(SUM(n_sym) AS BIGINT) AS n_sym_bpe,
         |       CAST(SUM(n_sym) AS DOUBLE) / CAST(SUM(len(word)) AS DOUBLE)
         |         AS compression
         |FROM dw JOIN enc USING (word)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q_kneser_ney" ->
      """WITH db AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i ->
        |           struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |        WHERE len(string_split(text, ' ')) >= 2)
        |), dbf AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM db
        |), pair AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM dbf GROUP BY w1, w2
        |), ctx AS (
        |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
        |         CAST(COUNT(*) AS BIGINT) AS n1f
        |  FROM pair GROUP BY w1
        |), pred AS (
        |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM pair GROUP BY w2
        |), ty AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pair
        |), scored AS (
        |  SELECT d.doc_id,
        |         CAST(ln(
        |           (greatest(CAST(p.c12 AS DOUBLE) - 0.75, 0.0) / CAST(c.c1 AS DOUBLE))
        |           + ((0.75 * CAST(c.n1f AS DOUBLE) / CAST(c.c1 AS DOUBLE))
        |              * (CAST(r.n1p AS DOUBLE) / CAST(ty.t AS DOUBLE)))
        |         ) AS DECIMAL(18,9)) AS logp
        |  FROM dbf d JOIN pair p USING (w1, w2) JOIN ctx c USING (w1)
        |       JOIN pred r USING (w2) CROSS JOIN ty
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(logp) AS DOUBLE) AS sum_logp_kn,
        |       CAST(SUM(logp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_logp_kn
        |FROM scored
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_lm_score" ->
      """WITH db AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i ->
        |           struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |        WHERE len(string_split(text, ' ')) >= 2)
        |), dbf AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM db
        |), pair AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM dbf GROUP BY w1, w2
        |), l AS (
        |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM pair GROUP BY w1
        |), v AS (
        |  SELECT COUNT(DISTINCT w2) AS v FROM pair
        |), scored AS (
        |  SELECT d.doc_id,
        |         CAST(ln(CAST(p.c12 + 1 AS DOUBLE) / CAST(l.c1 + v.v AS DOUBLE))
        |           AS DECIMAL(18,9)) AS logp
        |  FROM dbf d JOIN pair p USING (w1, w2) JOIN l USING (w1) CROSS JOIN v
        |)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(logp) AS DOUBLE) AS sum_logp,
        |       CAST(SUM(logp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_logp,
        |       CAST(SUM(logp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) < -8.0 AS is_low_quality
        |FROM scored
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), bi AS (
        |  SELECT unnest(list_transform(range(1, len(t)), i ->
        |           struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |  FROM toks
        |), pair AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c12 FROM bi GROUP BY b.w1, b.w2
        |), l AS (
        |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM pair GROUP BY w1
        |), r AS (
        |  SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM pair GROUP BY w2
        |), n AS (
        |  SELECT CAST(SUM(c12) AS BIGINT) AS n_bi FROM pair
        |), scored AS (
        |  SELECT p.w1, p.w2, p.c12, l.c1, r.c2,
        |         CAST(CAST(ln((CAST(p.c12 AS DOUBLE) * CAST(n.n_bi AS DOUBLE))
        |           / (CAST(l.c1 AS DOUBLE) * CAST(r.c2 AS DOUBLE))) AS DECIMAL(18,9)) AS DOUBLE) AS pmi
        |  FROM pair p JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |  WHERE p.c12 >= 5
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rank,
        |       w1, w2, c12, c1, c2, pmi
        |FROM scored
        |ORDER BY rank
        |LIMIT 50""".stripMargin,
    "q_containment" ->
      s"""WITH $doubledSql,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh
         |), dfd AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex
         |), kept AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
         |  FROM dfd WHERE df <= $ShingleDfCap
         |)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |       a.n_sh AS a_n, b.n_sh AS b_n, COUNT(*) AS common,
         |       CAST(COUNT(*) AS DOUBLE) / CAST(least(a.n_sh, b.n_sh) AS DOUBLE) AS containment
         |FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |HAVING CAST(COUNT(*) AS DOUBLE) / CAST(least(a.n_sh, b.n_sh) AS DOUBLE) >= 0.6
         |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_edit" ->
      s"""WITH $doubledSql,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh
         |), dfd AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex
         |), kept AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
         |  FROM dfd WHERE df <= $ShingleDfCap
         |), cand AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS common,
         |         a.n_sh AS a_n, b.n_sh AS b_n
         |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
         |  HAVING CAST(COUNT(*) AS DOUBLE) / CAST(a.n_sh + b.n_sh - COUNT(*) AS DOUBLE) >= 0.5
         |), lv AS (
         |  SELECT c.a_id, c.b_id,
         |         CAST(levenshtein(substring(da.text, 1, $EditPrefix),
         |                          substring(db.text, 1, $EditPrefix)) AS BIGINT) AS lev,
         |         1.0 - CAST(levenshtein(substring(da.text, 1, $EditPrefix),
         |                                substring(db.text, 1, $EditPrefix)) AS DOUBLE)
         |           / CAST(greatest(length(substring(da.text, 1, $EditPrefix)),
         |                           length(substring(db.text, 1, $EditPrefix))) AS DOUBLE) AS edit_ratio
         |  FROM cand c
         |  JOIN doubled da ON c.a_id = da.doc_id
         |  JOIN doubled db ON c.b_id = db.doc_id
         |)
         |SELECT a_id, b_id, lev, edit_ratio
         |FROM lv
         |WHERE edit_ratio >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,
    "q_simhash_estimate" ->
      s"""WITH $md5SigSql, groups AS (
         |  SELECT simhash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_members
         |  FROM sigd GROUP BY simhash
         |), near AS (
         |  SELECT a.simhash, COUNT(*) AS n_near_groups
         |  FROM groups a JOIN groups b
         |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |  GROUP BY a.simhash
         |)
         |SELECT g.simhash, g.keeper_id, g.n_members,
         |       CAST(COALESCE(n.n_near_groups, 0) AS BIGINT) AS n_near_groups
         |FROM groups g LEFT JOIN near n USING (simhash)
         |ORDER BY simhash""".stripMargin,
    // Round 8: the PRODUCTION xxhash64 family joins the hash gate.
    // XxOracleSql recomputes Spark's exact XXH64 inside DuckDB, so the
    // three formerly weak-checked queries now compare like any other —
    // same structure as their md5 twins, same hash family as the
    // engine.
    "q_dedup_simhash" ->
      s"""${XxOracleSql.prelude}WITH $xxSigSql, groups AS (
         |  SELECT simhash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_members
         |  FROM sigd GROUP BY simhash
         |), near AS (
         |  SELECT a.simhash, COUNT(*) AS n_near_groups
         |  FROM groups a JOIN groups b
         |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |  GROUP BY a.simhash
         |)
         |SELECT g.simhash, g.keeper_id, g.n_members,
         |       CAST(COALESCE(n.n_near_groups, 0) AS BIGINT) AS n_near_groups
         |FROM groups g LEFT JOIN near n USING (simhash)
         |ORDER BY simhash""".stripMargin,
    "q_simhash_clusters" ->
      s"""${XxOracleSql.prelude}WITH RECURSIVE $xxSigSql, groups AS (
         |  SELECT simhash, MIN(doc_id) AS keeper_id FROM sigd GROUP BY simhash
         |), near AS (
         |  SELECT a.keeper_id AS src, b.keeper_id AS dst
         |  FROM groups a JOIN groups b
         |    ON a.simhash <> b.simhash AND bit_count(xor(a.simhash, b.simhash)) <= 3
         |), reach AS (
         |  SELECT keeper_id AS src, keeper_id AS dst FROM groups
         |  UNION
         |  SELECT r.src, n.dst FROM reach r JOIN near n ON r.dst = n.src
         |), lbl AS (
         |  SELECT src AS keeper_id, MIN(dst) AS cluster_keeper FROM reach GROUP BY src
         |)
         |SELECT s.doc_id, l.cluster_keeper
         |FROM sigd s JOIN groups g USING (simhash) JOIN lbl l USING (keeper_id)
         |ORDER BY doc_id""".stripMargin,
    "q_minhash_recall" ->
      s"""${XxOracleSql.prelude}WITH $xxMinhashSql, probes AS (
         |  SELECT doc_id FROM docn ORDER BY doc_id LIMIT 16
         |), pc AS (
         |  SELECT k1.doc_id AS p_id, k2.doc_id AS o_id, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM probes p JOIN kept k1 ON k1.doc_id = p.doc_id
         |  JOIN kept k2 ON k2.h = k1.h AND k2.doc_id <> p.doc_id
         |  GROUP BY 1, 2
         |), truep AS MATERIALIZED (
         |  SELECT DISTINCT least(pc.p_id, pc.o_id) AS a, greatest(pc.p_id, pc.o_id) AS b
         |  FROM pc JOIN docn na ON na.doc_id = pc.p_id
         |  JOIN docn nb ON nb.doc_id = pc.o_id
         |  WHERE 5 * common >= 4 * (na.n_sh + nb.n_sh - common)
         |), cand AS MATERIALIZED (
         |  SELECT DISTINCT least(b1.doc_id, b2.doc_id) AS a, greatest(b1.doc_id, b2.doc_id) AS b
         |  FROM probes p JOIN banded b1 ON b1.doc_id = p.doc_id
         |  JOIN banded b2 ON b2.band = b1.band AND b2.bh = b1.bh AND b2.doc_id <> p.doc_id
         |), hits AS MATERIALIZED (
         |  SELECT a, b FROM truep INTERSECT SELECT a, b FROM cand
         |)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM truep) AS n_true,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_hits,
         |       CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
         |         / CAST((SELECT COUNT(*) FROM truep) AS DOUBLE) AS recall,
         |       CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
         |         / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) AS cand_precision""".stripMargin,
    "q_dedup_minhash" ->
      s"""${XxOracleSql.prelude}WITH $xxMinhashSql, cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), common AS (
         |  SELECT c.a_id AS ca, c.b_id AS cb, COUNT(*) AS common
         |  FROM cand c
         |  JOIN kept ka ON ka.doc_id = c.a_id
         |  JOIN kept kb ON kb.doc_id = c.b_id AND kb.h = ka.h
         |  GROUP BY c.a_id, c.b_id
         |)
         |SELECT cm.ca AS a_id, cm.cb AS b_id,
         |       CAST(cm.common AS DOUBLE)
         |         / CAST(na.n_sh + nb.n_sh - cm.common AS DOUBLE) AS jaccard
         |FROM common cm
         |JOIN docn na ON na.doc_id = cm.ca
         |JOIN docn nb ON nb.doc_id = cm.cb
         |WHERE CAST(cm.common AS DOUBLE)
         |        / CAST(na.n_sh + nb.n_sh - cm.common AS DOUBLE) >= 0.8
         |ORDER BY a_id, b_id""".stripMargin,
    "q_decontaminate_fuzzy" ->
      s"""${XxOracleSql.prelude}WITH $xxMinhashSql, spl AS (
         |  SELECT doc_id, ${Sampling.splitSql} AS split FROM doubled
         |), evalb AS (
         |  SELECT banded.doc_id AS eval_id, band, bh
         |  FROM banded JOIN spl USING (doc_id) WHERE spl.split <> 'train'
         |), trainb AS (
         |  SELECT banded.doc_id AS train_id, band, bh
         |  FROM banded JOIN spl USING (doc_id) WHERE spl.split = 'train'
         |), cand AS (
         |  SELECT DISTINCT e.eval_id, t.train_id
         |  FROM evalb e JOIN trainb t ON e.band = t.band AND e.bh = t.bh
         |), common AS (
         |  SELECT c.eval_id AS ce, c.train_id AS ct, COUNT(*) AS common
         |  FROM cand c
         |  JOIN kept ka ON ka.doc_id = c.eval_id
         |  JOIN kept kb ON kb.doc_id = c.train_id AND kb.h = ka.h
         |  GROUP BY c.eval_id, c.train_id
         |), ver AS (
         |  SELECT cm.ce, cm.ct,
         |         CAST(cm.common AS DOUBLE)
         |           / CAST(na.n_sh + nb.n_sh - cm.common AS DOUBLE) AS j
         |  FROM common cm
         |  JOIN docn na ON na.doc_id = cm.ce
         |  JOIN docn nb ON nb.doc_id = cm.ct
         |  WHERE CAST(cm.common AS DOUBLE)
         |          / CAST(na.n_sh + nb.n_sh - cm.common AS DOUBLE) >= 0.8
         |), topc AS (
         |  SELECT ce, ct AS top_train_id, j AS max_jaccard FROM (
         |    SELECT ce, ct, j,
         |           ROW_NUMBER() OVER (PARTITION BY ce ORDER BY j DESC, ct) AS rk
         |    FROM ver)
         |  WHERE rk = 1
         |), cnt AS (
         |  SELECT ce, COUNT(*) AS n_contaminators FROM ver GROUP BY ce
         |), ev AS (
         |  SELECT sigs.doc_id AS eval_id, spl.split
         |  FROM sigs JOIN spl ON spl.doc_id = sigs.doc_id
         |  WHERE spl.split <> 'train'
         |)
         |SELECT ev.eval_id, ev.split,
         |       CAST(COALESCE(cnt.n_contaminators, 0) AS BIGINT) AS n_contaminators,
         |       topc.top_train_id, topc.max_jaccard,
         |       topc.top_train_id IS NOT NULL AS contaminated
         |FROM ev
         |LEFT JOIN cnt ON cnt.ce = ev.eval_id
         |LEFT JOIN topc ON topc.ce = ev.eval_id
         |ORDER BY eval_id""".stripMargin,
    "q_minhash_estimate" -> {
      val rows = MinhashSlots / MinhashBands
      s"""WITH $doubledSql,
         |sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
         |  FROM doubled
         |), ex AS (
         |  SELECT doc_id, unnest(shingles) AS s FROM sh
         |), dfd AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM ex
         |), kept AS (
         |  SELECT doc_id, s, COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
         |  FROM dfd WHERE df <= $ShingleDfCap
         |), sigs AS (
         |  SELECT doc_id, n_sh, list(s ORDER BY s) AS shs FROM kept GROUP BY doc_id, n_sh
         |), sigs2 AS (
         |  SELECT doc_id, n_sh, shs,
         |         list_transform(range(0, $MinhashSlots), k ->
         |           list_min(list_transform(shs,
         |             s2 -> substring(md5(CAST(k AS VARCHAR) || ':' || s2), 1, 15)))) AS sig
         |  FROM sigs
         |), banded AS (
         |  SELECT doc_id, b AS band,
         |         array_to_string(sig[b*$rows+1 : b*$rows+$rows], '|') AS band_key
         |  FROM sigs2 CROSS JOIN range(0, $MinhashBands) r(b)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |)
         |SELECT c.a_id, c.b_id,
         |       CAST(len(list_filter(range(1, ${MinhashSlots + 1}), i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS matches,
         |       CAST(len(list_filter(range(1, ${MinhashSlots + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / $MinhashSlots.0 AS est_jaccard,
         |       CAST(len(list_filter(sa.shs, s2 -> list_contains(sb.shs, s2))) AS BIGINT) AS common,
         |       CAST(len(list_filter(sa.shs, s2 -> list_contains(sb.shs, s2))) AS DOUBLE)
         |         / CAST(sa.n_sh + sb.n_sh - len(list_filter(sa.shs, s2 -> list_contains(sb.shs, s2))) AS DOUBLE) AS jaccard,
         |       abs(CAST(len(list_filter(range(1, ${MinhashSlots + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / $MinhashSlots.0
         |         - CAST(len(list_filter(sa.shs, s2 -> list_contains(sb.shs, s2))) AS DOUBLE)
         |             / CAST(sa.n_sh + sb.n_sh - len(list_filter(sa.shs, s2 -> list_contains(sb.shs, s2))) AS DOUBLE)) AS abs_err
         |FROM cand c
         |JOIN sigs2 sa ON c.a_id = sa.doc_id
         |JOIN sigs2 sb ON c.b_id = sb.doc_id
         |ORDER BY a_id, b_id""".stripMargin
    },
    "q_tfidf" ->
      """WITH tfc AS (
        |  SELECT doc_id, token, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY doc_id, token
        |), dfc AS (
        |  SELECT token, COUNT(*) AS df FROM tfc GROUP BY token
        |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.token, t.tf, d.df,
        |         CAST(t.tf AS DOUBLE)
        |           * ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score
        |  FROM tfc t JOIN dfc d USING (token), n
        |)
        |SELECT doc_id, rank, token, tf, df,
        |       CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score_r6
        |FROM (SELECT doc_id, token, tf, df, score,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                ORDER BY score DESC, token) AS rank
        |      FROM scored)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin
  )
}

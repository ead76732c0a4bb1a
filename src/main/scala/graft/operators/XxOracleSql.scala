package graft.operators

/** Spark-compatible XXH64, re-expressed as DuckDB SQL.
  *
  * The engine's production hash family is `xxhash64` (Spark's native
  * XXH64 with seed 42 over the UTF-8 bytes, little-endian lane reads —
  * `org.apache.spark.sql.catalyst.expressions.XxHash64`, public
  * Apache source; the algorithm itself is Yann Collet's public-domain
  * XXH64). Until round 8 that family was the ONE thing the DuckDB
  * oracle could not replay, so the three queries that hash with it
  * (q_dedup_minhash, q_dedup_simhash, q_simhash_clusters) sat on the
  * weak-checked list with oracled md5 twins standing in for them.
  *
  * This object closes that gap: it generates DuckDB SQL that computes
  * the SAME 64-bit hash, exactly, for any input string up to a
  * per-call byte bound. Two pieces:
  *
  *  - [[prelude]]: `CREATE OR REPLACE MACRO` statements for the
  *    mod-2^64 primitives. All arithmetic runs in HUGEINT (int128)
  *    restricted to [0, 2^64): DuckDB checks overflow on every
  *    integer multiply, so a 64-bit wrapping product is decomposed
  *    into 32-bit halves (lo*y + ((hi*y) mod 2^32)*2^32, every
  *    intermediate < 2^97) and rotations into divmod by powers of two
  *    (never a shift past the value's range). Bytes come from
  *    `hex(encode(s))` — two hex-digit lookups per byte — because
  *    DuckDB has no direct blob-byte accessor.
  *  - [[stages]]: a chained-CTE pipeline (word extraction, the four
  *    stripe accumulators, merge, 8/4/1-byte tails, avalanche) that
  *    hashes one string column. Stages rather than one nested
  *    expression: DuckDB inlines macro arguments by tree substitution,
  *    so nesting the whole fold would duplicate subtrees
  *    exponentially; staging keeps every reference a column ref.
  *    Lengths are data-dependent, so every stage guards on the byte
  *    count (`nst`/`nfw`/`n%8`/`n%4`) — the SAME branch structure the
  *    reference algorithm takes. Strings longer than `maxB` RAISE via
  *    DuckDB's `error()` (fail-loud at the stage itself — the oracle
  *    run aborts, which no NULL-skipping aggregate downstream can
  *    hide).
  *
  * Correctness evidence: bit-identical to Spark's `xxhash64` on
  * empty/1/4/8/31/32/33/127/128-byte vectors, multi-byte UTF-8, and
  * 500 random fuzz strings (validated against a reference XXH64
  * implementation that itself matches Spark on all vectors), and —
  * the real gate — the three previously-weak queries now hash-match
  * end-to-end at sf0.001 and sf0.01.
  */
private[operators] object XxOracleSql {

  private val M = BigInt("18446744073709551616") // 2^64
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val Seed = BigInt(42) // Spark's fixed xxhash64 seed

  private def pow2(e: Int): BigInt = BigInt(1) << e

  /** Macro DDL prefix (multi-statement; DuckDB's Python `execute`
    * runs the statements in order and returns the final SELECT). */
  val prelude: String =
    s"""CREATE OR REPLACE MACRO gxx_mul(x, y) AS
       |  ((x % 4294967296) * y + (((x // 4294967296) * y) % 4294967296) * 4294967296) % $M;
       |CREATE OR REPLACE MACRO gxx_rotl(x, plo, phi) AS (x % phi) * plo + (x // phi);
       |CREATE OR REPLACE MACRO gxx_byte(hx, i) AS
       |  CAST((strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS BIGINT), 1)) - 1) * 16
       |     + strpos('0123456789ABCDEF', substr(hx, CAST(2*i AS BIGINT), 1)) - 1 AS HUGEINT);
       |CREATE OR REPLACE MACRO gxx_w64(hx, i) AS
       |  gxx_byte(hx,i) + gxx_byte(hx,i+1)*256 + gxx_byte(hx,i+2)*65536 + gxx_byte(hx,i+3)*16777216
       |  + gxx_byte(hx,i+4)*4294967296 + gxx_byte(hx,i+5)*1099511627776
       |  + gxx_byte(hx,i+6)*281474976710656 + gxx_byte(hx,i+7)*72057594037927936;
       |CREATE OR REPLACE MACRO gxx_w32(hx, i) AS
       |  gxx_byte(hx,i) + gxx_byte(hx,i+1)*256 + gxx_byte(hx,i+2)*65536 + gxx_byte(hx,i+3)*16777216;
       |CREATE OR REPLACE MACRO gxx_rnd(acc, lane) AS
       |  gxx_mul(gxx_rotl((acc + gxx_mul(lane, $P2)) % $M, 2147483648, 8589934592), $P1);
       |CREATE OR REPLACE MACRO gxx_merge(h, v) AS
       |  (gxx_mul(xor(h, gxx_rnd(CAST(0 AS HUGEINT), v)), $P1) + $P4) % $M;
       |CREATE OR REPLACE MACRO gxx_sb(u) AS
       |  CAST(CASE WHEN u >= 9223372036854775808 THEN u - $M ELSE u END AS BIGINT);
       |CREATE OR REPLACE MACRO gxx_ub(x) AS
       |  CAST(x AS HUGEINT) + CASE WHEN x < 0 THEN $M ELSE 0 END;
       |""".stripMargin

  /** CTE chain hashing `scol` of `src` into BIGINT column `out` on the
    * final CTE `<pfx>fin` (carrying `key`). `maxB` bounds the input
    * bytes (multiple of 32); a longer string RAISES via DuckDB's
    * `error()` — a NULL here used to be silently skipped by downstream
    * MIN()/SUM() aggregations (pooled into one window partition by
    * PARTITION BY h), degrading "fail-loud" to a confusing hash
    * mismatch at best, so the bound violation now surfaces as a
    * definite oracle fault instead. `pfx` keeps two chains in one
    * statement from colliding. */
  def stages(src: String, key: String, scol: String, out: String,
      maxB: Int, pfx: String): String = {
    require(maxB % 32 == 0 && maxB > 0, s"maxB must be a positive multiple of 32, got $maxB")
    val nw = maxB / 8
    val nStripes = maxB / 32
    val vInit = Seq((Seed + P1 + P2) % M, (Seed + P2) % M, Seed, (Seed - P1 + M) % M)
    val wCols = (0 until nw).map(k =>
      s"CASE WHEN n >= ${8 * (k + 1)} THEN gxx_w64(hx, ${8 * k + 1}) ELSE CAST(0 AS HUGEINT) END AS w$k")
      .mkString(", ")
    val carry = "n, nst, nfw, " + (0 until nw).map(k => s"w$k").mkString(", ") + ", t4w, tb0, tb1, tb2"
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s"""${pfx}x0 AS (SELECT $key, upper(hex(encode($scol))) AS hx,
                |      CAST(octet_length(encode($scol)) AS HUGEINT) AS n FROM $src),
                |  ${pfx}x1 AS (SELECT $key, n, n // 32 AS nst, n // 8 AS nfw, $wCols,
                |      CASE WHEN n % 8 >= 4 THEN gxx_w32(hx, (n // 8) * 8 + 1) ELSE CAST(0 AS HUGEINT) END AS t4w,
                |      CASE WHEN n % 4 >= 1 THEN gxx_byte(hx, n - (n % 4) + 1) ELSE CAST(0 AS HUGEINT) END AS tb0,
                |      CASE WHEN n % 4 >= 2 THEN gxx_byte(hx, n - (n % 4) + 2) ELSE CAST(0 AS HUGEINT) END AS tb1,
                |      CASE WHEN n % 4 >= 3 THEN gxx_byte(hx, n - (n % 4) + 3) ELSE CAST(0 AS HUGEINT) END AS tb2
                |    FROM ${pfx}x0)""".stripMargin
    var prev = s"${pfx}x1"
    for (j <- 1 to nStripes) {
      val vs = (0 until 4).map { i =>
        if (j == 1)
          s"CASE WHEN nst >= 1 THEN gxx_rnd(CAST(${vInit(i)} AS HUGEINT), w$i) ELSE CAST(0 AS HUGEINT) END AS v${i + 1}"
        else
          s"CASE WHEN nst >= $j THEN gxx_rnd(v${i + 1}, w${4 * (j - 1) + i}) ELSE v${i + 1} END AS v${i + 1}"
      }.mkString(", ")
      parts += s"${pfx}s$j AS (SELECT $key, $carry, $vs FROM $prev)"
      prev = s"${pfx}s$j"
    }
    // h init: converge the four accumulators (rotl 1/7/12/18) when at
    // least one stripe ran, else the short-input seed constant
    val conv = s"(gxx_rotl(v1,2,${pow2(63)}) + gxx_rotl(v2,128,${pow2(57)})" +
      s" + gxx_rotl(v3,4096,${pow2(52)}) + gxx_rotl(v4,262144,${pow2(46)})) % $M"
    parts += s"${pfx}h0 AS (SELECT $key, $carry, v1, v2, v3, v4, CASE WHEN nst >= 1 THEN $conv ELSE CAST(${(Seed + P5) % M} AS HUGEINT) END AS h FROM $prev)"
    prev = s"${pfx}h0"
    for (i <- 0 until 4) {
      parts += s"${pfx}h${i + 1} AS (SELECT $key, $carry, v1, v2, v3, v4, CASE WHEN nst >= 1 THEN gxx_merge(h, v${i + 1}) ELSE h END AS h FROM $prev)"
      prev = s"${pfx}h${i + 1}"
    }
    parts += s"${pfx}hl AS (SELECT $key, $carry, (h + n) % $M AS h FROM $prev)"
    prev = s"${pfx}hl"
    // up to three full 8-byte tail words (rotl 27)
    for (j <- 1 to 3) {
      val opts = (0 to nStripes).filter(s => 4 * s + j - 1 < nw)
        .map(s => s"WHEN $s THEN w${4 * s + j - 1}").mkString(" ")
      val tw = s"CASE nst $opts ELSE CAST(0 AS HUGEINT) END"
      parts += s"${pfx}t$j AS (SELECT $key, $carry, CASE WHEN nfw - 4*nst >= $j THEN " +
        s"(gxx_mul(gxx_rotl(xor(h, gxx_rnd(CAST(0 AS HUGEINT), $tw)), ${pow2(27)}, ${pow2(37)}), $P1) + $P4) % $M" +
        s" ELSE h END AS h FROM $prev)"
      prev = s"${pfx}t$j"
    }
    // optional 4-byte tail (rotl 23), then up to three bytes (rotl 11)
    parts += s"${pfx}t4 AS (SELECT $key, $carry, CASE WHEN n % 8 >= 4 THEN " +
      s"(gxx_mul(gxx_rotl(xor(h, gxx_mul(t4w, $P1)), ${pow2(23)}, ${pow2(41)}), $P2) + $P3) % $M" +
      s" ELSE h END AS h FROM $prev)"
    prev = s"${pfx}t4"
    for (j <- 0 until 3) {
      parts += s"${pfx}b$j AS (SELECT $key, $carry, CASE WHEN n % 4 >= ${j + 1} THEN " +
        s"gxx_mul(gxx_rotl(xor(h, gxx_mul(tb$j, $P5)), ${pow2(11)}, ${pow2(53)}), $P1)" +
        s" ELSE h END AS h FROM $prev)"
      prev = s"${pfx}b$j"
    }
    parts += s"${pfx}f1 AS (SELECT $key, n, gxx_mul(xor(h, h // ${pow2(33)}), $P2) AS h FROM $prev)"
    parts += s"${pfx}f2 AS (SELECT $key, n, gxx_mul(xor(h, h // ${pow2(29)}), $P3) AS h FROM ${pfx}f1)"
    parts += s"${pfx}fin AS (SELECT $key, CASE WHEN n > $maxB THEN " +
      s"CAST(error('graft xxhash64 oracle: input exceeds maxB=$maxB bytes') AS BIGINT) " +
      s"ELSE gxx_sb(xor(h, h // ${pow2(32)})) END AS $out FROM ${pfx}f2)"
    parts.mkString(",\n  ")
  }

  /** VALUES rows `(k, plo, phi, msk)` for q_dedup_minhash's 32
    * signature slots: slot k = rotl(h, 2k+1) XOR (C << k) with
    * C = -7046029254386353131 (mirrors the Spark-side
    * shiftleft|shiftrightunsigned mix in unsigned divmod form). */
  val minhashSlotValues: String = {
    val ubC = (BigInt("-7046029254386353131") + M) % M
    (0 until 32).map { k =>
      val r = 2 * k + 1
      s"($k, ${pow2(r)}::HUGEINT, ${pow2(64 - r)}::HUGEINT, ${(ubC * pow2(k)) % M}::HUGEINT)"
    }.mkString(", ")
  }
}

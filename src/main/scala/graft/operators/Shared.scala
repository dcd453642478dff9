package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers and DuckDB-oracle SQL snippets shared across query
  * modules. One definition per cross-engine idiom, so the Spark
  * expression and its SQL mirror can't drift apart per-module.
  */
object Agg {
  /** Exact order-independent sum of a double measure: decimal-sum then
    * back to double (see SCALE.md determinism rules).
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** THE cents convention of every monetary row: floor(value·100) as
    * BIGINT (value is non-negative in this corpus, so floor ≡
    * truncation and plain DIV on sums stays floor-safe). One
    * definition — a rounding or scale change must not be applied N
    * times across modules.
    */
  def centsOf(value: Column): Column =
    floor(value * lit(100.0).cast("double")).cast("long")
}

object Vec {
  /** Sign-bucket bit dial (round 9 — computed, not documented):
    * bits = clamp(bitlen(n) − 4, [4, 32]), i.e. ⌊log2 n⌋ − 3, which
    * pins EXPECTED bucket occupancy n/2^bits into [8, 16) as the
    * corpus grows — the fix for the fixed-bucket-space flaw class
    * (constant buckets ⇒ quadratic within-bucket growth) that earned
    * ss_graph_expand its round-7 flag. The cap sits far below the
    * embedding dimension (64 sign bits available); past it —
    * n > 2³⁶ vectors — the production dial is more hash families /
    * multiprobe (dd_embed_multiprobe), not more bits from one
    * projection. Exercised across 1×/20× corpora in ScaleSpec/Stress
    * (per-bucket candidate counts hold as n grows).
    */
  def signBucketBits(n: Column): Column =
    greatest(lit(4), least(lit(32), length(bin(n)).cast("int") - lit(4)))

  /** Sign-bit LSH bucket over the first `bits` embedding dimensions,
    * folded MSB-first into one BIGINT (acc·2 + sign_i — mirrored by
    * DuckDB's `list_reduce`, whose first-element seed equals the
    * 0-seeded fold).
    */
  def signBucket(embedding: Column, bits: Column): Column =
    aggregate(
      transform(sequence(lit(1), bits),
        i => when(element_at(embedding, i) >= 0, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc * lit(2L) + x)

  /** The shared vector projection of the sign-LSH family: input
    * columns + (bits, bucket, e double[], nrm). The bit dial comes
    * from the frame's OWN row count — a 1-row broadcast leg, no
    * driver action, metadata-cheap at any scale.
    */
  def bucketedVectors(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nb = emb.agg(signBucketBits(count(lit(1))).as("bits"))
    emb.crossJoin(broadcast(nb))
      .withColumn("bucket", signBucket(col("embedding"), col("bits")))
      .withColumn("e", transform(col("embedding"), _.cast("double")))
      .withColumn("nrm",
        sqrt(graft.functions.DotProduct.dot_product(col("e"), col("e"))))
  }
}

object OracleSql {
  /** W1-filtered whitespace tokens of `text`. */
  val toks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** DuckDB mirror of `conv(substring(H, start, len), 16, 10)`: the
    * positional-nibble decode of a lowercase-hex expression `h` —
    * Σ nibble(h[start+i]) · 16^(len−1−i) as BIGINT. ONE definition
    * (round-12 ADVICE): SketchQueries, EventQueries, and RangeJoin
    * all fold through it so a fix to the idiom cannot drift across
    * modules.
    */
  def hexLong(h: String, start: Int, len: Int): String =
    (0 until len).map { i =>
      val pow = Math.pow(16.0, (len - 1 - i).toDouble).toLong
      s"(strpos('0123456789abcdef', substring($h, ${start + i}, 1)) - 1)::BIGINT * $pow"
    }.mkString("(", " + ", ")")

  /** DuckDB mirror of [[Agg.dsum]]. */
  def dsum(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  /** DuckDB mirror of Spark's codegen'd `soundex()` on [A-Za-z]+
    * input, RE2-safe (no backreferences): letters map to code digits
    * via translate (vowels→'0' separators, H/W→'9' transparent), one
    * literal-digit regexp_replace per code d collapses d(9*d)+ runs
    * (plain repeats AND h/w-separated repeats at once), then the
    * first position's code is dropped, 0/9 stripped, 3 digits kept,
    * right-padded. ONE definition — ta_soundex and dd_er_blocking
    * both fold through it; probed edge cases pinned in
    * Round18OpsSpec.
    */
  def soundexSql(wordExpr: String): String = {
    val mapped = s"translate(upper($wordExpr), " +
      "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230129022455012623019202')"
    val collapsed = (1 to 6).foldLeft(mapped) { (acc, d) =>
      s"regexp_replace($acc, '$d(9*$d)+', '$d', 'g')"
    }
    s"substring(upper($wordExpr), 1, 1) || rpad(substring(" +
      s"replace(replace(substring($collapsed, 2), '9', ''), '0', ''), " +
      "1, 3), 3, '0')"
  }

  /** DuckDB mirror of [[graft.functions.Log2Micro.log2micro]]: emits a
    * chain of CTE clauses computing the deterministic fixed-point
    * log2-in-micro-units of `num/den` for every row of `rel` (which
    * must expose BIGINT columns `num ≥ 1` and `den ≥ 1` plus the key
    * columns in `keys`). The final CTE `<prefix>_lg` holds
    * (keys..., lrm BIGINT).
    *
    * Op-for-op the Scala loop: bit length via `length(bin(x))`,
    * exact power-of-two normalization (`1::BIGINT << e` — never libm
    * `pow`), 20 recursive squaring rounds, and a final
    * offset-positive truncating division (Spark `DIV` and DuckDB `//`
    * both truncate toward zero; a non-negative numerator makes that
    * identical to floor). The enclosing statement MUST start
    * `WITH RECURSIVE`. No libm call appears anywhere — the doctrine
    * (`OracleLintSpec`) bans `ln`/`exp`/`log`/`pow` from every oracle.
    */
  def log2microCtes(prefix: String, rel: String, keys: Seq[String]): String = {
    val ks = keys.mkString(", ")
    s"""${prefix}_m0 AS (
       |  SELECT $ks, lg2e0,
       |    (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) /
       |      (CASE WHEN lg2e0 >= 0 THEN CAST(1::BIGINT << lg2e0 AS DOUBLE)
       |            ELSE 1.0 / CAST(1::BIGINT << (-lg2e0) AS DOUBLE) END) AS lg2m0
       |  FROM (SELECT $ks, num, den,
       |          length(bin(num)) - length(bin(den)) AS lg2e0 FROM $rel)),
       |${prefix}_fx AS (
       |  SELECT $ks,
       |    CASE WHEN lg2m0 < 1 THEN lg2e0 - 1 ELSE lg2e0 END AS lg2e,
       |    CASE WHEN lg2m0 < 1 THEN lg2m0 * 2 ELSE lg2m0 END AS lg2m,
       |    0 AS lg2i, CAST(0 AS BIGINT) AS lg2f
       |  FROM ${prefix}_m0
       |  UNION ALL
       |  SELECT $ks, lg2e,
       |    CASE WHEN lg2m*lg2m >= 2 THEN lg2m*lg2m/2 ELSE lg2m*lg2m END,
       |    lg2i + 1,
       |    lg2f * 2 + CASE WHEN lg2m*lg2m >= 2 THEN 1 ELSE 0 END
       |  FROM ${prefix}_fx WHERE lg2i < 20),
       |${prefix}_lg AS (
       |  SELECT $ks,
       |    ((CAST(lg2e AS BIGINT) * 1048576 + lg2f + 67108864) * 1000000)
       |      // 1048576 - 64000000 AS lrm
       |  FROM ${prefix}_fx WHERE lg2i = 20)""".stripMargin
  }

  /** DuckDB mirror of [[graft.functions.Exp2Micro]]: emits CTE clauses
    * computing the deterministic fixed-point 2^(xm/10⁶) in micro-units
    * for every row of `rel` (exposing BIGINT `xm` plus `keys`). Final
    * CTE `<prefix>_ex` holds (keys..., e2m BIGINT). The 20 bit
    * constants are the SAME decimal literals as
    * [[graft.functions.Exp2Micro.BitConstants]] — both engines parse
    * identical doubles, so the fixed-order product is bit-identical.
    * The k ∈ [−63, 42] domain guard is mirrored too: out-of-range
    * exponents raise via DuckDB `error()` exactly where the Scala
    * side throws, so both engines fail loudly rather than one engine
    * shifting out of range. The enclosing statement MUST start
    * `WITH RECURSIVE`.
    */
  def exp2microCtes(prefix: String, rel: String, keys: Seq[String]): String = {
    val ks = keys.mkString(", ")
    val cs = graft.functions.Exp2Micro.BitConstantsSql
    s"""${prefix}_kf AS (
       |  SELECT $ks,
       |    CASE WHEN xm >= 0 THEN xm // 1000000
       |         ELSE -((-xm + 999999) // 1000000) END AS ex2k,
       |    xm - (CASE WHEN xm >= 0 THEN xm // 1000000
       |               ELSE -((-xm + 999999) // 1000000) END) * 1000000 AS ex2f0
       |  FROM $rel),
       |${prefix}_fx AS (
       |  SELECT $ks, ex2k, ex2f0 AS ex2f, 1.0::DOUBLE AS ex2m, 0 AS ex2i
       |  FROM ${prefix}_kf
       |  UNION ALL
       |  SELECT $ks, ex2k,
       |    CASE WHEN ex2f * 2 >= 1000000 THEN ex2f * 2 - 1000000
       |         ELSE ex2f * 2 END,
       |    CASE WHEN ex2f * 2 >= 1000000 THEN ex2m * ($cs)[ex2i + 1]
       |         ELSE ex2m END,
       |    ex2i + 1
       |  FROM ${prefix}_fx WHERE ex2i < 20),
       |${prefix}_ex AS (
       |  SELECT $ks,
       |    CASE WHEN ex2k < -63 OR ex2k > 42
       |      THEN CAST(error('exp2micro: k outside [-63, 42]') AS BIGINT)
       |    WHEN ex2k >= 0
       |      THEN CAST(floor(ex2m * 1000000.0) AS BIGINT) << ex2k
       |      ELSE CAST(floor(ex2m * 1000000.0) AS BIGINT) >> (-ex2k) END AS e2m
       |  FROM ${prefix}_fx WHERE ex2i = 20)""".stripMargin
  }

  /** DuckDB mirror of [[Vec.signBucketBits]]: a 1-row CTE body. */
  val signBucketBitsSql: String =
    "SELECT greatest(4, least(32, length(bin(count(*))) - 4)) AS bits FROM embeddings"

  /** DuckDB mirror of [[Vec.signBucket]] — expects a `bits` column in
    * scope (the [[signBucketBitsSql]] cross join).
    */
  def signBucketSql(emb: String): String =
    s"""list_reduce(list_transform(range(1, bits + 1),
       |      i -> CASE WHEN $emb[i] >= 0 THEN 1::BIGINT ELSE 0::BIGINT END),
       |      (acc, x) -> acc * 2 + x)""".stripMargin

  /** DuckDB mirror of [[Vec.bucketedVectors]] over the embeddings
    * table: (vec_id, e double[], bits, bucket, nrm).
    */
  val vectors: String =
    s"""SELECT vec_id, embedding::DOUBLE[] AS e, b.bits AS bits,
       |    ${signBucketSql("embedding")} AS bucket,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings, ($signBucketBitsSql) b""".stripMargin
}

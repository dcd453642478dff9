package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Log2Micro
import graft.operators.TextOps.tokens

/** Multinomial naive-Bayes language classifier — the generative
  * counterpart to the discriminative quality LR
  * ([[QualityQueries]] ta_quality_lr): train = one counting pass
  * (token counts per (lang, word), Laplace-smoothed), serve = one
  * join-and-sum pass. The workhorse "cheap document router" of data
  * pipelines (langid, domain routing, spam gates) — at 100 TB both
  * passes are plain shuffle aggregates, no iteration, no driver
  * state.
  *
  * Determinism: every log-probability is the fixed-point
  * [[graft.functions.Log2Micro]] (base-2, micro-units, exact
  * integers), so per-doc scores are order-free BIGINT sums —
  * bit-identical on any engine. Laplace smoothing keeps every
  * numerator ≥ 1, so the log is always defined; unseen (word, lang)
  * pairs share one per-lang "unseen" score rather than materializing
  * the V×L dense grid (the model stays |observed vocab per lang| + L
  * rows — the sparse form a 100 TB vocabulary forces anyway).
  *
  * Reference scope: extends the text-analysis family beyond the
  * reference's WordCount (`Worker.cc:123-274`); same corpus tables.
  */
object ClassifyQueries {

  /** (doc_id, lang, word) with multiplicity — whitespace tokens (W1
    * semantics, empties filtered).
    */
  private def docWords(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(tokens(col("text"))).as("word"))

  /** Model frames: (counts per (lang, word), per-lang totals with
    * smoothing denominator, per-lang priors). `den = N_l + V`:
    * lang-l token mass plus the GLOBAL distinct-word vocabulary.
    */
  private def model(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val dw = docWords(s, dir)
    val counts = dw.groupBy("lang", "word").agg(count(lit(1)).as("c"))
    val v = counts.select("word").distinct()
      .agg(count(lit(1)).as("v"))
    val nl = counts.groupBy("lang")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val dl = Tables.documents(s, dir).groupBy("lang")
      .agg(count(lit(1)).as("n_docs"))
    val dt = Tables.documents(s, dir).agg(count(lit(1)).as("d"))
    val langs = nl.join(dl, "lang")
      .crossJoin(broadcast(v)).crossJoin(broadcast(dt))
      .withColumn("den", col("n_tokens") + col("v"))
      .withColumn("prior_micro", Log2Micro.log2micro(col("n_docs"), col("d")))
      .withColumn("unseen_micro", Log2Micro.log2micro(lit(1L), col("den")))
    (counts, langs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NB TRAIN — the per-language model card: document/token mass,
    // observed vocabulary, smoothing denominator, and the fixed-point
    // log₂ prior. One counting pass over the corpus; the output is a
    // languages-sized frame (the model head — the per-word
    // log-likelihood table stays sparse and is exercised by
    // ta_nb_score below).
    "ta_nb_train" -> ((s, dir) => {
      val (_, langs) = model(s, dir)
      langs.select("lang", "n_docs", "n_tokens", "n_distinct", "den",
          "prior_micro", "unseen_micro")
        .orderBy("lang")
    }),

    // NB SCORE — serve the trained model over its own corpus: per
    // document and candidate language, score = prior +
    // Σ_tokens log₂((c+1)/(N_l+V)), argmax with ties to the
    // lexicographically first language. Dataflow: tokens × L
    // candidates (L = language count, a schema constant), LEFT join
    // against the sparse count table on (lang, word) — unseen pairs
    // fall back to the per-lang smoothed score — then two grouped
    // aggregates (per-candidate sum, per-doc argmax via min-struct).
    // Tokenless documents keep their prior-only argmax through the
    // documents×L base frame. The output reports train-set accuracy
    // per doc (pred vs the labeled lang) — the standard sanity gate
    // before a router ships.
    "ta_nb_score" -> ((s, dir) => {
      val (counts, langs) = model(s, dir)
      val cand = langs.select(col("lang").as("cand"), col("den"),
        col("prior_micro"), col("unseen_micro"))
      val tokenScores = docWords(s, dir)
        .crossJoin(broadcast(cand))
        .join(counts
            .select(col("lang").as("cand"), col("word"), col("c")),
          Seq("cand", "word"), "left")
        .withColumn("lp",
          when(col("c").isNotNull,
            Log2Micro.log2micro(col("c") + 1L, col("den")))
            .otherwise(col("unseen_micro")))
        .groupBy("doc_id", "cand")
        .agg(sum(col("lp")).as("lp_sum"))
      val base = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .crossJoin(broadcast(cand.select("cand", "prior_micro")))
      base.join(tokenScores, Seq("doc_id", "cand"), "left")
        .withColumn("score",
          col("prior_micro") + coalesce(col("lp_sum"), lit(0L)))
        .groupBy("doc_id", "lang")
        .agg(min(struct((-col("score")).as("ns"), col("cand").as("cd")))
          .as("m"))
        .select(col("doc_id"), col("lang"),
          col("m.cd").as("pred_lang"), (-col("m.ns")).as("score_micro"),
          (col("m.cd") === col("lang")).as("correct"))
        .orderBy("doc_id")
    }),

    // FEATURE HASHING (the "hashing trick", Weinberger et al. 2009) —
    // the fixed-width featurizer that makes unbounded vocabularies
    // trainable: token → bucket h(w) mod D with a second hash bit
    // choosing ±1 (signed sums make collisions cancel in expectation,
    // keeping the hashed dot product unbiased). Both hashes read the
    // engine-shared md5 hex (first byte → bucket, third nibble →
    // sign — the pipe_dsir bucket convention), so the sparse vectors
    // are bit-identical across engines with NO shared dictionary —
    // the property that lets 1000 executors featurize independently
    // with zero coordination, the whole point of the trick at 100 TB.
    // Output: sparse (doc_id, j, val) rows; touched-but-cancelled
    // buckets keep their explicit 0 (they carry collision evidence).
    "ta_feature_hash" -> ((s, dir) =>
      docWords(s, dir)
        .withColumn("j",
          conv(substring(md5(col("word")), 1, 2), 16, 10).cast("long") % FhDim)
        .withColumn("sgn",
          when(conv(substring(md5(col("word")), 3, 1), 16, 10)
            .cast("long") < 8L, 1L).otherwise(-1L))
        .groupBy("doc_id", "j")
        .agg(sum(col("sgn")).as("val"), count(lit(1)).as("n_hits"))
        .orderBy("doc_id", "j"))
  )

  /** Hashed feature dimension (buckets). */
  val FhDim = 64

  /** Shared model CTEs (DuckDB): counts / vocab / per-lang frames plus
    * the fixed-point prior and unseen-word scores. Enclosing statement
    * must start WITH RECURSIVE (log2micro chains).
    */
  private val modelCtes: String = {
    val toks = OracleSql.toks
    s"""dw AS MATERIALIZED (
       |  SELECT doc_id, lang, unnest($toks) AS word FROM documents),
       |counts AS MATERIALIZED (
       |  SELECT lang, word, CAST(count(*) AS BIGINT) AS c
       |  FROM dw GROUP BY 1, 2),
       |vv AS MATERIALIZED (
       |  SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM counts),
       |nl AS MATERIALIZED (
       |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
       |    CAST(count(*) AS BIGINT) AS n_distinct
       |  FROM counts GROUP BY 1),
       |dl AS MATERIALIZED (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1),
       |dt AS (SELECT CAST(count(*) AS BIGINT) AS d FROM documents),
       |prel AS (
       |  SELECT dl.lang, dl.n_docs AS num, dt.d AS den FROM dl, dt),
       |${OracleSql.log2microCtes("pri", "prel", Seq("lang"))},
       |unrel AS (
       |  SELECT nl.lang, CAST(1 AS BIGINT) AS num,
       |    nl.n_tokens + vv.v AS den
       |  FROM nl, vv),
       |${OracleSql.log2microCtes("uns", "unrel", Seq("lang"))},
       |langs AS MATERIALIZED (
       |  SELECT nl.lang, dl.n_docs, nl.n_tokens, nl.n_distinct,
       |    nl.n_tokens + vv.v AS den,
       |    p.lrm AS prior_micro, u.lrm AS unseen_micro
       |  FROM nl
       |  JOIN dl ON dl.lang = nl.lang
       |  JOIN pri_lg p ON p.lang = nl.lang
       |  JOIN uns_lg u ON u.lang = nl.lang
       |  CROSS JOIN vv)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "ta_nb_train" ->
      s"""WITH RECURSIVE $modelCtes
         |SELECT lang, n_docs, n_tokens, n_distinct, den, prior_micro,
         |  unseen_micro
         |FROM langs ORDER BY lang""".stripMargin,

    "ta_nb_score" ->
      s"""WITH RECURSIVE $modelCtes,
         |seenrel AS (
         |  SELECT c.lang, c.word, c.c + 1 AS num, l.den
         |  FROM counts c JOIN langs l ON l.lang = c.lang),
         |${OracleSql.log2microCtes("sc", "seenrel", Seq("lang", "word"))},
         |seen AS MATERIALIZED (
         |  SELECT lang AS cand, word, lrm AS lp FROM sc_lg),
         |toksc AS MATERIALIZED (
         |  SELECT dw.doc_id, l.lang AS cand,
         |    CAST(sum(COALESCE(s.lp, l.unseen_micro)) AS BIGINT) AS lp_sum
         |  FROM dw CROSS JOIN langs l
         |  LEFT JOIN seen s ON s.cand = l.lang AND s.word = dw.word
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, d.lang, l.lang AS cand,
         |    l.prior_micro + COALESCE(t.lp_sum, 0) AS score
         |  FROM documents d
         |  CROSS JOIN langs l
         |  LEFT JOIN toksc t ON t.doc_id = d.doc_id AND t.cand = l.lang),
         |best AS (
         |  SELECT doc_id, lang, cand, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cand ASC) AS rn
         |  FROM scored)
         |SELECT doc_id, lang, cand AS pred_lang,
         |  CAST(score AS BIGINT) AS score_micro,
         |  cand = lang AS correct
         |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // md5 nibbles via the strpos alphabet trick (the dd_simhash /
    // pipe_dsir convention).
    "ta_feature_hash" ->
      s"""WITH dw AS (
         |  SELECT doc_id, unnest(${OracleSql.toks}) AS word FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CAST(((strpos('0123456789abcdef', substring(md5(word), 1, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substring(md5(word), 2, 1)) - 1))
         |       % $FhDim AS BIGINT) AS j,
         |    CASE WHEN strpos('0123456789abcdef', substring(md5(word), 3, 1)) - 1 < 8
         |      THEN 1 ELSE -1 END AS sgn
         |  FROM dw)
         |SELECT doc_id, j, CAST(sum(sgn) AS BIGINT) AS val,
         |  CAST(count(*) AS BIGINT) AS n_hits
         |FROM h GROUP BY 1, 2 ORDER BY doc_id, j""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import TextOps._

/** Retrieval-ranking operators: BM25 keyword scoring, reciprocal-rank
  * fusion of keyword + vector retrieval (the standard hybrid-search
  * shape), and the k-nearest-neighbor graph over embeddings — the
  * building block for semantic dedup and graph-based clustering.
  *
  * Cross-engine exactness: every score is a fixed left-to-right
  * arithmetic expression over integers (tf, df, dl, ranks) — both
  * engines evaluate the identical IEEE-double op tree, so results are
  * bit-equal with no rounding (see the parity rules in SCALE.md).
  */
object RankQueries {

  /** BM25 free parameters (Robertson et al.; the universal defaults). */
  val K1 = 1.2
  val B  = 0.75

  /** The benchmark keyword query. Terms are literals (a search query),
    * chosen from the corpus vocabulary with distinct document
    * frequencies.
    */
  val QueryTerms: Seq[String] = Seq("join", "vector", "stream")

  val CandidateK = 50 // candidates per retriever feeding the fusion
  val RrfK       = 60 // the standard RRF dampening constant

  /** Per-document BM25 score against [[QueryTerms]] plus the raw
    * signals (dl, tf_i): tf and df come from one pass over the token
    * arrays (no explode — `size(filter(toks, = term))` is a narrow
    * per-row expression), corpus statistics (N, total length, df_i)
    * arrive as ONE broadcast aggregate row, so the corpus never
    * shuffles: at 100 TB this is a map-only scan plus a 1-row
    * broadcast.
    */
  def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +:
        size(col("toks")).cast("long").as("dl") +:
        QueryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === t)).cast("long").as(s"tf$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("total_len") +:
        QueryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
    // score_i = idf_i * tf_i*(k1+1) / (tf_i + k1*(1 - b + b*dl*N/L));
    // idf_i = (N - df_i + 0.5)/(df_i + 0.5) — the non-log rational idf
    // (monotone in the classic log idf, engine-portable: no libm).
    def termScore(i: Int): Column = {
      val tf  = col(s"tf$i").cast("double")
      val df  = col(s"df$i").cast("double")
      val nd  = col("n_docs").cast("double")
      val dl  = col("dl").cast("double")
      val len = col("total_len").cast("double")
      val idf  = (nd - df + lit(0.5)) / (df + lit(0.5))
      val norm = lit(K1) * (lit(1.0) - lit(B) + lit(B) * dl * nd / len)
      idf * (tf * lit(K1 + 1.0)) / (tf + norm)
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("dl"),
        (QueryTerms.indices.map(termScore).reduceLeft(_ + _)).as("score"))
  }

  /** DuckDB mirror of [[bm25Scored]] — kept adjacent so the op trees
    * cannot drift (bit-exact doubles require identical evaluation
    * order). Yields (doc_id, dl, score).
    */
  def bm25Sql: String = {
    val tfCols = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = QueryTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n    ")
    val scoreTerms = QueryTerms.indices.map { i =>
      val idf  = s"(CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE))"
      val norm = s"CAST($K1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST($B AS DOUBLE) + CAST($B AS DOUBLE) * CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE) / CAST(total_len AS DOUBLE))"
      s"($idf * (CAST(tf$i AS DOUBLE) * CAST(${K1 + 1.0} AS DOUBLE)) / (CAST(tf$i AS DOUBLE) + $norm))"
    }.mkString("\n      + ")
    s"""tfd AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id, ${OracleSql.toks} AS t FROM documents)),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len,
       |    $dfCols
       |  FROM tfd),
       |bm25 AS (
       |  SELECT doc_id, dl,
       |    $scoreTerms AS score
       |  FROM tfd CROSS JOIN stats)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-10 BM25 hits for the benchmark query. orderBy+limit plans
    // TakeOrderedAndProject — per-partition top-k then a k-row merge on
    // one reducer; no global sort at any scale.
    "ta_bm25" -> ((s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)),

    // Hybrid search: BM25 candidates ∪ vector candidates, fused by
    // reciprocal-rank: rrf = Σ 1/(60 + rank). Each retriever
    // contributes its top-CandidateK via TakeOrderedAndProject; ranks
    // are then assigned inside the bounded candidate set (a
    // CandidateK-row frame — the single-partition window is capped by
    // construction, unlike a global rank). Standard RRF semantics: a
    // doc absent from one list simply contributes nothing for it.
    "ss_hybrid_rrf" -> ((s, dir) => {
      val wText = Window.orderBy(col("score").desc, col("doc_id").asc)
      val textTop = bm25Scored(s, dir)
        .orderBy(col("score").desc, col("doc_id").asc).limit(CandidateK)
        .select(col("doc_id"), row_number().over(wText).cast("int").as("rt"))
      val v = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      val q = v.filter(col("vec_id") === 0)
        .select(col("e").as("qe"), col("nrm").as("qnrm"))
      val wVec = Window.orderBy(col("cos").desc, col("vec_id").asc)
      val vecTop = v.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(dot(col("e"), col("qe")) / (col("nrm") * col("qnrm")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(CandidateK)
        .select(col("vec_id"), row_number().over(wVec).cast("int").as("rv"))
      textTop
        .join(vecTop, textTop("doc_id") === vecTop("vec_id"), "full_outer")
        .select(
          coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
          col("rt"), col("rv"),
          (coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("rt")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK).cast("double") + col("rv")), lit(0.0)))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(10)
    }),

    // k-NN graph, LSH-blocked: each vector's top-3 cosine neighbors
    // WITHIN its sign-bit bucket — the scale form of graph
    // construction (the all-pairs kNN graph is quadratic; bucketing
    // bounds each join group, and recall is recovered by multiprobe /
    // more tables, same plan shape). Self-join on the bucket key, then
    // a per-vector bounded window.
    "dd_knn_graph" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"),
          Vec.signBucket(col("embedding")).as("bucket"))
        .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("nbr").asc)
      v.as("a").join(v.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("nbr"),
          round(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 4)
            .as("cos"))
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter(col("rn") <= 3)
        .orderBy("src", "rn")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "ta_bm25" ->
      s"""WITH ${bm25Sql}
         |SELECT doc_id, dl, score FROM bm25
         |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "ss_hybrid_rrf" ->
      s"""WITH ${bm25Sql},
         |text_top AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rt
         |  FROM (SELECT doc_id, score FROM bm25
         |        ORDER BY score DESC, doc_id ASC LIMIT $CandidateK)),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |      FROM embeddings),
         |q AS (SELECT e AS qe, nrm AS qnrm FROM v WHERE vec_id = 0),
         |vec_top AS (
         |  SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rv
         |  FROM (SELECT vec_id,
         |          round(list_dot_product(e, qe) / (nrm * qnrm), 4) AS cos
         |        FROM v CROSS JOIN q WHERE vec_id <> 0
         |        ORDER BY cos DESC, vec_id ASC LIMIT $CandidateK))
         |SELECT COALESCE(t.doc_id, s.vec_id) AS doc_id, rt, rv,
         |  COALESCE(CAST(1.0 AS DOUBLE) / (CAST($RrfK AS DOUBLE) + rt), CAST(0.0 AS DOUBLE))
         |    + COALESCE(CAST(1.0 AS DOUBLE) / (CAST($RrfK AS DOUBLE) + rv), CAST(0.0 AS DOUBLE)) AS rrf
         |FROM text_top t FULL OUTER JOIN vec_top s ON t.doc_id = s.vec_id
         |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,
    "dd_knn_graph" ->
      s"""WITH v AS (${OracleSql.vectors})
         |SELECT src, nbr, cos, CAST(rn AS INT) AS rn FROM (
         |  SELECT a.vec_id AS src, b.vec_id AS nbr,
         |    round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) AS cos,
         |    row_number() OVER (
         |      PARTITION BY a.vec_id
         |      ORDER BY round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) DESC,
         |               b.vec_id ASC) AS rn
         |  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |WHERE rn <= 3 ORDER BY src, rn""".stripMargin
  )
}

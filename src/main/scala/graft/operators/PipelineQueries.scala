package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import TextOps._

/** Composed pipeline queries — the shapes a real training-data pipeline
  * chains together: per-group top terms, IVF-style centroid assignment
  * (the coarse quantizer of a scaled ANN index), and a full
  * clean-corpus pass (quality gate → exact dedup survivors → per-lang
  * stats).
  */
object PipelineQueries {

  val NumCentroids = 4 // IVF coarse centroids = embeddings of vec_id 0..3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-5 words per language (tokenize → count per (lang, word) →
    // windowed top-k per lang). Shuffles: one agg + one bounded window.
    "ta_top_words_per_lang" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(col("lang"), explode(tokens(col("text"))).as("word"))
        .groupBy("lang", "word")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("word").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    }),

    // IVF coarse assignment: route each vector to its nearest centroid
    // (here: the first NumCentroids vectors, deterministic) by cosine.
    // At scale this assignment is the partition key of the ANN index;
    // centroids are broadcast.
    "ss_ivf_assign" -> ((s, dir) => {
      val v = Tables.embeddings(s, dir)
        .select(col("vec_id"), toDouble(col("embedding")).as("e"))
        .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      val cents = v.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cent_id"), col("e").as("ce"), col("nrm").as("cnrm"))
      val scored = v.crossJoin(broadcast(cents))
        .withColumn("cos", round(dot(col("e"), col("ce")) / (col("nrm") * col("cnrm")), 6))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("cent_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("cent_id"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy("cent_id")
    }),

    // Clean-corpus pipeline: quality gate (enough tokens, some
    // stopwords) → exact-dedup survivors (min doc_id per fingerprint)
    // → surviving doc count + token volume per language.
    "pipe_clean_corpus" -> ((s, dir) => {
      val scored = Tables.documents(s, dir)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .filter(col("n_tokens") >= 12)
        .withColumn("fp", md5(col("text")))
      val survivors = scored
        .withColumn("keep",
          row_number().over(
            Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)) === 1)
        .filter(col("keep"))
      survivors.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens_total"))
        .orderBy("lang")
    })
  )

  private val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"

  val oracleSql: Map[String, String] = Map(
    "ta_top_words_per_lang" ->
      s"""SELECT lang, word, cnt, CAST(rk AS INT) AS rk FROM (
         |  SELECT lang, word, cnt,
         |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word ASC) AS rk
         |  FROM (SELECT lang, w AS word, count(*) AS cnt
         |        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         |        WHERE w <> '' GROUP BY lang, w))
         |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "ss_ivf_assign" ->
      s"""WITH v AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS e,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |cents AS (SELECT vec_id AS cent_id, e AS ce, nrm AS cnrm
         |          FROM v WHERE vec_id < $NumCentroids),
         |assigned AS (
         |  SELECT v.vec_id, cent_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY round(list_dot_product(e, ce) / (nrm * cnrm), 6) DESC,
         |               cent_id ASC) AS rk
         |  FROM v CROSS JOIN cents)
         |SELECT cent_id, count(*) AS n_vectors
         |FROM assigned WHERE rk = 1
         |GROUP BY cent_id ORDER BY cent_id""".stripMargin,
    "pipe_clean_corpus" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, md5(text) AS fp,
         |         CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE len($toksSql) >= 12),
         |survivors AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id ASC) AS rn
         |    FROM scored)
         |  WHERE rn = 1)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total
         |FROM survivors GROUP BY lang ORDER BY lang""".stripMargin
  )
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import TextOps._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Baseline: brute-force cosine top-k — the query set is tiny and
  * explicitly `broadcast()`, so the candidate side never shuffles; the
  * per-query top-k is a bounded window. Ranking uses the rounded score
  * with vec_id tie-break so results are deterministic across engines.
  *
  * Scale path: sign-bit LSH bucketing (same 8-bit bucket as
  * [[Dedup]]'s embedding near-dup) — each query probes one bucket,
  * cutting candidates ~256×. The bucket column is what you'd partition
  * the table by at write time at 100 TB (an IVF coarse quantizer is the
  * same plan shape: replace sign-bits with nearest-centroid id).
  */
object Similarity {

  val K = 10
  val NumQueries = 5 // query set: vec_id < 5

  private def vecs(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"),
        Vec.signBucket(col("embedding")).as("bucket"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
  }

  private def topk(joined: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined
      .withColumn("cos",
        round(dot(col("q.e"), col("c.e")) / (col("q.nrm") * col("c.nrm")), 4))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("vec_id"), col("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .orderBy("query_id", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact top-k: broadcast query set × all candidates.
    "ss_bruteforce_topk" -> ((s, dir) => {
      val v = vecs(s, dir)
      val q = v.filter(col("vec_id") < NumQueries)
      topk(broadcast(q).as("q")
        .join(v.as("c"), col("q.vec_id") =!= col("c.vec_id")))
    }),

    // LSH-bucketed ANN: candidates restricted to the query's bucket.
    "ss_lsh_topk" -> ((s, dir) => {
      val v = vecs(s, dir)
      val q = v.filter(col("vec_id") < NumQueries)
      topk(broadcast(q).as("q")
        .join(v.as("c"),
          col("q.bucket") === col("c.bucket") &&
            col("q.vec_id") =!= col("c.vec_id")))
    }),

    // Same rows as ss_bruteforce_topk, but via the bounded-heap
    // TopKAggregator UDAF instead of a window sort: each partial
    // aggregate keeps exactly K candidates and heaps merge, so a group
    // with a million candidates shuffles K rows, not a million — the
    // scale path for grouped top-k (window row_number materializes and
    // sorts every partition's rows first). Ordering matches the window
    // form exactly: rounded cos desc, vec_id asc.
    "ss_topk_agg" -> ((s, dir) => {
      val v = vecs(s, dir)
      val q = v.filter(col("vec_id") < NumQueries)
      val scored = broadcast(q).as("q")
        .join(v.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(
          col("q.vec_id").as("query_id"),
          col("c.vec_id").as("cand_id"),
          round(dot(col("q.e"), col("c.e")) / (col("q.nrm") * col("c.nrm")), 4).as("cos"))
      val topkAgg = udaf(new graft.functions.TopKAggregator(K))
      scored.groupBy("query_id")
        .agg(topkAgg(col("cand_id"), col("cos")).as("tk"))
        .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("query_id"), col("e._1").as("vec_id"), col("e._2").as("cos"),
          (col("pos") + 1).cast("int").as("rn"))
        .orderBy("query_id", "rn")
    })
  )

  private val vSql = OracleSql.vectors

  private def topkSql(joinCond: String) =
    s"""WITH v AS ($vSql)
       |SELECT query_id, vec_id, cos, CAST(rn AS INT) AS rn FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |    round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4) AS cos,
       |    row_number() OVER (
       |      PARTITION BY q.vec_id
       |      ORDER BY round(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 4) DESC,
       |               c.vec_id ASC) AS rn
       |  FROM (SELECT * FROM v WHERE vec_id < $NumQueries) q
       |  JOIN v c ON $joinCond)
       |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "ss_bruteforce_topk" -> topkSql("q.vec_id <> c.vec_id"),
    "ss_lsh_topk" -> topkSql("q.bucket = c.bucket AND q.vec_id <> c.vec_id"),
    // Aggregated top-k must produce exactly the window form's rows.
    "ss_topk_agg" -> topkSql("q.vec_id <> c.vec_id")
  )
}

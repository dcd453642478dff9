package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the verified near-dup pair graph
  * ([[Dedup.verifiedPairs]]): PageRank centrality (which documents are
  * the "hubs" of duplication — boilerplate detectors rank by exactly
  * this) and triangle counting (local clustering: near-dup communities
  * are quasi-cliques, so triangle density is the health metric of the
  * LSH threshold choice).
  *
  * Both are join+aggregate dataflows — no graph library, no driver-side
  * adjacency: at 100 TB the edge list is just another table. PageRank
  * mass is carried as integer micro-units (Σ initial mass = 10⁶):
  * every operation is an integer add / multiply / truncating divide,
  * identical in any engine — the standard float PageRank would diverge
  * across summation orders, this one cannot.
  */
object GraphQueries {

  val Iters = 3          // fixed PageRank rounds (diagnostic centrality,
                         //  not a convergence chase)
  val DampMicro = 850000 // d = 0.85 in micro-units
  val JumpMicro = 150000 // (1 - d)

  /** PageRank over an undirected edge list: each round,
    * pr'(v) = (1-d)/N + d · Σ_{u∈N(v)} pr(u)/deg(u), all in integer
    * micro-units with truncating division. Edges are materialized once
    * (`localCheckpoint`) — the verify pipeline upstream must not re-run
    * per round; each round is one join + one aggregation keyed by the
    * destination, the same shape GraphX/Pregel lowers to.
    */
  def pageRankMicro(pairs: DataFrame, iters: Int = Iters): DataFrame = {
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    val n = deg.agg(count(lit(1)).as("n_nodes"))
    // Undirected graph ⇒ no dangling nodes: every node has deg ≥ 1 and
    // receives at least one contribution, so the left join below only
    // guards the types, never fabricates mass.
    var pr = deg.crossJoin(broadcast(n))
      .select(col("id"), col("deg"), col("n_nodes"),
        expr("1000000 DIV n_nodes").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(pr, edges("src") === pr("id"))
        .select(edges("dst").as("id"), expr("pr DIV deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("cs"))
      pr = pr.select("id", "deg", "n_nodes")
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("deg"), col("n_nodes"),
          (expr(s"$JumpMicro DIV n_nodes") +
            expr(s"($DampMicro * coalesce(cs, 0)) DIV 1000000")).as("pr"))
    }
    pr.select(col("id"), col("pr"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dd_pagerank" -> ((s, dir) =>
      pageRankMicro(
        Dedup.verifiedPairs(s, dir, dedup = true).select("doc_a", "doc_b"))
        .select(col("id").as("doc_id"), col("pr").as("pr_micro"))
        .orderBy("doc_id")),

    // Triangle count via the canonical two-join dataflow: pairs are
    // already oriented (doc_a < doc_b), so wedges a<b<c are generated
    // once and closed by one membership join — never an all-pairs
    // product; cost is Σ deg(v)² over the (similarity-bounded) graph.
    "dd_triangles" -> ((s, dir) => {
      val e = Dedup.verifiedPairs(s, dir, dedup = true)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
        .localCheckpoint(true)
      e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
        .as("w")
        .join(e.as("e3"),
          col("w.a") === col("e3.a") && col("w.c") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
    })
  )

  private def prRoundSql(prev: String, next: String): String =
    s"""$next AS (
       |  SELECT d.id, d.deg,
       |    $JumpMicro // (SELECT n_nodes FROM n)
       |      + ($DampMicro * COALESCE(c.cs, 0)) // 1000000 AS pr
       |  FROM deg d LEFT JOIN (
       |    SELECT e.dst AS id, sum(p.pr // p.deg) AS cs
       |    FROM edges e JOIN $prev p ON e.src = p.id
       |    GROUP BY e.dst) c ON d.id = c.id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "dd_pagerank" ->
      s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |deg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n_nodes FROM deg),
         |pr0 AS (
         |  SELECT id, deg, 1000000 // (SELECT n_nodes FROM n) AS pr FROM deg),
         |${prRoundSql("pr0", "pr1")},
         |${prRoundSql("pr1", "pr2")},
         |${prRoundSql("pr2", "pr3")}
         |SELECT id AS doc_id, CAST(pr AS BIGINT) AS pr_micro
         |FROM pr3 ORDER BY doc_id""".stripMargin,
    "dd_triangles" ->
      s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql}),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs)
         |SELECT count(*) AS n_triangles
         |FROM e e1
         |JOIN e e2 ON e1.b = e2.a
         |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin
  )
}

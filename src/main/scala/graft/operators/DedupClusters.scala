package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Pairs → clusters: the last stage of a real dedup pipeline. Verified
  * near-dup pairs (LSH → exact-Jaccard, [[Dedup]]) form an undirected
  * graph; each connected component is one duplicate cluster, and the
  * canonical representative is the minimum doc_id in the component
  * (deterministic "keep first").
  *
  * Spark-first algorithm: iterative min-label propagation —
  * `label(v) ← min(label(v), min over neighbors of label(u))` until a
  * fixpoint, which is exactly the component minimum. Each iteration is
  * one shuffle-join + one aggregation on the (tiny relative to the
  * corpus) edge set; the edge set is persisted once, and label lineage
  * is cut per iteration with `localCheckpoint` so the plan doesn't grow
  * exponentially. Near-dup clusters are dense (quasi-cliques), so the
  * effective diameter — and the iteration count — is small; on a
  * 100 TB corpus with adversarially long chains, swap the loop body for
  * the large-star/small-star contractions (Kiveris et al., "Connected
  * Components in MapReduce and Beyond"), which keeps the same
  * join+min shape but converges in O(log²) rounds.
  */
object DedupClusters {

  /** (id, label) per node of `pairs` (cols doc_a < doc_b); label = min
    * doc_id reachable in the component.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // Both edge directions in ONE pass over `pairs` (a union of two
    // selects would execute the upstream pair pipeline twice), then
    // persist: the edge set is re-joined every iteration.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels: DataFrame = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // Round 1 needs no node table and no join: every node appears as
      // `src` (edges are bidirectional), so label₁(v) = min(v, min
      // neighbor id) is ONE aggregation over the edge set — it also
      // subsumes the identity-label initialization (saving the
      // init-distinct job the loop used to pay up front). Later rounds
      // gather lbl(v) ← min(label(v), label(u) for u ∈ N(v)) as a
      // single union+min aggregation: incoming rows cover every
      // neighbor, and the node's own row both joins the min and
      // carries the previous label out for the convergence check — no
      // separate left join. Dense near-dup clusters converge in two
      // rounds (propagate + confirm, the minimum — measured via
      // GRAFT_CC_DEBUG); adversarially long chains take O(diameter),
      // where the documented upgrade is pointer jumping
      // (label ← label(label)) or the large-star/small-star
      // contraction — same join+min round shape, O(log) rounds.
      val gathered =
        if (iter == 0)
          edges.groupBy(col("src"))
            .agg(min(col("dst")).as("nmin"))
            .select(col("src").as("id"),
              least(col("src"), col("nmin")).as("label"),
              col("src").as("old"))
        else
          edges.join(labels, edges("dst") === labels("id"))
            .select(col("src").as("id"), col("label").as("cand"))
            .withColumn("own", lit(false))
            .unionByName(labels.select(col("id"), col("label").as("cand"))
              .withColumn("own", lit(true)))
            .groupBy("id")
            .agg(min(col("cand")).as("label"),
              max(when(col("own"), col("cand"))).as("old"))
      // Adaptive pointer jumping: still unconverged at round 3 means
      // the graph has real chains (a clique family finishes in 2
      // rounds), so from here each round also applies
      // label(v) ← label(label(v)) — a self-join on the node-sized
      // label table. Labels are node ids of the same component, so the
      // lookup stays in-component; gather+jump doubles effective reach
      // per round → O(log diameter) rounds, and maxIters = 25 covers
      // diameters past 2^20 instead of 25.
      val jumped =
        if (iter < 2) gathered
        else gathered.as("x")
          .join(gathered.as("y"), col("x.label") === col("y.id"), "left")
          .select(col("x.id").as("id"),
            coalesce(col("y.label"), col("x.label")).as("label"),
            col("x.old").as("old"))
      // the lazy localCheckpoint caches `next` as a side effect of
      // count() (count computes every partition, unlike isEmpty), so
      // each round costs exactly one job
      val next = jumped.localCheckpoint(false)
      // Round 1 of a nonempty edge set ALWAYS changes labels (each
      // pair's larger endpoint drops to the smaller), so its
      // convergence job is skipped — round 2's action materializes the
      // round-1 checkpoint as part of its lineage (block-level compute
      // locks keep the doubly-referenced label table computed once).
      if (iter > 0)
        converged = next.filter(col("label") =!= col("old")).count() == 0
      labels = next.select("id", "label")
      iter += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] converged after $iter rounds")
    edges.unpersist()
    // An unconverged result is silently WRONG (labels are not yet
    // component minima) — fail loudly instead. With pointer jumping,
    // maxIters = 25 covers any realistic diameter, so hitting this
    // means something is genuinely broken.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds")
    labels
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Duplicate clusters from the LSH→verify pairs (jaccard ≥ 0.5):
    // every doc appearing in a verified pair, labeled with its
    // component's minimum doc_id, plus the component size.
    "dd_clusters" -> ((s, dir) => {
      // CC is multiplicity-blind and order-blind → feed it the
      // unsorted, un-deduped verified pairs (two fewer exchanges than
      // the presentation-form query). cluster_size via a window count
      // over the label partition: one shuffle by label instead of a
      // size aggregation plus a join back (label groups are duplicate
      // clusters — bounded small, no window-skew concern).
      import org.apache.spark.sql.expressions.Window
      val pairs = Dedup.verifiedPairs(s, dir, dedup = false)
        .select("doc_a", "doc_b")
      connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          count(lit(1)).over(Window.partitionBy(col("label"))).as("cluster_size"))
        .orderBy("doc_id")
    }),

    // The end product of the dedup pipeline: the cleaned corpus. Keep
    // every doc that is not a non-representative member of a near-dup
    // cluster (representative = component minimum). One anti-join
    // against the (tiny relative) victim set — the corpus never
    // shuffles by anything but its own partitioning.
    // Degree histogram of the verified near-dup graph — the health
    // check run before clustering: a fat tail (hub documents paired
    // with everything) flags boilerplate that should have died in
    // exact dedup, and predicts CC round counts. Two small
    // aggregations over the pair list.
    "dd_degree_hist" -> ((s, dir) => {
      // distinct pairs (degree must not double-count a pair seen in
      // two bands) but no presentation sort — the histogram re-sorts
      Dedup.verifiedPairs(s, dir, dedup = true)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_docs"))
        .orderBy("degree")
    }),

    "dd_survivors" -> ((s, dir) => {
      val pairs = Dedup.verifiedPairs(s, dir, dedup = false)
        .select("doc_a", "doc_b")
      val victims = connectedComponents(pairs)
        .filter(col("id") =!= col("label"))
        .select(col("id"))
      Tables.documents(s, dir)
        .join(victims, Tables.documents(s, dir)("doc_id") === victims("id"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // Same clusters from first principles: transitive closure with a
    // recursive CTE (UNION, not UNION ALL — dedup makes cycles
    // terminate), component id = min reachable doc_id.
    "dd_clusters" ->
      s"""WITH RECURSIVE pairs AS (${Dedup.ngramJaccardPairsSql}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
         |comp AS (
         |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         |SELECT a.id AS doc_id, a.cluster_id,
         |  b.cluster_size
         |FROM comp a
         |JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1) b
         |  USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "dd_degree_hist" ->
      s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql}),
         |deg AS (
         |  SELECT id, count(*) AS degree FROM (
         |    SELECT doc_a AS id FROM pairs
         |    UNION ALL
         |    SELECT doc_b AS id FROM pairs)
         |  GROUP BY id)
         |SELECT degree, count(*) AS n_docs FROM deg
         |GROUP BY degree ORDER BY degree""".stripMargin,
    // Survivors = all docs minus non-representative cluster members.
    "dd_survivors" ->
      s"""WITH RECURSIVE pairs AS (${Dedup.ngramJaccardPairsSql}),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src),
         |comp AS (
         |  SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
         |ORDER BY doc_id""".stripMargin
  )
}

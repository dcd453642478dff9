package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 verdict #4 — the ANN index persistence lifecycle:
  * ss_ivf_persist_build publishes the trained IVF + PQ codebooks as
  * parquet index tables; ss_ivf_persist_search serves from the
  * READ-BACK tables with zero training in its lineage.
  */
class IvfPersistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  test("build publishes the three index tables; census is non-empty") {
    val build = SparkEntry.queries("ss_ivf_persist_build")(spark, dir)
    assert(build.count() > 0)
    // the engine's absolute anchor (graft.index.root prop / tmpdir) —
    // resolved the same way Similarity.indexRoot does, so this spec
    // keeps passing regardless of the launching CWD
    val root = sys.props.getOrElse("graft.index.root",
      s"${System.getProperty("java.io.tmpdir")}/graft_index") +
      "/" + dir.replaceAll("[^A-Za-z0-9._-]", "_")
    for (t <- Seq("centroids", "assignments", "pq_codebook"))
      assert(new java.io.File(s"$root/$t").isDirectory, s"missing index table $t")
    // the assignment is partitioned BY CELL — the physical layout that
    // lets a single-probe search read one partition directory
    val cells = new java.io.File(s"$root/assignments").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cent_id="))
    assert(cells.nonEmpty, "assignments not partitioned by cent_id")
  }

  test("read-back search is row-identical to the in-session search") {
    val persisted = SparkEntry.queries("ss_ivf_persist_search")(spark, dir)
    val live = SparkEntry.queries("ss_ivf_search")(spark, dir)
    assert(persisted.collect().toSeq == live.collect().toSeq,
      "persisted-index search diverged from the live-trained search")
  }

  test("no training in the persisted search's lineage (plan-pinned)") {
    val plan = SparkEntry.queries("ss_ivf_persist_search")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_index"),
      "persisted search does not scan the published index tables")
    // Lloyd rounds surface as checkpointed-RDD scans (lloydRounds
    // localCheckpoints each round); a serving-tier plan must be pure
    // parquet scans + joins
    assert(!plan.contains("ExistingRDD"),
      "training lineage (checkpointed RDD scan) leaked into the " +
        "persisted-index search plan")
  }
}

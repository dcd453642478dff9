package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Round-9 session additions: the real-binary-file multimodal leg. */
class Round13OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("mm_png_files: genuine PNG files on disk, lossless chain, clusters consistent") {
    val rows = run("mm_png_files").collect()
    assert(rows.nonEmpty)
    // the landing dir must now hold real .png files with the PNG magic
    val root = Paths.get(System.getProperty("java.io.tmpdir"))
    val landing = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith("graft_mm_")).toSeq
    assert(landing.nonEmpty, "no graft_mm_ landing dir written")
    val pngs = landing.flatMap(d => Files.walk(d).iterator().asScala
      .filter(_.toString.endsWith(".png")).toSeq)
    assert(pngs.nonEmpty, "no .png files on disk")
    val magic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    pngs.take(5).foreach { p =>
      val head = Files.readAllBytes(p).take(4)
      assert(head.sameElements(magic), s"$p lacks the PNG signature")
    }
    // file count equals the md5-prefix subset size = output row count
    assert(pngs.size >= rows.length)
    // cluster sanity: sizes >= 1, singleton docs label themselves
    rows.foreach { r =>
      val docId = r.getLong(r.fieldIndex("doc_id"))
      val cid = r.getLong(r.fieldIndex("cluster_id"))
      val size = r.getLong(r.fieldIndex("cluster_size"))
      assert(size >= 1L)
      if (size == 1L) assert(cid == docId)
      assert(cid <= docId || size > 1L)
    }
    // every member of a multi-doc cluster shares its cluster minimum
    val byCluster = rows.groupBy(_.getLong(rows.head.fieldIndex("cluster_id")))
    byCluster.foreach { case (cid, members) =>
      assert(cid == members.map(_.getLong(members.head.fieldIndex("doc_id"))).min)
    }
  }
}

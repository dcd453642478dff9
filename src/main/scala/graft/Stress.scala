package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: amplifies the sf0.1 testdata N× into a temp
  * dir (ids offset per copy so keys stay unique where they should, and
  * texts become exact dup groups of size N — the dup-heavy-corpus worst
  * case for the dedup family), then runs the REAL SparkEntry queries
  * against it and prints per-query wall-clock. Usage:
  * `runMain graft.Stress [factor] [queries...]`.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("wordcount", "q1_agg", "q_join_large", "ta_tfidf",
        "dd_exact", "dd_minhash", "dd_ngram_jaccard", "dd_embed_multiprobe",
        "dd_clusters", "ev_range_join", "pipe_pack_sequences",
        "ss_bruteforce_topk", "pipe_clean_corpus")
    val src = "/root/testdata/sf0.1"
    val dst = java.nio.file.Files.createTempDirectory("graft_stress").toString
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-stress")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def amplify(name: String, idCols: Seq[String]): Unit = {
      val base = Tables.load(spark, src, name)
      val copies = (0 until factor).map { i =>
        idCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(i.toLong * 100000000L)))
      }
      copies.reduce(_.union(_)).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    amplify("documents", Seq("doc_id"))
    amplify("embeddings", Seq("vec_id"))
    amplify("lineitem", Seq("l_orderkey"))
    amplify("orders", Seq("o_orderkey"))
    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    // events: ts is ns-long in the raw file; copy as-is
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.load(spark, src, "events").write.mode("overwrite").parquet(s"$dst/events.parquet")

    println(s"STRESS factor=$factor dir=$dst docs=" +
      spark.read.parquet(s"$dst/documents.parquet").count())
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = try SparkEntry.queries(n)(spark, dst).count()
      catch { case e: Throwable => System.err.println(s"$n FAILED: ${e.getMessage}"); -1L }
      println(f"STRESS $n rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}

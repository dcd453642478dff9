package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: print formatted physical plans for selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.last else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.dropRight(1).toSeq
      else Seq("q_filter_project", "q_join_broadcast", "wordcount", "q1_agg",
        "ev_asof_order", "ev_range_join", "dd_minhash", "dd_simhash64_pairs",
        "q_ntile", "ss_topk_agg")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

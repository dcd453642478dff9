package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: warm + timed run of selected queries on a given sf dir
  * (`runMain graft.TimeQ <sfDir> <query>...`) — the per-query feedback
  * loop between full Bench runs.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    args.drop(1).foreach { q =>
      SparkEntry.queries(q)(spark, dir).count() // warm
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"TIME $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}

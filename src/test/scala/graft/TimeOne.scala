package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timer for local plan iteration (test scope only). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args(0).split(',')) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).collect().length
      println(f"TIMED $q ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    SparkEntry.releaseCaches()
    spark.stop()
  }
}

package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-process A/B of the portable-LSH signature builds: native expression
  * vs the interpreted HOF chain it replaced (same session, warm JIT,
  * alternating reps). Test-scope utility, not part of the driver contract.
  * Run: sbt "Test/runMain graft.Md5AbBench /root/testdata/sf0.1" */
object Md5AbBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), T.wordShinglesNative(col("text"), 3).as("shs"))
      .filter(size(col("shs")) > 0)
      .persist()
    docs.count()
    val numHashes = 32; val numDigests = (numHashes + 3) / 4
    val hofMinhash = {
      val hs = transform(col("shs"), g =>
        array((0 until numDigests).map(s => md5(concat(lit(s + ":"), g))): _*))
      array((0 until numHashes).map { i =>
        array_min(transform(hs, h =>
          substring(element_at(h, i / 4 + 1), 1 + 8 * (i % 4), 8)))
      }: _*)
    }
    val hofSimhash = {
      val packExpr = transform(col("shs"), g =>
        conv(substring(md5(g), 1, 8), 16, 10).cast("long"))
      concat((0 until 32).map { j =>
        val vote = aggregate(packExpr, lit(0), (acc, v) =>
          acc + (shiftright(v, 31 - j).bitwiseAND(lit(1L)).cast("int") * 2 - 1))
        when(vote > 0, "1").otherwise("0")
      }: _*)
    }
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      docs.select(c.as("x")).selectExpr("count(x)").collect()
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("minhash HOF", hofMinhash)
      time("minhash native", T.md5MinhashNative(col("shs"), numHashes))
      time("simhash HOF", hofSimhash)
      time("simhash native", T.md5SimhashNative(col("shs")))
    }
    spark.stop()
  }
}

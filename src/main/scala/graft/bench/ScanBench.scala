package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes extraction throughput: scan-only vs scan+kernel at two
  * parallelism levels — tells whether the scaling knee is the parquet
  * scan or the conversion kernel.
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.nonEmpty) args(0) else "/tmp/graft_bench/transcripts_400000"
    Seq(4, 8, 16, 32).foreach { cpus =>
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      def time(tag: String)(f: => Unit): Unit = {
        f // warm
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[scanbench] cpus=$cpus $tag%-12s ${samples.min}%.2fs")
      }
      val df = spark.read.parquet(corpus)
      time("scan")(df.agg(sum(length(col("text")))).collect())
      time("scan+kernel")(
        graft.extract.ExtractPipeline.overTranscripts(df)
          .agg(sum(length(col("markdown")))).collect())
      spark.stop()
    }
  }
}

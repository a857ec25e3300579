package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** scratch diagnostic: where does ann_ivf wall time go? */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val q = t("queryVec")(graft.Queries.queryVec(spark, dir))
      val cents = t("centroids")(graft.rag.AnnIvf.centroids(emb))
      val probes = t("probeCells")(graft.rag.AnnIvf.probeCells(q, cents))
      t("cellFilter+topk") {
        graft.rag.TopK.search(
          emb.filter(graft.rag.AnnIvf.cellCol(col("embedding"), cents)
            .isin(probes: _*)), q, 10).count()
      }
      t("cellCol project only") {
        emb.select(graft.rag.AnnIvf.cellCol(col("embedding"), cents).as("c"))
          .groupBy("c").count().count()
      }
      t("kmeansCentroids")(graft.rag.AnnIvf.kmeansCentroids(emb))
    }
    spark.stop()
  }
}

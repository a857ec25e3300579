package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is batch-only and the
  * north rule is batch spark-submit (SURVEY.md §2.6), so nothing in
  * the correctness gate depends on streaming — this module exists to
  * show the same dataflow runs incrementally: the event-time windowed
  * aggregate (the streaming analog of the `window_agg` query) and the
  * extraction map over a stream of turns.
  */
object StreamingOps {

  /** watermarked tumbling-window event aggregate over a parquet
    * directory stream — identical result columns to `window_agg`.
    */
  def eventWindowCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      // event-time must be TIMESTAMP (with zone); parquet may carry NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("total_micros"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("total_micros"))
  }

  /** the extraction map as a stream: stateless, so it runs in append
    * mode with no state store — turns arrive, markdown leaves.
    */
  def extractStream(spark: SparkSession, transcriptsDir: String): DataFrame = {
    val schema = spark.read.parquet(transcriptsDir).schema
    graft.extract.ExtractPipeline.overTranscripts(
      spark.readStream.schema(schema).parquet(transcriptsDir))
  }
}

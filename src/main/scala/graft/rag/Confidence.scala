package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic confidence scoring
  * (/root/reference/src/rag_engine/llm_integration.py:241-275):
  * mean of three clamped factors — chunk count, context length,
  * keyword relevance — all plain column arithmetic (no UDF).
  */
object Confidence {

  /** relevance of one chunk text to a query: any query word is a
    * substring of lower(content) (llm_integration.py:265-271).
    */
  def chunkRelevant(content: Column, query: String): Column =
    query.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .map(w => lower(content).contains(w))
      .reduceOption(_ || _).getOrElse(lit(false))

  /** Per-single-chunk-context confidence (each row = its own context):
    * chunk_factor = min(1, 1*0.2); length + relevance per row.
    */
  def perRow(content: Column, query: String): Column = {
    val chunkFactor = least(lit(1.0), lit(0.2))
    val lengthFactor = least(lit(1.0), length(content) / lit(1000.0))
    val relevanceFactor = when(chunkRelevant(content, query), 1.0).otherwise(0.0)
    least(lit(1.0), greatest(lit(0.0),
      (chunkFactor + lengthFactor + relevanceFactor) / lit(3.0)))
  }

  /** Whole-context confidence over a set of retrieved chunks →
    * one row (n_chunks, confidence). Matches _calculate_confidence
    * over k chunks.
    */
  def overChunks(chunks: DataFrame, contentCol: String, query: String): DataFrame = {
    val agg = chunks.agg(
      count(lit(1)).as("n_chunks"),
      sum(length(col(contentCol))).as("total_length"),
      sum(when(chunkRelevant(col(contentCol), query), 1).otherwise(0))
        .as("relevant"))
    agg.select(
      col("n_chunks"),
      least(lit(1.0), greatest(lit(0.0),
        (least(lit(1.0), col("n_chunks") * lit(0.2)) +
          least(lit(1.0), col("total_length") / lit(1000.0)) +
          least(lit(1.0), col("relevant") / col("n_chunks").cast("double"))) / lit(3.0)))
        .as("confidence"))
  }
}

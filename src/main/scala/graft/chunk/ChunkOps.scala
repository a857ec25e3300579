package graft.chunk

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark wiring of the chunking kernel — a flatMap per document, no
  * shuffle (SURVEY.md §2.3: "perfectly parallel across documents").
  * At 100 TB this stage is bound purely by scan + CPU; partitioning is
  * inherited from the input splits.
  */
object ChunkOps {

  private val chunker = new Chunker(maxTokens = 512, overlapTokens = 50)

  private def chunkWith(df: DataFrame, f: (String, String) => Vector[Chunk])
      : Dataset[Chunk] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("document").cast("string"), col("text").cast("string"))
      .as[(String, String)]
      .flatMap { case (document, text) => f(text, document) }
  }

  /** Normalize any (idCol → document, textCol → text) frame. */
  private def named(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(concat(lit("doc-"), col(idCol)).as("document"),
      col(textCol).as("text"))

  def sections(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[Chunk] =
    chunkWith(named(docs, idCol, textCol), chunker.chunkBySections)

  def byTokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[Chunk] =
    chunkWith(named(docs, idCol, textCol), chunker.chunkByTokens)

  def byAtCommands(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Dataset[Chunk] =
    chunkWith(named(docs, idCol, textCol), chunker.chunkByAtCommands)

  /** K5 metadata as pure Column expressions (no UDF — stays inside
    * whole-stage codegen): the per-chunk enrichment projected
    * directly over a text column. Mirrors `_create_chunk`
    * (chunking.py:232-252).
    */
  def metaColumns(text: org.apache.spark.sql.Column): Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "token_count" -> size(regexp_extract_all(text, lit(Tokenizer.TokenRegex), lit(0))),
    "at_commands" -> array_join(regexp_extract_all(text, lit("AT\\+[A-Z0-9]+"), lit(0)), ", "),
    "at_command_count" -> size(regexp_extract_all(text, lit("AT\\+[A-Z0-9]+"), lit(0))),
    "has_code_blocks" -> text.contains("```"),
    "has_tables" -> (text.contains("|") && text.contains("\n")))
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.ExtractPipeline
import graft.gen.TranscriptGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 run over
  * the driver-provided tables at `sfDir`; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-compare gate. Operators whose
  * semantics DuckDB cannot express (the golden-fixture extraction
  * equality) are registered without an oracle → rows-only check.
  */
object SparkEntry {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ExtractPipeline.overDocuments(docs(spark, "/root/testdata/sf0.001"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C1–C11: conversion core over the documents table (plain-text
    // payloads → single-paragraph markdown; the structured-payload
    // path is exercised by golden_extract below + ScalaTest)
    "extract_markdown" -> ((s, dir) =>
      ExtractPipeline.overDocuments(docs(s, dir))
        .select(col("doc_id"), col("markdown"))),

    // C13: batch summary aggregation (converter.py:276-293)
    "summary_counts" -> ((s, dir) =>
      ExtractPipeline.summary(ExtractPipeline.overDocuments(docs(s, dir)))),

    // North-rule correctness gate: per-turn text equality of the
    // extraction kernel vs golden, over the seeded transcript fixture
    // (FIXTURES.md). Output: one row with totals; mismatches must be 0.
    "golden_extract" -> ((s, _) => Queries.goldenExtract(s, numConvs = 200))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "extract_markdown" ->
      "SELECT doc_id, text || chr(10) AS markdown FROM documents",
    "summary_counts" ->
      ("SELECT count(*) FILTER (WHERE text IS NOT NULL AND text <> '') AS successful, " +
        "count(*) FILTER (WHERE text IS NULL OR text = '') AS failed, " +
        "count(*) AS total FROM documents")
  )
}

/** Query implementations too large for inline lambdas. */
object Queries {

  /** Distributed fixture generation → extraction → equality join vs
    * golden. The join is 1:1 on (conv_id, turn_idx); at scale both
    * sides share the generator's partitioning so AQE plans a
    * shuffle-local join; here cardinality is small.
    */
  def goldenExtract(spark: SparkSession, numConvs: Int): DataFrame = {
    import spark.implicits._
    val convs = spark.range(0, numConvs)
    val transcripts = convs.flatMap(i => TranscriptGen.genConv(42L, i)._1)
    val golden = convs.flatMap(i => TranscriptGen.genConv(42L, i)._2)
      .toDF().withColumnRenamed("markdown", "golden_md")
    val extracted = ExtractPipeline.overTranscripts(transcripts.toDF())
    extracted.join(golden, Seq("conv_id", "turn_idx"))
      .agg(
        count(lit(1)).as("total_turns"),
        count(when(col("markdown") =!= col("golden_md"), 1)).as("mismatches"))
  }
}

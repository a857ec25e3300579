package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chunk.{ChunkOps, Tokenizer}
import graft.extract.ExtractPipeline
import graft.gen.TranscriptGen
import graft.store.{Ids, StoreOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 run over
  * the driver-provided tables at `sfDir`; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-compare gate. Operators whose
  * semantics DuckDB cannot express (golden-fixture extraction
  * equality, resume manifest protocol) are registered without an
  * oracle → rows-only check, with full coverage in ScalaTest.
  */
object SparkEntry {

  private[graft] def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private[graft] def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ExtractPipeline.overDocuments(docs(spark, "/root/testdata/sf0.001"))

  /** Token regex shared by Spark queries and DuckDB oracles. */
  private val TokRe = Tokenizer.TokenRegex

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- conversion core C1–C13 ----
    "extract_markdown" -> ((s, dir) =>
      ExtractPipeline.overDocuments(docs(s, dir))
        .select(col("doc_id"), col("markdown"))),
    "summary_counts" -> ((s, dir) =>
      ExtractPipeline.summary(ExtractPipeline.overDocuments(docs(s, dir)))),
    "golden_extract" -> ((s, _) => Queries.goldenExtract(s, numConvs = 200)),

    // ---- chunking K1–K5 ----
    "chunk_sections" -> ((s, dir) => {
      val md = ExtractPipeline.overDocuments(docs(s, dir))
        .select(col("doc_id"), col("markdown").as("text"))
      ChunkOps.sections(md).toDF()
    }),
    "chunk_tokens" -> ((s, dir) => ChunkOps.byTokens(docs(s, dir)).toDF()),
    "chunk_at_commands" -> ((s, dir) => ChunkOps.byAtCommands(docs(s, dir)).toDF()),
    "chunk_meta" -> ((s, dir) => {
      val d = docs(s, dir)
      ChunkOps.metaColumns(col("text")).foldLeft(d.select(col("doc_id"), col("text"))) {
        case (acc, (name, c)) => acc.withColumn(name, c)
      }.drop("text")
    }),

    // ---- store / ids V5–V8, S7–S8 ----
    "doc_ids" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("document", concat(lit("doc-"), col("doc_id")))
      d.select(col("doc_id"), Ids.slugifyCol(col("document")).as("slug"),
        Ids.chunkKeyCol(col("document"), lit(0), col("text")).as("chunk_key"))
    }),
    "list_documents" -> ((s, dir) =>
      StoreOps.listDocuments(
        docs(s, dir).select(col("source").as("document"),
          col("lang").as("type"), col("source")),
        typeCol = "type", sourceCol = "source")),
    "paginate" -> ((s, dir) =>
      StoreOps.page(docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", offset = 100, limit = 50)),
    "delete_document" -> ((s, dir) =>
      StoreOps.deleteDocument(
        docs(s, dir).select(col("doc_id"), col("source").as("document")),
        "src0").select("doc_id")),
    "collection_count" -> ((s, dir) => StoreOps.collectionCount(docs(s, dir))),

    // ---- S10 resume: pending = domain ∖ manifest(done), left_anti ----
    "resume_pending" -> ((s, dir) => {
      val done = s.range(10).select(col("id").cast("int").as("partition_id"))
      docs(s, dir)
        .withColumn("partition_id", pmod(col("doc_id"), lit(16)).cast("int"))
        .join(done, Seq("partition_id"), "left_anti")
        .select("doc_id")
    })
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
        "count(*) AS total FROM documents"),
    "chunk_sections" ->
      (s"SELECT 'doc-'||doc_id||'_0' AS chunk_id, 'doc-'||doc_id AS document, " +
        "0 AS chunk_index, CAST(NULL AS VARCHAR) AS section, " +
        "text || chr(10) AS content, 0 AS start_char, 2 AS end_char, " +
        s"len(regexp_extract_all(text, '$TokRe')) AS token_count, " +
        "'' AS at_commands, 0 AS at_command_count, " +
        "false AS has_code_blocks, false AS has_tables FROM documents"),
    "chunk_tokens" ->
      (s"SELECT 'doc-'||doc_id||'_0' AS chunk_id, 'doc-'||doc_id AS document, " +
        "0 AS chunk_index, CAST(NULL AS VARCHAR) AS section, " +
        "trim(text) AS content, " +
        "length(text) - length(ltrim(text)) AS start_char, " +
        "length(rtrim(text)) AS end_char, " +
        s"len(regexp_extract_all(text, '$TokRe')) AS token_count, " +
        "'' AS at_commands, 0 AS at_command_count, " +
        "false AS has_code_blocks, false AS has_tables FROM documents"),
    "chunk_at_commands" ->
      (s"SELECT 'doc-'||doc_id||'_0' AS chunk_id, 'doc-'||doc_id AS document, " +
        "0 AS chunk_index, CAST(NULL AS VARCHAR) AS section, " +
        "text AS content, 0 AS start_char, 1 AS end_char, " +
        s"len(regexp_extract_all(text, '$TokRe')) AS token_count, " +
        "'' AS at_commands, 0 AS at_command_count, " +
        "false AS has_code_blocks, false AS has_tables FROM documents"),
    "chunk_meta" ->
      (s"SELECT doc_id, len(regexp_extract_all(text, '$TokRe')) AS token_count, " +
        "coalesce(array_to_string(regexp_extract_all(text, 'AT\\+[A-Z0-9]+'), ', '), '') AS at_commands, " +
        "len(regexp_extract_all(text, 'AT\\+[A-Z0-9]+')) AS at_command_count, " +
        "contains(text, '```') AS has_code_blocks, " +
        "(contains(text, '|') AND contains(text, chr(10))) AS has_tables " +
        "FROM documents"),
    "doc_ids" ->
      ("SELECT doc_id, " +
        "lower(trim(regexp_replace(regexp_replace('doc-'||doc_id, '[^\\w\\s-]', '_', 'g'), '[_\\s]+', '_', 'g'), '_')) AS slug, " +
        "substr(lower(trim(regexp_replace(regexp_replace('doc-'||doc_id, '[^\\w\\s-]', '_', 'g'), '[_\\s]+', '_', 'g'), '_')), 1, 30) " +
        "|| '_' || substr(sha256('doc-'||doc_id||'|0|'||substr(text,1,100)), 1, 16) AS chunk_key " +
        "FROM documents"),
    "list_documents" ->
      ("SELECT source AS document, min(lang) AS type, min(source) AS source, " +
        "count(*) AS chunk_count FROM documents GROUP BY source"),
    "paginate" ->
      "SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT 50 OFFSET 100",
    "delete_document" ->
      "SELECT doc_id FROM documents WHERE source <> 'src0'",
    "collection_count" ->
      "SELECT count(*) AS n FROM documents",
    "resume_pending" ->
      "SELECT doc_id FROM documents WHERE doc_id % 16 >= 10"
  )
}

/** Query implementations too large for inline lambdas. */
object Queries {

  /** North-rule correctness gate: distributed fixture generation →
    * extraction → equality join vs golden (FIXTURES.md §3). Output:
    * one row (total_turns, mismatches); mismatches must be 0.
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

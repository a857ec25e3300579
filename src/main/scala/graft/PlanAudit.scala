package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * scale audit: column pruning reaching the scan (ReadSchema),
  * predicate pushdown (PushedFilters), top-k as TakeOrderedAndProject
  * (not a global sort), broadcast joins for small dims, and
  * WholeStageCodegen span width.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("extract_markdown", "search_topk", "rag_query",
      "resume_pending", "dedup_minhash", "list_documents", "chunk_sections",
      "embed_neardup", "delete_document", "search_topk_filtered",
      "tpch_pricing", "tpch_top_orders", "tpch_region_stats", "ivf_assign",
      "ngram_jaccard", "simhash_pairs", "sessionize", "asof_join",
      "ann_ivfpq", "pq_encode", "decontaminate", "decontaminate_bloom",
      "mixture_sample", "normalize_text", "dedup_paragraphs",
      "repetition_stats",
      "distinctive_terms", "corpus_rollup", "group_percentiles",
      "quality_model", "mm_decode_ppm", "mm_decode_bmp", "mm_decode_wav",
      "compact_roundtrip", "snapshot_asof", "vocab_census",
      "dup_spans", "substring_dedup", "dup_spans_incremental",
      "domain_census", "domain_blocklist", "url_dedup", "bm25_search",
      "hybrid_search")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    // SQL-surface smoke: the custom expression through plain SQL
    GraftExtensions.register(spark)
    println("dot_product via SQL = " + spark.sql(
      "SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D))").head().getDouble(0))
    spark.stop()
  }
}

package graft.api

import org.apache.spark.sql.DataFrame
import graft.rag.HashEmbedder

/** Introspection surface of the reference's API layer —
  * `get_system_info` / `test_components`
  * (/root/reference/src/rag_engine/retrieval.py:199-243) and
  * `get_collection_info` (vector_store.py:181-196) — as typed values
  * over the engine's components. The LLM component is the same
  * deterministic stub as the query pipeline (SURVEY §2.4: confidence
  * is computed, generation is out of scope in a hermetic engine), so
  * its self-test reports the stub's availability, exactly like the
  * reference reports `test_connection()`.
  */
object SystemInfo {

  final case class CollectionInfo(
      collection_name: String,
      document_count: Long,
      db_path: String)

  final case class ComponentTests(
      embedding_model: Boolean,
      llm: Boolean,
      vector_store: Boolean)

  final case class Info(
      engine_version: String,
      embedding_model: String,
      embedding_dim: Int,
      llm_model: String,
      vector_store: CollectionInfo)

  /** vector_store.py:181-196 — name, count, path. */
  def collectionInfo(chunks: DataFrame, name: String, path: String): CollectionInfo =
    CollectionInfo(name, chunks.count(), path)

  /** retrieval.py:199-210. */
  def systemInfo(chunks: DataFrame, collectionName: String, path: String): Info =
    Info(
      engine_version = "1.0.0",
      embedding_model = s"feature-hashing(sha256, dim=${HashEmbedder.Dim})",
      embedding_dim = HashEmbedder.Dim,
      llm_model = "deterministic-confidence-stub",
      vector_store = collectionInfo(chunks, collectionName, path))

  /** retrieval.py:212-243 — each component exercised, failures caught. */
  def testComponents(chunks: DataFrame): ComponentTests = {
    val emb =
      try HashEmbedder.embed("test").nonEmpty
      catch { case _: Exception => false }
    val llm =
      try {
        import org.apache.spark.sql.functions.lit
        graft.rag.Confidence.perRow(lit("test"), "test") != null
      } catch { case _: Exception => false }
    val store =
      try { chunks.count(); true }
      catch { case _: Exception => false }
    ComponentTests(emb, llm, store)
  }
}

package graft.store

import org.apache.spark.sql.{functions, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators of the vector store re-expressed
  * relationally (SURVEY.md §2.1, §2.4). The backing "collection" is a
  * partitioned parquet table of chunks; every op is a plain Catalyst
  * plan so pushdown/pruning stay free.
  */
object StoreOps {

  /** V5 — collection count (vector_store.py:181-196). */
  def collectionCount(chunks: DataFrame): DataFrame =
    chunks.agg(functions.count(lit(1)).as("n"))

  /** V6 — `list_documents` (vector_store.py:198-264): group chunks by
    * document, per-doc representative metadata + chunk_count. The
    * reference takes the dict-iteration "first"; a distributed engine
    * needs a deterministic representative → min().
    * One hash aggregate, map-side partial combine, no sort.
    */
  def listDocuments(chunks: DataFrame, typeCol: String = "type",
      sourceCol: String = "source"): DataFrame =
    chunks.groupBy(col("document")).agg(
      min(col(typeCol)).as("type"),
      min(col(sourceCol)).as("source"),
      functions.count(lit(1)).as("chunk_count"))

  /** S7 — paginated scan (vector_store.py:198-264 get() loop): only an
    * API-parity surface; in Spark the primitive is the full scan.
    * Deterministic page = ORDER BY key LIMIT n OFFSET m.
    */
  def page(chunks: DataFrame, orderCol: String, offset: Int, limit: Int): DataFrame =
    chunks.orderBy(col(orderCol)).offset(offset).limit(limit)

  /** S8 — filtered delete (vector_store.py:284-308): parquet has no
    * row-level delete, so the op is the retained-set rewrite (the
    * Iceberg `DELETE FROM ... WHERE document = ?` drop-in is isolated
    * here).
    */
  def deleteDocument(chunks: DataFrame, document: String): DataFrame =
    chunks.filter(col("document") =!= lit(document))

  /** S6 — append sink with the reference's dedup-on-id semantics
    * (vector_store.py:66-114 upsert behavior): new batch wins on
    * chunk_id collision.
    */
  def appendDedup(existing: DataFrame, batch: DataFrame): DataFrame =
    batch.unionByName(
      existing.join(batch.select("chunk_id"), Seq("chunk_id"), "left_anti"))
}

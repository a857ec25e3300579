package graft.rag

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** V2/V3 — cosine similarity (/root/reference/src/rag_engine/
  * embeddings.py:76-134): normalize + dot, zero-norm → 0.0.
  *
  * Pure higher-order-function Column expression — no UDF, stays inside
  * whole-stage codegen, and the strict left-to-right `aggregate` fold
  * is bit-reproducible against the DuckDB oracle's `list_reduce`.
  */
object Similarity {

  /** native codegen'd dot (VectorExprs) — identical fold order to the
    * HOF form `aggregate(zip_with(a,b,_*_), 0.0, _+_)`, ~10x faster on
    * pair joins.
    */
  def dot(a: Column, b: Column): Column =
    VectorExprs.dotProduct(a.cast("array<double>"), b.cast("array<double>"))

  def norm(a: Column): Column = {
    val ad = a.cast("array<double>")
    sqrt(VectorExprs.dotProduct(ad, ad))
  }

  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }
}

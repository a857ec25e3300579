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

  private def fold(xs: Column): Column =
    aggregate(xs, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    fold(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y))

  def norm(a: Column): Column =
    sqrt(fold(transform(a.cast("array<double>"), x => x * x)))

  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }
}

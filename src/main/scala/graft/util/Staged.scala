package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explode an EXPENSIVE array expression with the kernel evaluated
  * exactly once per input row.
  *
  * A plain `select(..., explode(kernel(text)))` triggers Catalyst's
  * `InferFiltersFromGenerate`, which inserts
  * `size(child) > 0 AND isnotnull(child)` under the Generate; predicate
  * pushdown then substitutes the staging alias away, so the generator
  * child — here a native kernel over the full document text — is
  * evaluated THREE times per row (twice in the filter, once in the
  * projection; FilterExec has no subexpression elimination). Measured
  * on the decontaminate plan: the shingle kernel appeared in both the
  * pushed-down filter condition and the projection.
  *
  * `explode_outer` infers no such filter. The rows it keeps for
  * null/empty arrays (a single all-null generator output) are dropped
  * on the OUTPUT attribute — a cheap column test — restoring inner
  * explode semantics exactly PROVIDED the array's own elements are
  * never null (true for every kernel here: shingle/minhash longs,
  * embedding floats, regex words, split lines, band structs).
  */
object Staged {

  /** `df.select(keep :+ explode(arr).as(as))` without the inferred
    * re-evaluation of `arr`. Requires null-free array elements.
    */
  def explodeOnce(df: DataFrame, keep: Seq[Column], arr: Column,
      as: String): DataFrame =
    df.select(keep :+ explode_outer(arr).as(as): _*)
      .filter(col(as).isNotNull)

  /** posexplode twin; emits (posAs, as) columns. Requires null-free
    * array elements.
    */
  def posexplodeOnce(df: DataFrame, keep: Seq[Column], arr: Column,
      posAs: String, as: String): DataFrame =
    // generator multi-alias names both outputs in ONE projection —
    // a withColumnRenamed("pos", ...) would also capture any kept
    // column that happens to be named "pos"/"col"
    df.select(keep :+ posexplode_outer(arr).as(Seq(posAs, as)): _*)
      .filter(col(as).isNotNull)
}

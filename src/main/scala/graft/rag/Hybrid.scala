package graft.rag

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: Reciprocal Rank Fusion (Cormack,
  * Clarke & Büttcher, SIGIR 2009) over a lexical result list
  * ([[Bm25]]) and a vector result list ([[TopK]]/[[AnnIvf]]/...).
  * RRF is the production default for hybrid search because it needs
  * no score calibration across spaces — only ranks.
  *
  * Determinism: input lists are ranked by (score desc, id) —
  * the id tie-break makes ranks layout-invariant — and the fused
  * score 1/(k+r_a) + 1/(k+r_b) is two double divisions added in
  * fixed (lexical, vector) order, so the oracle replays bit-exactly.
  *
  * Scale notes: the inputs are ALREADY top-k outputs (tens of rows by
  * construction), so the unpartitioned ranking windows and the
  * full-outer join are driver-scale by design — the heavy lifting
  * happened inside the retrieval legs (TakeOrderedAndProject /
  * bucket-pruned ANN). Fusing full corpus-sized score lists through
  * this operator would be a misuse; rank fusion is defined on result
  * pages.
  */
object Hybrid {

  /** fuse two (id, score) result lists; returns topK rows of
    * (id, rrf, n_lists) ordered by (rrf desc, id) — n_lists is how
    * many input lists contained the id (1 or 2)
    */
  def rrfFuse(lexical: DataFrame, vector: DataFrame, idCol: String,
      scoreCol: String = "score", k: Int = 60,
      topK: Int = 10): DataFrame = {
    require(k >= 1, s"rrf k must be >= 1, got $k")
    def ranked(d: DataFrame, as: String): DataFrame =
      d.select(col(idCol).cast("long").as("id"),
          col(scoreCol).cast("double").as("s"))
        .withColumn(as, row_number()
          .over(Window.orderBy(col("s").desc, col("id"))).cast("long"))
        .select("id", as)
    val j = ranked(lexical, "ra").join(ranked(vector, "rb"),
      Seq("id"), "full_outer")
    j.select(col("id").as(idCol),
        (coalesce(lit(1.0) / (lit(k.toDouble) + col("ra").cast("double")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(k.toDouble) + col("rb").cast("double")),
            lit(0.0))).as("rrf"),
        (col("ra").isNotNull.cast("long") +
          col("rb").isNotNull.cast("long")).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}

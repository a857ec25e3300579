package graft.rag

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.Dedup

/** BM25 keyword retrieval (Robertson/Spärck Jones probabilistic
  * ranking, the Lucene-default `ln(1 + (N-df+0.5)/(df+0.5))` idf
  * variant) — the lexical complement to the embedding searches in
  * [[TopK]]/[[AnnLsh]]/[[AnnIvf]]: production RAG runs both and fuses
  * (hybrid retrieval).
  *
  * Determinism contract (the oracle hash-compares doubles): per-term
  * contributions are isolated into conditional aggregates (adding the
  * 0.0 `otherwise` branch is IEEE-exact) and combined in FIXED query
  * order, so no float sum depends on row encounter order; all model
  * constants are interpolated into the oracle SQL from the same Scala
  * doubles (shortest-round-trip repr), and avgdl is derived as
  * sum/count in double on both sides.
  *
  * Scale notes (100 TB): the exploded (doc_id, term, tf, dl) frame is
  * the classic inverted index — at production scale it is built ONCE
  * (write-time, bucketed by term so a query prunes to its terms'
  * buckets) rather than per query; [[search]] composes the same plan
  * from raw text for the bounded corpus here and pushes
  * `term IN (query)` to the scan side of the aggregate, so only
  * matching-term rows reach the shuffle. Scoring shuffles (doc_id,
  * per-term contribs) — never text — and the final top-k is
  * TakeOrderedAndProject (per-partition heap + driver merge of
  * k·partitions rows, no global sort). The df/N/avgdl corpus stats
  * are one bounded aggregate (|query|+2 scalars to the driver — the
  * mixtureSample pattern).
  */
object Bm25 {

  /** lowercase word terms (DNS for text: BM25 matching is
    * case-insensitive; the oracle lowercases identically)
    */
  def termsCol(text: Column): Column = Dedup.wordsCol(lower(text))

  /** Top-k documents by BM25 score for a bag-of-words query.
    * Returns (doc_id, score, n_matched) ordered by (score desc,
    * doc_id) — the doc_id tie-break keeps rankings deterministic.
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], topK: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    // ROOT-lowercase in the guard too: a default-locale lowercase here
    // can disagree with the ROOT normalization applied to q below
    // (tr_TR dotless-i), letting colliding terms past the check
    require(query.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.size ==
      query.size,
      "query terms must be distinct (weights double-count otherwise)")
    val q = query.map(_.toLowerCase(java.util.Locale.ROOT))
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      termsCol(col(textCol)).as("ws"))
    // corpus stats in ONE bounded aggregate → 2 scalars + |q| dfs to
    // the driver. df(t) = #docs whose term array contains t — counted
    // as per-term conditional aggregates in the SAME pass as N and the
    // token mass, so the corpus is tokenized once for the stats instead
    // of twice (the old shape ran a second explode→groupBy→collect job
    // just for the dfs).
    val statsRow = base.agg(
      count(lit(1)),
      (sum(size(col("ws"))) +:
        q.map(t => count(when(array_contains(col("ws"), t), 1)))): _*).head()
    val nDocs = statsRow.getLong(0)
    require(nDocs > 0, "empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / nDocs.toDouble
    val dfs: Map[String, Long] =
      q.zipWithIndex.map { case (t, i) => t -> statsRow.getLong(2 + i) }.toMap
    val terms = graft.util.Staged.explodeOnce(
      base.select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        col("ws")),
      Seq(col("doc_id"), col("dl")), col("ws"), "term")
      .filter(col("term").isin(q: _*))
    val tf = terms.groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    // Lucene-variant idf, computed once per query term on the driver
    def idf(term: String): Double = {
      val df = dfs.getOrElse(term, 0L).toDouble
      math.log(1.0 + (nDocs.toDouble - df + 0.5) / (df + 0.5))
    }
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))
    // fixed-order combine: one conditional aggregate per query term
    // (0.0 otherwise-branch additions are exact), then left-to-right
    val contribs = q.map(t =>
      sum(when(col("term") === t, lit(idf(t)) * norm).otherwise(lit(0.0))))
    val score = contribs.reduce(_ + _)
    tf.groupBy("doc_id")
      .agg(score.as("score"),
        count(lit(1)).cast("long").as("n_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** the idf values and constants as a DuckDB-replayable SQL snippet
    * is intentionally NOT provided: the oracle recomputes df/N/avgdl
    * from the table and applies ln itself — an independent derivation
    * (glibc ln == Math.log bit-for-bit on this platform, asserted by
    * the oracle gate)
    */
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained-model-shaped document quality classifier (the fastText /
  * CCNet pattern: real pipelines score documents with a learned
  * linear model over cheap features, not hand-tuned if-chains —
  * Joulin et al. 2016, Wenzek et al. 2020). The model here is a
  * LINEAR scorer with FIXED, PUBLIC, inlined weights over the same
  * feature basis [[TextOps.qualityScore]] already extracts — the
  * established literal pattern of the kmeans centroids / PQ
  * codebooks: deterministic weights both engines can replay
  * bit-exactly, standing in for a `.bin` model file the way those
  * stand in for trained artifacts. Swapping in weights learned
  * offline changes only the five constants.
  *
  * Score arithmetic is pure +,*,/ on doubles in a FIXED association
  * order (no exp/log — libm implementations differ across engines, a
  * sigmoid would break the bit-exact oracle). The decision is the
  * sign, so the sigmoid is monotonically redundant anyway:
  * keep = 1 iff z > 0 with
  * z = ((((bias + wPunct·punct) + wStop·stop) + wLen·(mwl/8)) +
  *      wTok·min(1, tokens/50)).
  *
  * Scale shape: one native WordStats kernel pass + one projection —
  * map-side only, embarrassingly parallel, no shuffle; the scorer
  * composes with topPerGroup / mixtureSample downstream exactly like
  * qualityScore does.
  */
object QualityModel {

  /** fixed public weights (feature order: punct_ratio,
    * stopword_ratio, mean_word_len/8, min(1, n_tokens/50), bias) —
    * hand-set to separate prose from markup/garbage on the heuristic
    * features; a trained replacement drops in here
    */
  val WPunct = -6.0
  val WStop = 4.0
  val WLen = 0.8
  val WTok = 1.0
  val Bias = -1.2

  /** (doc_id, model_score, keep) — keep = 1 iff model_score > 0 */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val feats = TextOps.qualityScore(docs, idCol, textCol)
    // association order is load-bearing: the DuckDB oracle replays the
    // same left-nested chain so every intermediate double is identical
    val z = ((((lit(Bias) + lit(WPunct) * col("punct_ratio")) +
      lit(WStop) * col("stopword_ratio")) +
      lit(WLen) * (col("mean_word_len") / lit(8.0))) +
      lit(WTok) * least(lit(1.0), col("n_tokens") / lit(50.0)))
    feats.select(col(idCol), z.as("model_score"),
      when(z > 0, 1).otherwise(0).as("keep"))
  }

  /** the score expression as DuckDB SQL over a relation exposing the
    * [[TextOps.qualityScore]] feature columns — ONE definition drives
    * both the operator's oracle and any composition's (the
    * sampleHash60 single-definition rule)
    */
  def sqlScore: String =
    s"(((($Bias::DOUBLE + $WPunct::DOUBLE*punct_ratio) + " +
      s"$WStop::DOUBLE*stopword_ratio) + " +
      s"$WLen::DOUBLE*(mean_word_len/8.0::DOUBLE)) + " +
      s"$WTok::DOUBLE*least(1.0::DOUBLE, n_tokens/50.0::DOUBLE))"
}

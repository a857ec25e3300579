package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.rag.{DotProduct, HashEmbed, HashEmbedder, L2Normalize}
import graft.text.{BottomKAgg, MinHashSig, NfcNormalize, ShingleHashes, SimHash60, TextOps, WordStats}

/** SparkSessionExtensions hook: exposes the engine's custom Catalyst
  * expression in SQL, so the library's operators compose with plain
  * `spark.sql(...)`:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT dot_product(a, b) FROM vectors")
  *
  * (registration also available on an existing session via
  * `GraftExtensions.register(spark)`)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** arity-checked builder: a wrong-arity SQL call gets an analysis
    * error naming the function, not an IndexOutOfBoundsException.
    */
  private def checked(name: String, arity: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != arity)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> arity.toString,
            "actualNum" -> children.length.toString,
            "docroot" -> ""))
      build(children)
    }

  private[graft] val dotProductBuilder: Seq[Expression] => Expression =
    checked("dot_product", 2)(c => DotProduct(c(0), c(1)))

  /** every native kernel of the engine, callable from plain SQL */
  private[graft] val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct], dotProductBuilder),
    ("l2_normalize", classOf[L2Normalize],
      checked("l2_normalize", 1)(c => L2Normalize(c(0)))),
    ("hash_embed", classOf[HashEmbed],
      checked("hash_embed", 1)(c => HashEmbed(c(0), HashEmbedder.Dim))),
    ("simhash60", classOf[SimHash60],
      checked("simhash60", 1)(c => SimHash60(c(0)))),
    ("nfc_normalize", classOf[NfcNormalize],
      checked("nfc_normalize", 1)(c => NfcNormalize(c(0)))),
    ("minhash_sig", classOf[MinHashSig],
      checked("minhash_sig", 1)(c => MinHashSig(c(0)))),
    ("shingle_hashes", classOf[ShingleHashes],
      checked("shingle_hashes", 1)(c => ShingleHashes(c(0), distinct = false))),
    ("shingle_hashes_distinct", classOf[ShingleHashes],
      checked("shingle_hashes_distinct", 1)(c => ShingleHashes(c(0), distinct = true))),
    // struct(n_words, sum_word_len, hits[]) with the engine's standard
    // per-language stopword lists
    ("word_stats", classOf[WordStats],
      checked("word_stats", 1)(c => WordStats(c(0), TextOps.Stopwords.map(_._2)))),
    // mergeable bottom-k sketch aggregate: bottom_k(expr, k) with a
    // literal integer k. Returns the BARE AggregateFunction — the
    // analyzer wraps it, so DISTINCT / FILTER modifiers resolve
    // (pre-wrapping in toAggregateExpression made them fail with
    // "not an aggregate function")
    ("bottom_k", classOf[BottomKAgg],
      checked("bottom_k", 2) { c =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        val k = c(1) match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case other => throw new IllegalArgumentException(
            s"bottom_k: k must be an integer LITERAL, got ${other.sql}")
        }
        BottomKAgg(c(0), k)
      }))

  /** register on an already-built session */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.rag.DotProduct

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.dotProductBuilder))
  }
}

object GraftExtensions {

  /** arity-checked builder: a wrong-arity SQL call gets an analysis
    * error naming the function, not an IndexOutOfBoundsException.
    */
  private[graft] val dotProductBuilder: Seq[Expression] => Expression =
    children => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "dot_product",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> ""))
      DotProduct(children(0), children(1))
    }

  /** register on an already-built session */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotProductBuilder, "scala_udf")
}

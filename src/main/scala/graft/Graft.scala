package graft

import graft.functions.{DotProduct, JaroWinklerSimilarity}
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}

/** Library facade: one call makes every graft-native Catalyst
  * expression available to SQL users of the session.
  *
  * {{{
  * Graft.install(spark)
  * spark.sql("SELECT jaro_winkler('IBM', 'IBM INDIA')")
  * }}}
  *
  * Or cluster-wide via config (no code change):
  * `--conf spark.sql.extensions=graft.GraftExtensions`. */
object Graft {
  def install(spark: SparkSession): Unit = {
    GraftBridge.registerFunction(spark, "jaro_winkler",
      es => JaroWinklerSimilarity(es(0), es(1)))
    GraftBridge.registerFunction(spark, "dot_product",
      es => DotProduct(es(0), es(1)))
    GraftBridge.registerFunction(spark, "unicode_norm",
      es => functions.UnicodeNorm(es(0), es(1)))
    GraftBridge.registerFunction(spark, "top_k_by",
      es => functions.TopKBy(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression())
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName, "jaro_winkler"),
      es => JaroWinklerSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      es => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[functions.UnicodeNorm].getName, "unicode_norm"),
      es => functions.UnicodeNorm(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("top_k_by"),
      new ExpressionInfo(classOf[functions.TopKBy].getName, "top_k_by"),
      es => functions.TopKBy(es(0), es(1),
        es(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()))
  }
}

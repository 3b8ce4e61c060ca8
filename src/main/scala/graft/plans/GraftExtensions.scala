package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions plugin registering graft's native expressions with
  * the SQL function registry, so pure-SQL users get them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *     ...
  *   spark.sql("SELECT graft_dot(a, b) FROM vectors")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.dotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot_long"),
      GraftExtensions.dotLongBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_distinct_bitmap"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "graft_distinct_bitmap"),
      BitmapDistinct.builder))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_build"),
      new ExpressionInfo(classOf[BitmapBuild].getName, "graft_bitmap_build"),
      BitmapBuild.builder))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitmap_test"),
      new ExpressionInfo(classOf[BitmapTest].getName, "graft_bitmap_test"),
      BitmapTest.builder))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_sketch"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_freq_sketch"),
      MisraGries.builder))
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => WindowTopKRewrite)
  }
}

object GraftExtensions {
  private[graft] val dotBuilder: Seq[Expression] => Expression =
    children => DotProduct(children(0), children(1))

  private[graft] val dotLongBuilder: Seq[Expression] => Expression =
    children => DotProductLong(children(0), children(1))

  /** Register graft functions on an already-running session. Strategy +
    * optimizer rule go through the experimental hooks (the only post-build
    * injection point Spark offers); the rule is useless without the
    * strategy, so they travel together.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_dot", dotBuilder)
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_dot_long", dotLongBuilder)
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_distinct_bitmap", BitmapDistinct.builder)
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_bitmap_build", BitmapBuild.builder)
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_bitmap_test", BitmapTest.builder)
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "graft_freq_sketch", MisraGries.builder)
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(WindowTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowTopKRewrite
  }
}

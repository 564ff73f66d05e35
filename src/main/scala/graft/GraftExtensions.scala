package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType
import graft.stats.{FPValueUpper, TPValueTwoSided}

/** Session extension wiring: registers the engine's custom Catalyst
  * expressions as SQL functions so `spark.sql("... t_pvalue_two_sided
  * (t, df) ...")` works alongside the Column API.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * No custom Rule/SparkStrategy is registered: every reference operator
  * maps onto existing logical operators whose Catalyst planning is
  * already optimal for the shapes involved (SURVEY §4.2) — the scalar
  * CDFs are the only semantics Spark genuinely lacks.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("t_pvalue_two_sided"),
      new ExpressionInfo(classOf[TPValueTwoSided].getName, "t_pvalue_two_sided"),
      // SQL literals may arrive as DECIMAL — coerce explicitly (the
      // expression itself is double-only; the Column API casts in its
      // wrapper)
      (children: Seq[Expression]) =>
        TPValueTwoSided(Cast(children(0), DoubleType), Cast(children(1), DoubleType))))
    ext.injectFunction((
      FunctionIdentifier("f_pvalue_upper"),
      new ExpressionInfo(classOf[FPValueUpper].getName, "f_pvalue_upper"),
      (children: Seq[Expression]) => FPValueUpper(
        Cast(children(0), DoubleType), Cast(children(1), DoubleType), Cast(children(2), DoubleType))))
  }
}

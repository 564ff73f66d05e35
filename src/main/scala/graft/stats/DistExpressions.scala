package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Static entry points the generated code calls — keeps the CDF math
  * inside whole-stage codegen as a plain static invocation (no UDF
  * serialization, no InternalRow boxing). */
object DistMath {
  // Closed forms over the static regularized incomplete beta — the
  // same expressions commons-math3's TDistribution/FDistribution CDFs
  // compute, but with zero per-row allocation, and with every TAIL
  // evaluated DIRECTLY (no `1 - CDF`): a `1.0 - I_x` subtraction has
  // absolute error ~1e-16, so a 1e-40 upper tail would come out as 0
  // or garbage sign — and tiny p-values are exactly where volcano /
  // ANOVA results get interesting. Tail-precision goldens vs mpmath:
  // DistMathTailSpec.
  //   P(|T|>t) = I_{df/(df+t^2)}(df/2, 1/2)        [2*0.5*I == I exactly]
  def tPTwoSided(t: Double, df: Double): Double =
    if (df <= 0 || java.lang.Double.isNaN(t)) Double.NaN
    else if (t == 0.0) 1.0
    else org.apache.commons.math3.special.Beta.regularizedBeta(
      df / (df + t * t), 0.5 * df, 0.5)

  //   P(F>f) = 1 - I_{d1 f/(d2+d1 f)}(d1/2, d2/2)
  //          = I_{d2/(d2+d1 f)}(d2/2, d1/2)   [beta symmetry — direct,
  //            full relative precision in the far upper tail]
  def fPUpper(f: Double, d1: Double, d2: Double): Double =
    if (d1 <= 0 || d2 <= 0 || java.lang.Double.isNaN(f)) Double.NaN
    else if (f <= 0.0) 1.0
    else org.apache.commons.math3.special.Beta.regularizedBeta(
      d2 / (d2 + d1 * f), 0.5 * d2, 0.5 * d1)

  //   P(X² > x) = Q(df/2, x/2)  (upper regularized gamma)
  def chiSqPUpper(x: Double, df: Double): Double =
    if (df <= 0 || java.lang.Double.isNaN(x)) Double.NaN
    else if (x <= 0.0) 1.0
    else org.apache.commons.math3.special.Gamma.regularizedGammaQ(0.5 * df, 0.5 * x)

  //   two-sided standard normal: P(|Z| > z) = erfc(|z|/√2)
  def normPTwoSided(z: Double): Double =
    if (java.lang.Double.isNaN(z)) Double.NaN
    else org.apache.commons.math3.special.Erf.erfc(math.abs(z) / 1.4142135623730951)
}

/** Two-sided Student-t p-value as a native Catalyst expression with
  * doGenCode (SURVEY §4.2: t CDF is the one genuinely custom scalar
  * this engine needs — commons-math3 supplies the math, the Expression
  * keeps it codegen-resident). Null-intolerant: null in → null out. */
case class TPValueTwoSided(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  // inputs are cast to double at the Column wrapper (DistExpressions)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(t: Any, df: Any): Any =
    DistMath.tPTwoSided(t.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, df) => s"graft.stats.DistMath.tPTwoSided($t, $df)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "t_pvalue_two_sided"
}

/** Upper-tail F p-value (one-way ANOVA), same design. */
case class FPValueUpper(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(f: Any, d1: Any, d2: Any): Any =
    DistMath.fPUpper(f.asInstanceOf[Double], d1.asInstanceOf[Double], d2.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, d1, d2) => s"graft.stats.DistMath.fPUpper($f, $d1, $d2)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "f_pvalue_upper"
}

/** Upper-tail chi-square p-value, same design. */
case class ChiSqPValueUpper(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any, df: Any): Any =
    DistMath.chiSqPUpper(x.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, df) => s"graft.stats.DistMath.chiSqPUpper($x, $df)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "chisq_pvalue_upper"
}

/** Two-sided standard-normal p-value, same design. */
case class NormPValueTwoSided(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(z: Any): Any =
    DistMath.normPTwoSided(z.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, z => s"graft.stats.DistMath.normPTwoSided($z)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "norm_pvalue_two_sided"
}

object DistExpressions {
  private def e(c: Column) = Bridge.expression(c.cast("double"))
  def tPValueTwoSided(t: Column, df: Column): Column =
    Bridge.column(TPValueTwoSided(e(t), e(df)))
  def fPValueUpper(f: Column, d1: Column, d2: Column): Column =
    Bridge.column(FPValueUpper(e(f), e(d1), e(d2)))
  def chiSqPValueUpper(x: Column, df: Column): Column =
    Bridge.column(ChiSqPValueUpper(e(x), e(df)))
  def normPTwoSided(z: Column): Column =
    Bridge.column(NormPValueTwoSided(e(z)))
}

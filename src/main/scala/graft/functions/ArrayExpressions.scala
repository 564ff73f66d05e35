package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-to-right dot product of two double arrays as a native Catalyst
  * expression with doGenCode.
  *
  * Replaces the `aggregate(zip_with(a, b, *), 0.0, +)` higher-order
  * form in the similarity hot path: HOF expressions are
  * CodegenFallback — each row pays interpreted lambda evaluation and
  * boxing inside an otherwise codegen'd stage. This emits a tight
  * primitive loop instead (the ANN/near-dup verify stages are exactly
  * per-row array folds, so this is where embedding-scan time goes).
  *
  * Semantics are IDENTICAL to the HOF form, bitwise (oracle rule,
  * INVARIANTS.md §1): accumulate `0.0 + a(0)*b(0) + a(1)*b(1) + …`
  * in index order; null array, length mismatch, or any null element →
  * null (zip_with pads the shorter side with null, which nulls the
  * aggregate). DuckDB `list_reduce(list_transform(list_zip(...)))`
  * folds the same way.
  *
  * Accepts array<float> as well as array<double> on either side,
  * widening per element — float→double widening is exact, so this
  * equals `transform(a, _.cast("double"))` first WITHOUT that HOF's
  * CodegenFallback lambda (and without materializing a converted copy
  * of every embedding in the scan).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch → null

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"array_dot_product needs array<float|double>, got $t")
  }
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val av = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val bv = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += av * bv
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val aGet = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bGet = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
      final int $n = $a.numElements();
      if ($b.numElements() != $n) {
        ${ev.isNull} = true;
      } else {
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          $acc += $aGet * $bGet;
        }
        ${ev.value} = $acc;
      }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "array_dot_product"
}

object ArrayExpressions {
  /** Dot product of two ArrayType(DoubleType) columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))
}

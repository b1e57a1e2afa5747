package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst SQUARED-L2 distance over two numeric arrays, in
  * double precision with a sequential left-to-right accumulation —
  * [[DoubleDot]]'s twin for the distance the ANN family actually
  * ranks by.
  *
  * Motivation (r19 optimization round, guide §4: no interpreted
  * expressions in hot paths): the portable
  * `aggregate(zip_with(a, b, (x, y) => (x−y)·(x−y)), 0.0, _+_)` fold
  * is interpreted per element, and it sits in the hottest per-row
  * loops of the vector stack — every k-means assignment evaluates it
  * once PER CENTROID per row (training iterations, IVF cell assigns,
  * IVF-PQ encodes), the ADC search once per (query, code) subspace,
  * and the exact re-rank / L2 ground-truth passes once per candidate
  * pair. The codegen emits one tight `while` loop with the SAME
  * accumulation order as the lambda fold, so results are bit-identical
  * to the portable form (property-pinned in DoubleL2Spec) and to the
  * DuckDB oracle — only faster.
  *
  * Null semantics mirror `zip_with`+`aggregate`: NULL array, NULL
  * element, or length mismatch (zip_with pads with NULL) → NULL.
  */
case class DoubleL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2 needs array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final double $d =
         |      (double) $a.$aGet($i) - (double) $b.$bGet($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleL2 =
    copy(left = newLeft, right = newRight)
}

object DoubleL2 {
  /** Column-level entry: squared L2 distance of two numeric arrays. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DoubleL2(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

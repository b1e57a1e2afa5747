package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product of a numeric array with the engine's
  * DETERMINISTIC pseudo-random hyperplane `j`:
  * `Σ_i v[i] · (((i·31 + j·17) mod 7) − 3)` — the sign-random-
  * projection LSH primitive ([[graft.ext.Similarity.lshBucket]]).
  *
  * [[DoubleDot]]'s treatment applied to the LSH path (r19, guide §4):
  * the portable `aggregate(zip_with(emb, sequence(…), …))` fold is
  * interpreted per element AND materializes a fresh index array per
  * row, and the bucket of one vector evaluates it `nBits` times (32
  * times per vector in the OR-construction). Same left-to-right
  * accumulation order, bit-identical results (property-pinned in
  * DoubleL2Spec); null semantics mirror the fold: NULL array or NULL
  * element → NULL.
  */
case class HyperplaneDot(child: Expression, j: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_dot needs array<float|double> input, got " +
          other.catalogString)
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    val j17 = j * 17
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += v * ((i * 31 + j17) % 7 - 3).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $a.$get($i) *
         |    (double) (($i * 31 + ${j * 17}) % 7 - 3);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneDot = copy(child = newChild)
}

object HyperplaneDot {
  /** Column-level entry: dot of a numeric array with deterministic
    * hyperplane `j`. */
  def apply(e: Column, j: Int): Column =
    ColumnBridge.column(HyperplaneDot(ColumnBridge.expression(e), j))
}

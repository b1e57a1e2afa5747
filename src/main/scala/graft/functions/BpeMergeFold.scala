package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-rule BPE re-segmentation fold: one left-to-right pass
  * over a token array, replacing each adjacent pair (a, b) with the
  * fused symbol "a b" — the greedy merge step of every BPE
  * train/apply operator.
  *
  * This is the [[DoubleDot]] contingency applied to the tokenizer
  * path, for a measured reason one order worse than interpretation
  * overhead: the portable fold
  *
  * {{{
  * aggregate(w, array(), (acc, x) => when(
  *   try_element_at(acc, -1) === a && x === b,
  *   concat(slice(acc, 1, size(acc) - 1), array(a + " " + b)))
  *   .otherwise(concat(acc, array(x))))
  * }}}
  *
  * COPIES the accumulator array at every element (both branches are
  * `concat` over the whole acc), so one rule over one n-token document
  * is O(n²) interpreted work — the BPE apply/train gates spend nearly
  * all their time there. This expression is the same fold in O(n) with
  * zero per-element allocation, and the codegen emits it as one tight
  * loop inside whole-stage codegen.
  *
  * Exact-equivalence contract (property-pinned in ExtOpsSpec against
  * the portable fold, and oracle-gated end to end): a NULL array →
  * NULL; a NULL element never matches `b` and never stands as a
  * matched `a` (SQL `===` on NULL is not true), so it is appended
  * as-is and breaks any pending pair; matching is sequential and
  * greedy — the fused symbol becomes the new "last element", and can
  * never itself match `a` ("a b" would have to equal its own strict
  * prefix), so runs of a repeated symbol fuse at even offsets exactly
  * like the portable fold and the oracle's island-parity rule.
  */
case class BpeMergeFold(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType,
    containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_fold needs array<string> input, got " +
          other.catalogString)
    }

  // shared immutable match/fused symbols (UTF8String is immutable;
  // referenced from codegen via addReferenceObj)
  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  @transient private lazy val fused = UTF8String.fromString(a + " " + b)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val x: UTF8String =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (m > 0 && buf(m - 1) != null && x != null &&
        buf(m - 1).equals(ua) && x.equals(ub)) {
        buf(m - 1) = fused
      } else {
        buf(m) = x
        m += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (m == n) buf else java.util.Arrays.copyOf(buf, m))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val uaRef = ctx.addReferenceObj("bpeA", ua,
      classOf[UTF8String].getName)
    val ubRef = ctx.addReferenceObj("bpeB", ub,
      classOf[UTF8String].getName)
    val fusedRef = ctx.addReferenceObj("bpeFused", fused,
      classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val buf = ctx.freshName("buf")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |final int $n = $arr.numElements();
         |final Object[] $buf = new Object[$n];
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final $utf8 $x =
         |    $arr.isNullAt($i) ? null : $arr.getUTF8String($i);
         |  if ($m > 0 && $buf[$m - 1] != null && $x != null &&
         |      $buf[$m - 1].equals($uaRef) && $x.equals($ubRef)) {
         |    $buf[$m - 1] = $fusedRef;
         |  } else {
         |    $buf[$m++] = $x;
         |  }
         |}
         |${ev.value} = new $gad(
         |  $m == $n ? $buf : java.util.Arrays.copyOf($buf, $m));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeFold = copy(child = newChild)
}

object BpeMergeFold {
  /** Column-level entry: one greedy (a, b) merge pass over a token
    * array column. */
  def apply(w: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergeFold(ColumnBridge.expression(w), a, b))
}

package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's custom Catalyst
  * work, so a plain SQL surface can reach it without Scala imports:
  *
  * {{{
  * spark-submit --conf \
  *   spark.sql.extensions=graft.functions.GraftExtensions ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * Registers `graft_dot` (the codegen'd [[DoubleDot]] array dot
  * product). Injection via `SparkSessionExtensions.injectFunction` puts
  * the expression through the ordinary analyzer/codegen path — it is a
  * first-class function, usable in SQL strings, views, and
  * `selectExpr`, not just the Column API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "graft_dot",
        "graft_dot(a, b) - double-precision dot product of two " +
          "float/double arrays; NULL on length mismatch or NULL element"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot takes exactly 2 arguments, got ${children.size}")
        DoubleDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5long"),
      new ExpressionInfo(classOf[Md5Long64].getName, "graft_md5long",
        "graft_md5long(s) - first 60 bits of md5(s) as a non-negative " +
          "BIGINT, one-pass (== conv(substring(md5(s),1,15),16,10))"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_md5long takes exactly 1 argument, got ${children.size}")
        Md5Long64(children.head)
      }))
  }
}

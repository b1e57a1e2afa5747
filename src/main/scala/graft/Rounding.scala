package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DuckDB-compatible double rounding for oracle-compared outputs.
  *
  * Spark's `round()` is exact-decimal HALF_UP (BigDecimal of the
  * double's shortest representation); DuckDB rounds doubles as
  * `std::round(x·10^d)/10^d` — half away from zero evaluated in DOUBLE
  * space, where the multiply's IEEE noise decides ties. The two disagree
  * on values whose exact decimal lies on a .5 boundary but whose
  * double·10^d lands just below it (observed: 8.0046875 at sf0.1 →
  * Spark 8.004688, DuckDB 8.004687).
  *
  * This helper reproduces DuckDB's arithmetic with the same IEEE ops, so
  * whenever the two engines computed the identical input double, the
  * rounded outputs are identical too.
  */
object Rounding {
  /** Drop-in replacement for `functions.round(c, digits)` with DuckDB's
    * double semantics. */
  def duckRound(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    when(c.isNull, lit(null).cast("double"))
      .otherwise(signum(c) * floor(abs(c) * p + lit(0.5)) / p)
  }

  /** The scalar twin of [[duckRound]] for driver/state-side code
    * (streaming state handlers): the IDENTICAL IEEE op sequence, so a
    * value rounded in a `GroupState` fold equals the same value
    * rounded by the Column form. */
  def duckRoundDouble(x: Double, digits: Int): Double =
    if (x.isNaN) x
    else {
      val p = math.pow(10, digits)
      math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p
    }
}

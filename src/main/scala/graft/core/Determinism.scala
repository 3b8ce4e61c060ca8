package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine determinism policy (SURVEY.md §4), centralized so every
  * query family shares one definition.
  */
object Determinism {

  /** sum(x as decimal(p,s)) emitted as a bit-deterministic double: decimal
    * addition is exact, so partition order can never change the result —
    * unlike a raw double sum.
    */
  def dsum(c: Column, prec: Int = 28, scale: Int = 6): Column =
    sum(c.cast(s"decimal($prec,$scale)")).cast("double")

  /** 4-dp rounding as pure double arithmetic (floor(x*1e4+0.5)/1e4): unlike
    * round(), identical IEEE doubles give identical results in every engine
    * (Spark's exact-BigDecimal HALF_UP and DuckDB's double round() disagree
    * on half-way doubles).
    */
  def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** SQL twin of [[r4]] for the DuckDB oracles. */
  def r4Sql(expr: String): String = s"floor(($expr) * 10000.0 + 0.5) / 10000.0"

  /** 6-dp variant of [[r4]] (coordinate-precision outputs). */
  def r6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** SQL twin of [[r6]]. */
  def r6Sql(expr: String): String = s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"
}

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
}

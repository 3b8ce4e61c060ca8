package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Left as-of join: for every left row, attach the single latest right row
  * with `right(rightTs) <= left(leftTs)` and equal keys (nulls when no such
  * row exists) — the time-series primitive Spark's join operators lack.
  *
  * Shape (SURVEY.md §3): tag both sides, union them, and run ONE ordered
  * window pass per key — `last(payload, ignoreNulls)` over rows up to the
  * current one. Cost is a single shuffle on the key plus an O(n) sorted
  * scan per key, independent of match distance. The naive alternatives die
  * at scale: a range-condition join explodes to candidate-pair volume, and
  * a per-key driver loop isn't distributed at all. Right rows sort BEFORE
  * left rows at equal timestamps, giving exact `<=` semantics.
  *
  * Determinism: if several right rows share (keys, rightTs), the last one
  * in (payload struct) order wins the window's `last` only by input order —
  * callers needing bit-stable output should pre-reduce the right side to
  * one row per (keys, rightTs) (e.g. max_by) like the driver query does.
  *
  * NULL semantics match SQL as-of/equi joins (and DuckDB's ASOF JOIN):
  * right rows with a NULL key or NULL timestamp can never match and are
  * filtered out up front — Window.partitionBy would otherwise group NULL
  * keys together and match them to each other. Left rows with NULL keys or
  * NULL timestamps are preserved with NULL payloads: their partition then
  * holds no right rows, and a NULL left timestamp sorts before every
  * non-null right timestamp, so `last(_pay)` over the preceding frame is
  * NULL either way.
  */
object AsofJoin {

  def asofLast(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.intersect(left.columns).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val internal = Seq("_t", "_side", "_pay", "_lrow")
    require((left.columns ++ right.columns).intersect(internal).isEmpty,
      s"reserved column names in use: ${internal.mkString(",")}")

    val payType = StructType(payloadCols.map(right.schema(_)).toArray)
    val lrowType = left.schema

    val leftU = left.select(
      keys.map(left(_)) ++ Seq(
        left(leftTs).as("_t"), lit(1).as("_side"),
        lit(null).cast(payType).as("_pay"),
        struct(left.columns.map(left(_)).toIndexedSeq: _*).as("_lrow")): _*)
    // a NULL-key / NULL-ts right row matches nothing under SQL semantics
    val rightNonNull = right.filter(
      (keys.map(right(_).isNotNull) :+ right(rightTs).isNotNull).reduce(_ && _))
    val rightU = rightNonNull.select(
      keys.map(rightNonNull(_)) ++ Seq(
        rightNonNull(rightTs).as("_t"), lit(0).as("_side"),
        struct(payloadCols.map(rightNonNull(_)).toIndexedSeq: _*).as("_pay"),
        lit(null).cast(lrowType).as("_lrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftU.unionByName(rightU)
      .withColumn("_match", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lrow.*") +:
        payloadCols.map(p => col(s"_match.$p").as(p)): _*)
  }

  /** Forward as-of join: for every left row, the single EARLIEST right row
    * with `right(rightTs) >= left(leftTs)` and equal keys — the
    * time-to-next-event primitive (next reading at-or-after t, next
    * purchase after a click). Mirror of [[asofLast]]: same union + one
    * ordered window per key, but lefts sort BEFORE rights at equal
    * timestamps (exact `>=` semantics) and `first(payload, ignoreNulls)`
    * scans the FOLLOWING frame. Same single-shuffle cost, same NULL rules —
    * except a NULL left timestamp needs an explicit guard here (ascending
    * NULLS FIRST would otherwise put every right row in its frame).
    */
  def asofNext(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.intersect(left.columns).isEmpty,
      s"payload columns ${payloadCols.mkString(",")} collide with left columns")
    val internal = Seq("_t", "_side", "_pay", "_lrow")
    require((left.columns ++ right.columns).intersect(internal).isEmpty,
      s"reserved column names in use: ${internal.mkString(",")}")

    val payType = StructType(payloadCols.map(right.schema(_)).toArray)
    val lrowType = left.schema

    val leftU = left.select(
      keys.map(left(_)) ++ Seq(
        left(leftTs).as("_t"), lit(0).as("_side"),
        lit(null).cast(payType).as("_pay"),
        struct(left.columns.map(left(_)).toIndexedSeq: _*).as("_lrow")): _*)
    val rightNonNull = right.filter(
      (keys.map(right(_).isNotNull) :+ right(rightTs).isNotNull).reduce(_ && _))
    val rightU = rightNonNull.select(
      keys.map(rightNonNull(_)) ++ Seq(
        rightNonNull(rightTs).as("_t"), lit(1).as("_side"),
        struct(payloadCols.map(rightNonNull(_)).toIndexedSeq: _*).as("_pay"),
        lit(null).cast(lrowType).as("_lrow")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    leftU.unionByName(rightU)
      .withColumn("_match", first(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(col("_lrow.*") +:
        payloadCols.map(p =>
          when(col("_t").isNotNull, col(s"_match.$p")).otherwise(lit(null))
            .as(p)): _*)
  }

  /** Range join against a small banded dimension (`lo <= x < hi`): the dim
    * is broadcast, so the non-equi condition runs as a map-side broadcast
    * nested-loop — no shuffle of the fact side at all. For banded dims too
    * large to broadcast, pre-bucketize both sides to a common grid and
    * equi-join on the bucket (turning the range condition into a residual
    * filter); for the band-dim cardinalities ETL actually sees (tiers,
    * SRID maps, rate tables) broadcast is the right plan.
    */
  def rangeJoinBroadcast(fact: DataFrame, dim: DataFrame, factCol: String,
                         loCol: String, hiCol: String,
                         joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim),
      fact(factCol) >= dim(loCol) && fact(factCol) < dim(hiCol), joinType)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators (SURVEY.md §3): when a groupBy/join key is hot
  * enough that one reducer takes the whole stage, salt it.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here — see GraftSession) covers sort-merge joins at runtime;
  * these helpers cover the cases AQE can't re-plan: skewed *aggregations*
  * (two-phase salted combine) and broadcast-infeasible skewed joins
  * (explicit replicate-and-salt).
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates (sum/count/min/
    * max): phase 1 aggregates on (keys, salt) spreading each hot key over
    * `buckets` reducers; phase 2 combines the partials. Exact for the
    * provided aggregates regardless of row→salt assignment.
    *
    * aggs maps output column name → (phase1 agg of input, phase2 combine of
    * partial). E.g. count: (count(lit(1)), sum) ; sum: (sum(c), sum).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    require(!df.columns.contains("_salt"), "input already has a _salt column")
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(aggs.head._2._1.as(s"_p_${aggs.head._1}"),
        aggs.tail.map { case (n, (p1, _)) => p1.as(s"_p_$n") }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2(col(s"_p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map { case (n, (_, p2)) => p2(col(s"_p_$n")).as(n) }.toSeq: _*)
  }

  /** Salted join for a skewed left side against a right side too large to
    * broadcast: the right side is replicated `buckets` times (one copy per
    * salt value), the left side gets a random-but-deterministic salt, and
    * the join key becomes (keys, salt) — splitting each hot key's rows over
    * `buckets` tasks. Right-side replication cost is the explicit price;
    * use only when key-frequency stats say the top key dominates.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `buckets` null-extended copies of every
    // unmatched (replicated) right row — only left-preserving types are sound
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin cannot preserve right/full outer semantics (got $joinType)")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "input already has a _salt column")
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft.join(saltedRight, keys :+ "_salt", joinType).drop("_salt")
  }
}

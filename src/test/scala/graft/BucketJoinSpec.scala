package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed co-located join (SURVEY.md §3): pre-bucketing both sides of a
  * recurring join key eliminates BOTH shuffles from every subsequent join —
  * at 100 TB the difference between re-shuffling the fact table nightly and
  * reading it join-ready. Local parquet bucketing IS the real mechanism
  * (HashPartitioning-reported scan), so the no-Exchange plan proven here is
  * the plan a production warehouse table produces.
  */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("bucketed tables join with NO exchange on either side") {
    import spark.implicits._
    val orders = graft.core.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = graft.core.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_mktsegment")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("bkt_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("bkt_customer")
    // disable broadcast so the join would otherwise need two shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(1500))
      // the join itself must read both sides bucket-aligned: no Exchange
      // below the join (the agg after it still exchanges on c_mktsegment)
      val joinPart = plan.split("Join").drop(1).mkString("Join")
      assert(!plan.substring(plan.indexOf("Join")).contains("Exchange hashpartitioning(o_custkey")
        && !joinPart.contains("Exchange hashpartitioning(c_custkey"),
        s"join sides re-shuffled despite bucketing:\n${plan.take(2500)}")
      // and the answer matches the unbucketed formulation
      val expect = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** WindowTopKRewrite: the optimizer rule that turns idiomatic
  * `row_number()<=k`-then-drop-rank window queries into the bounded-heap
  * TopKPerKey physical plan (no per-key sort). Guard rails matter as much
  * as the rewrite: rank consumers, rank-like-but-not-row_number functions,
  * and unpartitioned windows must all keep their real window.
  */
class WindowTopKRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  private def events = graft.core.Tables.events(spark, sf)
    .select($"user_id", $"event_id", $"value")

  private def w = Window.partitionBy($"user_id")
    .orderBy($"value".desc, $"event_id")

  test("drop-rank window top-k is rewritten to the bounded-heap plan") {
    val df = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).drop("rk")
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey \\d".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerKeyExec:\n$plan")
    assert(!plan.contains("Window"), s"window should be gone:\n$plan")
    assert(!plan.contains("Sort"), s"no sort in the rewritten plan:\n$plan")
  }

  test("rewritten plan returns exactly the window formulation's rows") {
    val rewritten = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).drop("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // keeping rk blocks the rewrite -> genuine window reference
    val reference = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rewritten == reference && rewritten.nonEmpty)
  }

  test("residual conjuncts survive as a filter above the top-k") {
    val df = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3 && $"value" > 100.0).drop("rk")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    val reference = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3).filter($"value" > 100.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == reference)
  }

  test("strict < and the two rank spellings map to the right k") {
    val lt = events.withColumn("rk", row_number().over(w))
      .filter($"rk" < 4).drop("rk")
    assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val eq = events.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).drop("rk")
    assert(eq.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(eq.groupBy($"user_id").count().filter($"count" > 1).count() == 0)
  }

  test("flipped literal-first spellings (SQL 'WHERE 3 >= rk') are rewritten") {
    // lit(3) >= rk ≡ rk <= 3; lit(4) > rk ≡ rk <= 3 — both must hit the
    // bounded-heap plan and agree with the window formulation
    val geq = events.withColumn("rk", row_number().over(w))
      .filter(lit(3) >= $"rk").drop("rk")
    assert(geq.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      geq.queryExecution.executedPlan.toString)
    val gt = events.withColumn("rk", row_number().over(w))
      .filter(lit(4) > $"rk").drop("rk")
    assert(gt.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      gt.queryExecution.executedPlan.toString)
    val reference = events.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(geq.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == reference)
    assert(gt.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == reference)
  }

  test("guard: rank kept in the output keeps the real window") {
    val df = events.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("guard: rank() (tie-admitting) is not rewritten") {
    val df = events.withColumn("rk", rank().over(w)).filter($"rk" <= 3).drop("rk")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("guard: unpartitioned (global) window is not rewritten") {
    val wg = Window.orderBy($"value".desc, $"event_id")
    val df = events.withColumn("rk", row_number().over(wg))
      .filter($"rk" <= 3).drop("rk")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan)
  }

  test("driver query q21_topk_rewrite runs on the rewritten plan") {
    val df = SparkEntry.queries("q21_topk_rewrite")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(df.count() > 0)
  }
}

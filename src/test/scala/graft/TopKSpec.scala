package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopK

class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  // reference formulation KEEPS the rank column: WindowTopKRewrite (active
  // in this session via GraftExtensions) only fires when the rank is
  // projected away, so this stays a genuine window plan — an independent
  // reference, not the operator under test rewritten back into itself
  private def windowTopK(k: Int) = {
    val e = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"value")
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    e.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .select($"user_id", $"event_id", $"value", $"rk")
  }

  test("TopK.perKey returns exactly the window row_number<=k rows") {
    val e = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"value")
    val fast = TopK.perKey(e, Seq("user_id"), Seq($"value".desc, $"event_id".asc), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val slow = windowTopK(3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == slow)
    assert(fast.nonEmpty)
  }

  test("TopK.perKey handles k larger than any group (keeps everything)") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 3.0), (2L, 20L, 1.0)).toDF("k", "id", "v")
    val out = TopK.perKey(df, Seq("k"), Seq($"v".desc), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }

  test("TopK.perKey breaks value ties by the secondary order column") {
    val df = Seq((1L, 12L, 7.0), (1L, 10L, 7.0), (1L, 11L, 7.0)).toDF("k", "id", "v")
    val out = TopK.perKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 2)
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(10L, 11L))
  }

  test("plan: partial + final bounded-heap execs, one exchange, NO sort") {
    val e = graft.core.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"value")
    val plan = TopK.perKey(e, Seq("user_id"), Seq($"value".desc, $"event_id".asc), 3)
      .queryExecution.executedPlan
    // collect doesn't traverse into the AQE wrapper — assert on the rendering
    val planStr = plan.toString
    assert("TopKPerKey \\d".r.findAllIn(planStr).size == 2,
      s"expected partial+final TopKPerKeyExec:\n$planStr")
    assert(!planStr.contains("Sort"), s"bounded-heap top-k must not sort:\n$planStr")
    assert(planStr.contains("Exchange hashpartitioning"),
      s"expected one hash exchange between partial and final:\n$planStr")
  }

  test("TopK.perKey groups null keys together, like window partitionBy") {
    val df = Seq((Some(1L), 10L, 5.0), (None, 11L, 3.0), (None, 12L, 9.0),
      (None, 13L, 1.0)).toDF("k", "id", "v")
    val out = TopK.perKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 2)
      .collect().map(_.getLong(1)).toSet
    // null group keeps its top-2 by v desc: ids 12 (9.0) and 11 (3.0)
    assert(out == Set(10L, 12L, 11L))
  }

  test("map-side partial pass bounds what crosses the shuffle") {
    // one partition with many rows for one key -> partial emits only k
    val df = spark.range(0, 1000, 1, 1)
      .select(lit(1L).as("k"), $"id", ($"id" % 97).cast("double").as("v"))
    val out = TopK.perKey(df, Seq("k"), Seq($"v".desc, $"id".asc), 5)
      .collect().map(_.getLong(1)).toSet
    // v = id % 97 -> max v=96 at ids 96, 193, 290, 387, 484 (first five asc)
    assert(out == Set(96L, 193L, 290L, 387L, 484L))
  }
}

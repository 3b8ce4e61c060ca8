package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.streaming.Streams

class SkewSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("salted aggregation matches unsalted exactly on a skewed key") {
    // 10k rows, 90% on one key — the salted plan must still be exact
    val df = spark.range(10000).select(
      when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id")))
        .as("k"),
      col("id").cast("double").as("v"))
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(28,6)")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 8, aggs = Map(
      "n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
      "s" -> (sum(col("v").cast("decimal(28,6)")), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == plain)
  }

  test("salted agg plan has two aggregation exchanges (salt then key)") {
    val df = spark.range(100).select(lit("hot").as("k"), col("id").as("v"))
    val plan = Skew.saltedAgg(df, Seq("k"), 4,
      Map("n" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan.take(1200))
  }

  test("salted join matches plain join on skewed keys") {
    val left = spark.range(5000).select(
      (col("id") % 3).as("k"), col("id").as("lv"))
    val right = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (9L, "none"))
      .toDF("k", "label")
    val plain = left.join(right, Seq("k")).select("k", "lv", "label")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 4)
      .select("k", "lv", "label").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("transformWithState running totals: stream equals batch equals groupBy") {
    val staged = Streams.stageEventsDir(spark, sf, "/tmp/graft_stream_events3")
    // memory sink cannot recover from a prior run's checkpoint — start clean
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_tws_ckpt"))
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val stream = Streams.runningTotals(Streams.eventsStream(spark, staged))
    // the RocksDB provider override is scoped to the rebound clone — the
    // caller's session must keep its original provider (r5 ADVICE: an
    // in-place set silently re-backed every later streaming query)
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      == prevProvider)
    assert(stream.sparkSession ne spark)
    val q = stream.writeStream.format("memory")
      .queryName("run_totals_test").outputMode("update")
      .option("checkpointLocation", "/tmp/graft_tws_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode emits the running state; the final row per user is the
    // total. The memory sink registers its view in the session that ran the
    // query — the scoped clone, not the suite session.
    val got = stream.sparkSession.table("run_totals_test")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"), max(col("sum_cents")).as("sum_cents"))
      .orderBy("user_id").collect().map(_.toString)
    val batch = graft.queries.Advanced.queries("stream_running_totals")(spark, sf)
      .collect().map(_.toString)
    assert(got.sameElements(batch),
      s"stream ${got.take(3).mkString(",")} vs batch ${batch.take(3).mkString(",")}")
    // and the stateful fold equals a plain aggregation of the same input
    val agg = graft.core.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("sum_cents"))
      .orderBy("user_id").collect().map(_.toString)
    assert(batch.sameElements(agg))
  }

  test("stateful streaming sessionization equals the batch sessionizer") {
    val staged = Streams.stageEventsDir(spark, sf, "/tmp/graft_stream_events2")
    val stream = Streams.sessionizeStateful(
      Streams.eventsStream(spark, staged), gapSec = 1800)
    val q = stream.writeStream.format("memory")
      .queryName("sess_state_test").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode: take the last emitted row per user
    val got = spark.table("sess_state_test")
      .groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))
      .orderBy("user_id").collect().map(_.toString)
    val batch = graft.queries.Relational.q13Sessionize(spark, sf)
      .collect().map(_.toString)
    assert(got.sameElements(batch),
      s"stream ${got.take(3).mkString(",")} vs batch ${batch.take(3).mkString(",")}")
  }
}

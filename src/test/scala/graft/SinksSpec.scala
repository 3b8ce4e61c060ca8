package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("partitioned write enables partition pruning") {
    val path = "/tmp/graft_part_events"
    Sinks.writePartitioned(
      graft.core.Tables.events(spark, sf), path, Seq("event_type"))
    val q = spark.read.parquet(path).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan.take(1200))
    assert(q.count() > 0)
  }

  test("bucketed tables join without a shuffle") {
    // the warehouse dir outlives the in-memory catalog between JVM runs —
    // clear both so saveAsTable can recreate the managed location
    for (t <- Seq("graft_orders_b", "graft_lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val o = graft.core.Tables.orders(spark, sf)
    val l = graft.core.Tables.lineitem(spark, sf)
    Sinks.writeBucketed(o, "graft_orders_b", "o_orderkey", 8)
    Sinks.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "graft_lineitem_b",
      "o_orderkey", 8)
    val joined = spark.table("graft_orders_b")
      .join(spark.table("graft_lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join must not shuffle: " + plan.take(1500))
    assert(joined.count() == l.count())
  }

  test("grouping on the bucket key is also shuffle-free") {
    val agg = spark.table("graft_lineitem_b")
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))
  }

  test("gzip csv export round-trips risky fields and compresses on disk") {
    import spark.implicits._
    val path = "/tmp/graft_csv_gz"
    val df = Seq(
      (1L, "plain"), (2L, "has,comma"), (3L, "has \"quote\""), (4L, "line\nbreak"))
      .toDF("id", "name")
    Sinks.writeCsvGz(df.coalesce(1), path)
    // the parts are real gzip members named .csv.gz
    val parts = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).toSeq
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".csv.gz")))
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(parts.head))
    val text = new String(in.readAllBytes(), "UTF-8"); in.close()
    assert(text.startsWith("id,name\n"))
    assert(text.contains("\"has,comma\""))       // quoted only when risky
    assert(text.contains("\"has \"\"quote\"\"\"")) // embedded quotes doubled
    assert(text.contains("1,plain\n"))           // plain fields unquoted
    // and Spark reads its own export back losslessly
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true") // the planted \n-bearing field
      .csv(path)
      .select(col("id").cast("long"), col("name"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.BitmapDistinct

class BitmapDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("bitmap distinct equals count(DISTINCT) across many partitions") {
    // 40 partitions forces real partial-serialize/merge across the exchange
    val e = graft.core.Tables.events(spark, sf).repartition(40)
    val got = e.groupBy($"event_type")
      .agg(BitmapDistinct.distinctCount($"user_id", 1 << 21).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = e.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("sql registration: graft_distinct_bitmap works from pure SQL") {
    graft.core.Tables.events(spark, sf).createOrReplaceTempView("ev_bd")
    val n = spark.sql(
      "SELECT graft_distinct_bitmap(user_id, 2097152) FROM ev_bd")
      .as[Long].head()
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM ev_bd")
      .as[Long].head()
    assert(n == exact)
  }

  test("nulls are ignored; out-of-domain ids fail loudly") {
    val df = Seq(Some(1L), None, Some(5L), Some(1L)).toDF("id")
    val n = df.agg(BitmapDistinct.distinctCount($"id", 100)).as[Long].head()
    assert(n == 2L)
    val boom = intercept[Exception] {
      Seq(1000L).toDF("id")
        .agg(BitmapDistinct.distinctCount($"id", 100)).as[Long].head()
    }
    assert(boom.getMessage != null)
  }

  test("int id columns are implicitly widened, not runtime-cast-crashed") {
    val df = Seq(1, 2, 2, 3).toDF("id") // IntegerType
    val n = df.agg(BitmapDistinct.distinctCount($"id", 100)).as[Long].head()
    assert(n == 3L)
    df.createOrReplaceTempView("bd_int")
    assert(spark.sql("SELECT graft_distinct_bitmap(id, 100) FROM bd_int")
      .as[Long].head() == 3L)
  }

  test("one-arg sql call fails with a clear arity message") {
    spark.range(3).createOrReplaceTempView("bd_arity")
    val boom = intercept[Exception] {
      spark.sql("SELECT graft_distinct_bitmap(id) FROM bd_arity").collect()
    }
    assert(boom.getMessage.contains("expects (idCol, maxId)"),
      s"unexpected: ${boom.getMessage}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{BitmapBuild, BitmapTest}

class BloomBitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("bitmap build + test roundtrip, including trimmed trailing bytes") {
    val bmp = Seq(0L, 3L, 17L, 64L).toDF("p")
      .agg(BitmapBuild.bitmap(col("p"), 1024).as("b"))
    val probes = Seq(0L, 1L, 3L, 17L, 63L, 64L, 65L, 1023L).toDF("q")
    val got = probes.crossJoin(bmp)
      .select(col("q"), BitmapTest.test(col("b"), col("q")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0L -> true, 1L -> false, 3L -> true, 17L -> true,
      63L -> false, 64L -> true, 65L -> false,
      // BitSet.toByteArray trims trailing zero bytes: probing past the
      // trimmed end must read false, never throw
      1023L -> false))
  }

  test("build fails loudly on out-of-domain positions") {
    val e = intercept[Exception] {
      Seq(5000L).toDF("p").agg(BitmapBuild.bitmap(col("p"), 1024)).collect()
    }
    assert(e.getMessage.contains("outside") || e.getCause != null)
  }

  test("SQL registry: graft_bitmap_build/test work from pure SQL") {
    graft.plans.GraftExtensions.register(spark)
    Seq(1L, 9L).toDF("p").createOrReplaceTempView("bb_pos")
    val hit = spark.sql(
      """SELECT graft_bitmap_test(b, 9) AS h9, graft_bitmap_test(b, 2) AS h2
         FROM (SELECT graft_bitmap_build(p, 16) AS b FROM bb_pos)""").head()
    assert(hit.getBoolean(0) && !hit.getBoolean(1))
  }

  test("bitmap formulation is verdict-identical to the relation-join query") {
    val a = graft.queries.Dedup.queries("dedup_bloom_filter")(spark, sf)
      .collect().map(_.toString)
    val b = graft.queries.Dedup.queries("dedup_bloom_bitmap")(spark, sf)
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("bitmap plan: one-row broadcast, probes inside the scan, no pos-relation join") {
    val p = graft.queries.Dedup.queries("dedup_bloom_bitmap")(spark, sf)
      .queryExecution.executedPlan.toString
    // the bitmap reaches the corpus via a 1-row broadcast nested loop
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }
}

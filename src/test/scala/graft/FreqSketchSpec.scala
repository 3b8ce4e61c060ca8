package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.MisraGries

class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("misra-gries: the frequent item survives local decoy floods across partitions") {
    // adversarial layout for a k=3 sketch: the truly frequent item "hot"
    // (frequency 40/160 = 25% > n/(k+1) = 25% ... use 48 > 160/4) is spread
    // thin across 8 partitions while each partition is flooded by its OWN
    // locally-dominant decoys. Local counters favor decoys; the merge must
    // still keep "hot" — that is exactly the n/(k+1) guarantee.
    val rows = (0 until 8).flatMap { p =>
      Seq.fill(6)(("hot", p)) ++
        (0 until 14).flatMap(i => Seq(s"decoy_${p}_$i" -> p))
    } // n = 8*(6+14) = 160; freq("hot") = 48 > 160/4 = n/(k+1) for k=3
    val df = rows.toDF("tok", "p").repartition(8, col("p"))
    val cands = df.agg(MisraGries.candidates(col("tok"), 3).as("c"))
      .collect()(0).getSeq[String](0)
    assert(cands.length <= 3, s"sketch exceeded its budget: $cands")
    assert(cands.contains("hot"), s"frequent item evicted: $cands")
  }

  test("misra-gries: SQL registration and array output shape") {
    Seq("a", "a", "b", "a").toDF("t").createOrReplaceTempView("mg_in")
    val out = spark.sql("SELECT graft_freq_sketch(t, 2) AS c FROM mg_in")
      .collect()(0).getSeq[String](0)
    assert(out.contains("a") && out.length <= 2)
  }

  test("text_heavy_hitters equals the exact full-groupBy frequent set") {
    val got = graft.queries.Text.queries("text_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // brute force: full vocabulary aggregation (what the sketch avoids)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), explode(split(lower(col("text")), " ", -1)).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("source", "tok").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val want = counts.filter { case ((src, _), c) => c >= totals(src) / 50 + 1 }
      .map { case ((src, tok), c) => (src, tok, c) }.toSet
    assert(got.toSet == want, "sketch-verified output differs from exact")
    assert(got.nonEmpty)
    // ordering contract: per source, cnt desc then tok asc
    for ((_, grp) <- got.groupBy(_._1)) {
      val pairs = grp.map(t => (t._3, t._2))
      assert(pairs.sameElements(pairs.sortBy { case (c, t) => (-c, t) }))
    }
  }
}

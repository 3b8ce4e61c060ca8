package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GeomFunctions._
import graft.functions.HashFunctions._

/** Property-style checks (seeded, deterministic) for the hash and geometry
  * math (SURVEY.md §5).
  */
class MathPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val rnd = new scala.util.Random(42)

  test("force2d is idempotent and preserves 2d inputs") {
    val pts = (1 to 50).map { _ =>
      val x = rnd.nextInt(1000000); val y = rnd.nextInt(1000000)
      s"POINT ($x $y)"
    }
    val df = pts.toDF("wkt")
    val once = df.select(force2d(col("wkt")).as("w"))
    val twice = once.select(force2d(col("w")).as("w"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("md5Long: uniform-ish, stable, in range over 1000 random strings") {
    val strs = (1 to 1000).map(_ => rnd.alphanumeric.take(20).mkString)
    val hs = strs.toDF("s").select(md5Long(col("s"))).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length == 1000, "collision in 1000 draws is ~impossible")
    // stability across evaluations
    val hs2 = strs.toDF("s").select(md5Long(col("s"))).as[Long].collect()
    assert(hs.sameElements(hs2))
  }

  test("minhash permutations are distinct full-domain maps") {
    val params = permParams(12)
    assert(params.distinct.length == 12)
    // a must be nonzero mod p for the map to be a bijection
    assert(params.forall { case (a, _) => a % MinhashP != 0 })
    // spot-check injectivity on a sample through the actual column expr
    val xs = (1 to 500).map(_ => math.abs(rnd.nextLong()) % MinhashP)
    val df = xs.toDF("h")
    for ((a, b) <- params.take(3)) {
      val out = df.select(minhashPerm(col("h"), a, b)).as[Long].collect()
      assert(out.distinct.length == xs.distinct.length)
      assert(out.forall(v => v >= 0 && v < MinhashP))
    }
  }

  test("LCC 2272 inverse is within the PA-south lon/lat box across the zone") {
    val pts = (1 to 100).map { _ =>
      (1800000.0 + rnd.nextDouble() * 1500000.0, // easting ft
        50000.0 + rnd.nextDouble() * 600000.0)   // northing ft
    }
    val df = pts.toDF("x", "y")
    val (lon, lat) = lccInverse2272(col("x"), col("y"))
    val rows = df.select(lon.as("lon"), lat.as("lat")).collect()
    assert(rows.forall { r =>
      val lo = r.getDouble(0); val la = r.getDouble(1)
      lo > -83 && lo < -72 && la > 38 && la < 42.5
    })
  }

  test("web mercator is strictly monotonic in lon and lat") {
    val lons = (-179 to 179 by 7).map(_.toDouble)
    val xs = lons.toDF("lon").select(mercX(col("lon"))).as[Double].collect()
    assert(xs.zip(xs.tail).forall { case (a, b) => a < b })
    val lats = (-84 to 84 by 7).map(_.toDouble)
    val ys = lats.toDF("lat").select(mercY(col("lat"))).as[Double].collect()
    assert(ys.zip(ys.tail).forall { case (a, b) => a < b })
  }

  test("shingling: count and containment invariants") {
    for (_ <- 1 to 20) {
      val n = 3 + rnd.nextInt(20)
      val words = (1 to n).map(_ => s"w${rnd.nextInt(8)}")
      val text = words.mkString(" ")
      val sh = Seq(text).toDF("t")
        .select(shingles(col("t"), 3)).as[Seq[String]].head()
      val expected = words.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(sh == expected, s"text: $text")
    }
  }

  test("csvQuote round-trips through an RFC-4180 parser for random fields") {
    // any field, however hostile, must parse back to itself from the
    // quoted rendering (QUOTE_MINIMAL contract)
    def parseCsvField(s: String): String =
      if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
        s.substring(1, s.length - 1).replace("\"\"", "\"")
      else s
    val alphabet = "ab,\"\n\r x;"
    val fields = (1 to 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val quoted = fields.toDF("f").select(csvQuote(col("f")).as("q"))
      .as[String].collect()
    fields.zip(quoted).foreach { case (orig, q) =>
      assert(parseCsvField(q) == orig, s"field <$orig> rendered <$q>")
      // minimality: fields without risky chars are untouched
      if (!orig.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        assert(q == orig)
    }
  }
}

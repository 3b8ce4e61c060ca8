package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry-wide determinism gate: EVERY SparkEntry query, executed
  * twice at sf0.001, must produce bit-identical output. The DuckDB oracle
  * compare (the driver's gate) proves Spark-vs-DuckDB agreement on one
  * execution; this proves Spark-vs-Spark stability across executions —
  * the partition-order/NaN/float-fold defect class that an oracle match
  * can only catch probabilistically. Any query added without following
  * SURVEY §4's determinism recipes (DECIMAL sums, md5 hashing, floor
  * rounding, tie-broken rankings) fails here by name.
  */
class DeterminismSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("every registered query is run-to-run deterministic at sf0.001") {
    val flaky = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val a = fn(spark, sf).collect().map(_.toString)
      val b = fn(spark, sf).collect().map(_.toString)
      if (a.sameElements(b)) None
      else Some(s"$name (${a.length} vs ${b.length} rows, first diff: " +
        a.zip(b).find { case (x, y) => x != y }.map(_.toString).getOrElse("row count") + ")")
    }
    assert(flaky.isEmpty, s"non-deterministic queries:\n${flaky.mkString("\n")}")
  }
}

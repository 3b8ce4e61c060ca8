package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 10× probe corpus must grow the WORK linearly, not the duplicate
  * structure: token-salted copies share no shingles, so LSH candidate
  * pairs never cross copies and the candidate count grows ~linearly in the
  * factor. (The r5 rotation scheme failed exactly this: rotation preserves
  * the word-3-gram shingle set up to the cut, so each doc's 10 copies were
  * a mutual near-dup clique and the probe measured planted-data growth.)
  */
class ScaleCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("scale corpus: LSH candidate pairs never cross copies; count grows ~linearly") {
    val dir = "/tmp/graft_scale_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val strides = graft.tools.ScaleCorpus.build(spark, sf, dir, factor = 10)

    val base = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).count()
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    // recover each doc's copy index: planted dup ids carry the 1e12/2e12
    // offsets ON TOP of the copy shift, so mod out the offset first
    val off = graft.queries.Dedup.ExactOffset
    def copyOf(name: String) = expr(s"($name % $off) div ${strides.doc}")
    val counted = pairs
      .select((copyOf("a_id") === copyOf("b_id")).as("same_copy"))
      .groupBy("same_copy").count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val within = counted.getOrElse(true, 0L)
    val cross = counted.getOrElse(false, 0L)
    assert(base > 0 && within > 0)
    // lexically disjoint copies: cross-copy candidates only via residual
    // hash coincidence — well under 1% of the candidate set
    assert(cross <= (within + cross) / 100,
      s"cross-copy candidates $cross of ${within + cross}")
    // constant dup fraction: ~10x the base candidates (slack for per-copy
    // planted-membership differences — ids mod 5/7 shift with the stride)
    assert(within >= 6 * base && within <= 14 * base,
      s"10x corpus candidates $within vs base $base")
  }
}

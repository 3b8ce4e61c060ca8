package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Dedup

/** Crawl-time streaming dedup against the stored banding index:
  * micro-batched arrivals must land on exactly the batch twin's verdicts
  * (archive / stream / none per doc), including across a checkpoint
  * restart with new arrivals appearing while the query is down.
  */
class StreamDedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  import spark.implicits._

  test("readStream micro-batches == batch twin, across checkpoint resume") {
    val src = "/tmp/graft_sdi_src"
    val ckpt = "/tmp/graft_sdi_ckpt"
    val out = "/tmp/graft_sdi_out"
    val state = "/tmp/graft_sdi_state"
    Seq(src, ckpt, out, state).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))

    val arrivals = Dedup.crawlDocs(spark, sf).localCheckpoint()
    // physical arrival order must respect id order ACROSS micro-batches
    // (the semantic contract of a crawl feed); the repeats (+CrawlDupOffset)
    // arrive after the first appearances, and while the query is DOWN.
    // The crawl offsets are multiples of 8, so doc_id % 8 survives the
    // offsetting and splits each wave into deterministic halves — SIX
    // micro-batches total, enough to cross two compaction points at
    // compactEvery=2.
    val firstWave = arrivals
      .filter(col("doc_id") < Dedup.CrawlOffset + Dedup.CrawlDupOffset)
    val repeats = arrivals
      .filter(col("doc_id") >= Dedup.CrawlOffset + Dedup.CrawlDupOffset)
    // four files -> four micro-batches in run 1 (A-group ids and B-group
    // ids interleave, but no A<->B match exists, so file order is free)
    Seq(0, 4, 1, 5).foreach { m =>
      firstWave.filter(col("doc_id") % 8 === m).coalesce(1)
        .write.mode("append").parquet(src)
    }

    val index = Dedup.bandingIndex(spark, sf).localCheckpoint()
    def runOnce(): Int = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = Dedup.streamDedupIndexStart(spark, stream, index, state, out,
        ckpt, compactEvery = 2)
      try { q.processAllAvailable(); q.recentProgress.count(_.numInputRows > 0) }
      finally q.stop()
    }
    assert(runOnce() >= 4) // first wave crossed at least four micro-batches
    // repeats arrive while the query is down; a FRESH query resumes from
    // the checkpoint and processes only them
    Seq(1, 5).foreach { m =>
      repeats.filter(col("doc_id") % 8 === m).coalesce(1)
        .write.mode("append").parquet(src)
    }
    assert(runOnce() >= 2)
    // seen-state compaction keeps the per-trigger read BOUNDED: after six
    // batches at compactEvery=2 the state dir holds ONE compacted fold
    // plus at most compactEvery uncompacted batch dirs — not one dir per
    // trigger ever run (the quadratic-cumulative-read failure mode)
    val stateDirs = Option(new java.io.File(state).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).map(_.getName).toSeq.sorted
    assert(stateDirs.count(_.startsWith("compacted=")) == 1, stateDirs.toString)
    assert(stateDirs.count(_.startsWith("batch=")) <= 2, stateDirs.toString)
    assert(stateDirs == Seq("batch=4", "batch=5", "compacted=4"), stateDirs.toString)

    val got = spark.read.parquet(out)
      .select("new_id", "source", "match_id").orderBy("new_id").collect()
    val want = Dedup.streamDedupIndex(spark, sf).collect()
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    assert(got.sameElements(want))
    // and the semantics are the planted ones: archive re-arrivals match the
    // archive, in-stream repeats match their own earlier arrival
    val bySrc = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("archive", 0) > 0)
    assert(bySrc.getOrElse("stream", 0) > 0)
    assert(bySrc.getOrElse("none", 0) > 0)
    // repeats overwhelmingly match their earlier arrival (edge docs — too
    // short to shingle, or token-palindromes whose reversal equals the
    // archived original — may verdict otherwise; parity above pins those)
    val repeatRows = got.filter(_.getLong(0) >= Dedup.CrawlOffset + Dedup.CrawlDupOffset)
    val streamRows = repeatRows.filter(_.getString(1) == "stream")
    assert(streamRows.length * 2 > repeatRows.length,
      s"only ${streamRows.length}/${repeatRows.length} repeats matched in-stream")
    assert(streamRows.forall(r => r.getLong(2) >= Dedup.CrawlOffset &&
      r.getLong(2) < Dedup.CrawlOffset + Dedup.CrawlDupOffset))
  }

  test("intra-batch repeats dedup within a single micro-batch (kernel)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // repeat of 1
      (3L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val nb = Dedup.bandDocs(docs)
    val emptyIndex = nb.limit(0).toDF("idx_id", "band", "bucket")
    val res = Dedup.dedupIndexMatch(emptyIndex,
        nb.toDF("seen_id", "band", "bucket"), nb,
        docs.select(col("doc_id").as("new_id")))
      .orderBy("new_id").collect()
    assert(res.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "none", -1L), (2L, "stream", 1L), (3L, "none", -1L)))
  }
}

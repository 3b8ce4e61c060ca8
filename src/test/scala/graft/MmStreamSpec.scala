package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.Streams

class MmStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("binary meta sniffs magic prefixes") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val txt = "hello".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, jpg), (3L, txt)).toDF("id", "payload")
    val out = Multimodal.withBinaryMeta(df, "payload")
      .orderBy("id").select("sniffed_type").as[String].collect()
    assert(out.toSeq == Seq("image/png", "image/jpeg", "application/octet-stream"))
  }

  test("frame sampler: frame math on a hand-computed payload") {
    // 100 bytes, frameSize 32 → frames 0..3 (32,32,32,4 bytes); every=2 → 0,2
    val bytes = Array.tabulate(100)(_.toByte)
    val df = Seq((7L, bytes)).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "id", "payload", 32, 2)
      .orderBy("frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((7L, 0, 32), (7L, 2, 32)))
  }

  test("frame sampler handles final short frame") {
    val bytes = Array.tabulate(33)(_.toByte)
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "id", "payload", 32, 1)
      .orderBy("frame_idx").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((0, 32), (1, 1)))
  }

  test("resize stub: stride sampling on a hand-computed payload") {
    import org.apache.spark.sql.functions.{col, encode, lit}
    import spark.implicits._
    // "abcdefghij" stride 4 -> bytes at 0,4,8 = "aei"
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("payload"))
    val out = Multimodal.resizeStub(df, "id", "payload", stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("aei".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq == Seq((1L, 3, expectMd5)))
    // stride 1 is the identity sample
    val id1 = Multimodal.resizeStub(df, "id", "payload", stride = 1)
      .collect().head
    assert(id1.getInt(1) == 10)
  }

  test("decode stub: deterministic normalized histogram") {
    val bytes = Array[Byte](0, 0, 64, 127, -128, -1) // bins: 2,1,1? careful
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val feats = Multimodal.decodeStub(df, "id", "payload")
      .select("features").as[Seq[Double]].head()
    assert(feats.length == 4)
    assert(math.abs(feats.sum - 1.0) < 1e-12)
    val again = Multimodal.decodeStub(df, "id", "payload")
      .select("features").as[Seq[Double]].head()
    assert(feats == again)
  }

  lazy val stagedEvents: String =
    Streams.stageEventsDir(spark, sf, "/tmp/graft_stream_events")

  test("stream-static broadcast enrich equals its batch twin (readStream parity)") {
    val batch = graft.queries.MmStream.queries("stream_static_join")(spark, sf)
      .collect().map(_.toString).sorted
    val dim = graft.core.Tables.customer(spark, sf)
    val stream = Streams.staticEnrichAgg(Streams.eventsStream(spark, stagedEvents), dim)
    val q = stream.writeStream.format("memory")
      .queryName("static_join_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("static_join_test")
      .orderBy("c_mktsegment", "event_type").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }

  test("streaming window agg equals its batch twin (readStream parity)") {
    val batch = graft.queries.MmStream.queries("stream_window_agg")(spark, sf)
      .collect().map(_.toString).sorted
    val stream = Streams.windowAgg(Streams.eventsStream(spark, stagedEvents),
      withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("win_agg_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("win_agg_test")
      .orderBy("win_start", "event_type").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }

  test("streaming sliding window agg equals its batch twin (readStream parity)") {
    val batch = graft.queries.MmStream.queries("stream_sliding_agg")(spark, sf)
      .collect().map(_.toString).sorted
    val stream = Streams.slidingWindowAgg(Streams.eventsStream(spark, stagedEvents),
      withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("slide_agg_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("slide_agg_test")
      .orderBy("win_start", "event_type").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }

  test("stream-stream interval join equals its batch twin (readStream parity)") {
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.events(spark, sf)
    val batch = Streams.attributionJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"), withWatermark = false)
      .collect().map(_.toString).sorted
    val se = Streams.eventsStream(spark, stagedEvents)
    val stream = Streams.attributionJoin(
      se.filter(col("event_type") === "click"),
      se.filter(col("event_type") === "purchase"), withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("interval_join_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("interval_join_test").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }

  test("streaming dedup drops within-watermark duplicate event_ids") {
    val e = graft.core.Tables.events(spark, sf)
    val stream = Streams.dedupEvents(
      Streams.eventsStream(spark, stagedEvents)
        .unionByName(Streams.eventsStream(spark, stagedEvents)),
      withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("dedup_test").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_test").count()
    assert(got == e.count(), "every duplicated event_id must appear exactly once")
  }
}

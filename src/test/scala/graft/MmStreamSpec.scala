package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.Streams

class MmStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("header parser reads a REAL png/jpeg/mp4, not just planted bytes") {
    // a genuine 1x1 8-bit RGBA PNG (full file, CRCs and all)
    val realPng = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val realJpegHead = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xe0.toByte, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00)
    val realMp4Head = Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p',
      'i', 's', 'o', 'm')
    val txt = "plain text".getBytes("UTF-8")
    // real full ID3v2.3 header: magic, version 3.0, flags 0, sync-safe size
    val realId3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 2, 1)
    // ADVICE r8 false-positive fixtures: text that merely STARTS with the
    // magic (or carries "ftyp" at offset 4) must classify bin — the bytes
    // after the magic fail structural validation (ASCII flags byte has the
    // low nibble set / ASCII box size is astronomically out of range)
    val id3Text = "ID3 is a metadata container used in mp3".getBytes("UTF-8")
    val ftypText = "the ftyp box names the brand".getBytes("UTF-8")
    val df = Seq((1L, realPng), (2L, realJpegHead), (3L, realMp4Head),
      (4L, txt), (5L, realId3), (6L, id3Text), (7L, ftypText))
      .toDF("id", "payload")
    val out = df.select((col("id") +:
        graft.queries.MmStream.parseHeader(col("payload"))): _*)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "png" &&
      out(0).getLong(2) == 1L && out(0).getLong(3) == 1L) // real IHDR dims
    assert(out(1).getString(1) == "jpeg" && out(1).isNullAt(2))
    assert(out(2).getString(1) == "mp4")
    assert(out(3).getString(1) == "bin")
    assert(out(4).getString(1) == "mp3")
    assert(out(5).getString(1) == "bin") // "ID3 " prose, not an ID3v2 tag
    assert(out(6).getString(1) == "bin") // "ftyp" at offset 4 in prose
    // and the query route round-trips at sf0.001
    val q = graft.queries.MmStream.headerParse(spark, sf).collect()
    assert(q.nonEmpty)
    assert(q.forall { r =>
      val id = r.getLong(0)
      val fmt = Seq("png", "jpeg", "mp3", "mp4", "bin")((id % 5).toInt)
      r.getString(1) == fmt &&
        (fmt != "png" || (r.getLong(2) == id % 1024 + 16 && r.getLong(3) == id % 768 + 16))
    })
  }

  test("wav parser reads a REAL hand-assembled RIFF header, little-endian exact") {
    // canonical 44-byte header: 8000 Hz mono 16-bit PCM, 16000 data bytes
    // (= exactly 1000 ms) — every multi-byte field spelled little-endian
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val realWav = "RIFF".getBytes ++ le(36 + 16000, 4) ++
      "WAVEfmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
      le(8000, 4) ++ le(16000, 4) ++ le(2, 2) ++ le(16, 2) ++
      "data".getBytes ++ le(16000, 4) ++ Array.fill[Byte](16000)(0)
    // prose that merely starts with RIFF must stay bin (structure check)
    val riffText = "RIFF is a container format from 1991, WAVE uses it".getBytes("UTF-8")
    val df = Seq((1L, realWav), (2L, riffText),
      (3L, "plain".getBytes("UTF-8"))).toDF("id", "payload")
    val out = df.select((col("id") +:
        graft.queries.MmStream.parseWavHeader(col("payload"))): _*)
      .orderBy("id").collect()
    assert(out(0).getString(1) == "wav")
    assert(out(0).getLong(2) == 1L)      // mono
    assert(out(0).getLong(3) == 8000L)   // sample rate
    assert(out(0).getLong(4) == 16L)     // bit depth
    assert(out(0).getLong(5) == 1000L)   // 16000 B / 16000 B/s
    assert(out(0).getLong(6) == 44L + 16000L)
    assert(out(1).getString(1) == "bin" && out(1).isNullAt(2))
    assert(out(2).getString(1) == "bin")
    // and the query route round-trips at sf0.001
    val q = graft.queries.MmStream.wavHeader(spark, sf).collect()
    assert(q.nonEmpty && q.exists(_.getString(1) == "wav"))
    assert(q.forall { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) {
        val rate = Seq(8000L, 16000L, 22050L, 44100L)((id % 4).toInt)
        r.getString(1) == "wav" && r.getLong(2) == id % 2 + 1 &&
          r.getLong(3) == rate && r.getLong(4) == 16L
      } else r.getString(1) == "bin" && r.isNullAt(2)
    })
  }

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

  test("samplers validate id/payload types at call time, not mid-job") {
    import org.apache.spark.sql.functions.{col, encode}
    import spark.implicits._
    val intId = Seq((1, "abc")).toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("payload"))
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.resizeStub(intId, "id", "payload")
    }
    assert(e1.getMessage.contains("must be LongType"))
    val strPayload = Seq((1L, "abc")).toDF("id", "payload")
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(strPayload, "id", "payload")
    }
    assert(e2.getMessage.contains("must be BinaryType"))
  }

  test("resize stub emits (0, md5 of empty) for zero-length payloads") {
    import org.apache.spark.sql.functions.{col, encode}
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "abcdefgh")).toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("payload"))
    val out = Multimodal.resizeStub(df, "id", "payload", stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out == Map(1L -> 0, 2L -> 2)) // empty doc present, not dropped
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

  test("streaming windowed top-k equals its batch twin (stateful agg on stream, rank on sink)") {
    val batch = graft.queries.MmStream.queries("stream_topk")(spark, sf)
      .collect().map(_.toString).sorted
    // the deployment split the scaladoc documents: windowAgg is the
    // STREAMING stateful operator; rankWindows runs on the closed result
    val stream = Streams.windowAgg(Streams.eventsStream(spark, stagedEvents),
      withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("topk_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = Streams.rankWindows(spark.table("topk_test"))
      .orderBy("win_start", "rank").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }

  test("streaming window anomaly equals its batch twin (stateful agg on stream, flags on sink)") {
    val batch = graft.queries.MmStream.queries("stream_window_anomaly")(spark, sf)
      .collect().map(_.toString).sorted
    val stream = Streams.windowAgg(Streams.eventsStream(spark, stagedEvents),
      withWatermark = true)
    val q = stream.writeStream.format("memory")
      .queryName("anomaly_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // localCheckpoint: the memory-sink View is not self-join-dedupable
    // (MemoryPlan lacks instance renewal); a materialized relation is
    val closed = spark.table("anomaly_test").localCheckpoint()
    val got = Streams.anomalyFlags(closed)
      .orderBy("win_start", "event_type").collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
    // the flags are live: some window is anomalous, most are not
    val flags = Streams.anomalyFlags(closed).collect().map(_.getBoolean(4))
    assert(flags.count(identity) < flags.length)
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

  test("watermark drops a too-late row across micro-batches (append mode)") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // two-batch file source with a checkpoint: batch 1 advances the
    // watermark far past batch 2's late row; the late row's window is
    // already finalized, so append-mode output must NOT contain it. This is
    // the state-eviction semantics the batch twin cannot show.
    val dir = "/tmp/graft_wm_events"
    val ckpt = "/tmp/graft_wm_ckpt"
    val outDir = "/tmp/graft_wm_out"
    def row(id: Long, ts: String, tpe: String) =
      (id, java.sql.Timestamp.valueOf(ts), id, tpe, 1.0, "{}")
    def frame(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
    for (d <- Seq(dir, ckpt, outDir))
      new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
    frame(Seq(
      row(1, "2024-01-01 00:05:00", "click"),
      row(2, "2024-01-05 00:00:00", "click") // watermark -> Jan 4 23:00
    )).write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def runBatch(): Unit = {
      // memory sink cannot recover a checkpoint — the file sink is the
      // restartable production shape anyway
      val stream = Streams.windowAgg(
        spark.readStream.schema(schema).parquet(dir), withWatermark = true)
      val q = stream.writeStream.format("parquet")
        .option("path", outDir)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runBatch()
    // batch 2: one row in the SAME (already finalized) Jan-1 window as
    // event 1, arriving long after the watermark passed it
    frame(Seq(row(3, "2024-01-01 00:10:00", "click")))
      .write.mode("append").parquet(dir)
    runBatch()
    val out = spark.read.parquet(outDir)
      .select(col("win_start"), col("n_events")).as[(String, Long)].collect().toMap
    // the Jan-1 00:00 window closed with ONLY event 1 — the late event 3
    // must have been dropped, never re-emitted or double-counted
    assert(out.get("2024-01-01 00:00:00").contains(1L), out.toString)
  }

  test("streaming upsert merges each micro-batch into the target (foreachBatch)") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val src = "/tmp/graft_upsert_src"; val tgt = "/tmp/graft_upsert_tgt"
    val cp = "/tmp/graft_upsert_cp"
    val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (p <- Seq(src, tgt, tgt + "__old", tgt + "__staging", cp))
      fs.delete(new Path(p), true)
    // two files -> two micro-batches (maxFilesPerTrigger=1); file source
    // orders by modification time, so keep the writes temporally separate
    Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1)).toDF("k", "v")
      .coalesce(1).write.parquet(src)
    Thread.sleep(150)
    Seq((3L, 2), (4L, 2), (5L, 2), (6L, 2)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = graft.streaming.Streams.upsertStream(stream, tgt, Seq("k"), cp)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(tgt).count() == 6) // keys merged, never duplicated
    val out = spark.read.parquet(tgt).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // later batch wins on conflicting keys; unmatched earlier rows survive
    assert(out == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 2, 6L -> 2))
    assert(q.recentProgress.length >= 2, "expected one epoch per staged file")
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

  test("mm prefix dedup: every planted append-variant pairs with its original") {
    val pairs = graft.queries.MmStream.queries("mm_dedup_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = graft.core.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = ids.filter(_ % 6 == 0)
      .map(id => (id, id + graft.queries.MmStream.MmNearOffset)).toSet
    assert(planted.nonEmpty && planted.subsetOf(pairs),
      s"missing ${(planted -- pairs).take(3)}")
    // pairs are ordered and never self-referential; non-planted pairs are
    // genuine shared-prefix collisions between distinct payloads
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("mm phash dedup: single-char edits land within the hamming budget") {
    val got = graft.queries.MmStream.queries("mm_phash_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, h) => a < b && h >= 0 && h <= 8 })
    // the planted single-block edits: most must be recovered (banding needs
    // one of 4 bands intact — a borderline global-mean shift can lose a
    // pair, so claim an aggregate with slack, not "every")
    val ids = graft.core.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = ids.filter(_ % 7 == 0)
      .map(id => (id, id + graft.queries.MmStream.MmPhashOffset)).toSet
    val pairSet = got.map(t => (t._1, t._2)).toSet
    val recovered = planted.count(pairSet.contains)
    assert(planted.nonEmpty &&
      recovered.toDouble / planted.size > 0.5,
      s"phash recovered only $recovered of ${planted.size} planted edits")
    // and a planted pair that IS reported sits well inside the budget
    val plantedHams = got.filter(t => planted.contains((t._1, t._2))).map(_._3)
    assert(plantedHams.nonEmpty && plantedHams.max <= 8)
  }

  test("late-data audit: watermark rules hold trigger by trigger") {
    val rows = graft.queries.MmStream.queries("stream_late_data")(spark, sf)
      .orderBy("batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // trigger 0 has no watermark yet → nothing can be late
    assert(rows.head._1 == 0L && rows.head._2 == -1L && rows.head._4 == 0L)
    // the watermark never regresses (Spark's watermark is monotone)
    val wms = rows.map(_._2).filter(_ >= 0)
    assert(wms.sameElements(wms.sorted))
    // dropped rows are a subset of arrivals
    assert(rows.forall { case (_, _, n, late) => late >= 0 && late <= n })
    // total arrivals reconcile with the source
    assert(rows.map(_._3).sum == graft.core.Tables.events(spark, sf).count())
    // the audit predicts Spark's own rule: recompute one batch driver-side
    val e = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.expr("event_id div 500").as("b"),
        org.apache.spark.sql.functions.col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (rows.length > 1) {
      val lastB = rows.last._1
      val wmExpected = e.filter(_._1 < lastB).map(_._2).max - 300L
      assert(rows.last._2 == wmExpected)
      val lateExpected = e.filter(_._1 == lastB).count(_._2 < wmExpected)
      assert(rows.last._4 == lateExpected)
    }
  }
  test("lateness stats: percentiles only when late rows exist; totals reconcile") {
    val rows = graft.queries.MmStream.queries("stream_lateness_stats")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, n, late, _, _) => late >= 0 && late <= n })
    // sentinel iff no late rows; otherwise a real, ordered distribution
    for ((_, _, late, p50, p95) <- rows) {
      if (late == 0) assert(p50 == -1.0 && p95 == -1.0)
      else { assert(p50 >= 0 && p95 >= p50) }
    }
    assert(rows.map(_._2).sum == graft.core.Tables.events(spark, sf).count())
  }
  test("shard manifest: rollover indexes reconcile with per-shard byte sums") {
    val rows = graft.queries.MmStream.queries("mm_shard_manifest")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._2).distinct.length ==
      graft.core.Tables.documents(spark, sf).count())
    val cap = graft.queries.MmStream.ShardFileBytes
    assert(rows.forall { case (_, _, n, f, off) => n > 0 && f >= 0 && off >= 0 && off < cap })
    for ((_, grp0) <- rows.groupBy(_._1)) {
      val grp = grp0.sortBy(_._2)
      // file indexes never move backwards within a shard
      assert(grp.map(_._4).toSeq == grp.map(_._4).sorted.toSeq)
      // start offsets reconstruct the exact cumulative byte layout
      var cum = 0L
      for ((_, _, n, f, off) <- grp) {
        assert(f == cum / cap && off == cum % cap)
        cum += n
      }
    }
  }

  test("heartbeat gaps: max gap matches driver-side recomputation per type") {
    val rows = graft.queries.MmStream.queries("stream_heartbeat_gaps")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val e = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((typ, n, maxGap, nOver) <- rows) {
      val secs = e.filter(_._1 == typ).sortBy(t => (t._3, t._2)).map(_._3)
      assert(n == secs.length.toLong)
      val gaps = secs.zip(secs.drop(1)).map { case (a, b) => b - a }
      assert(maxGap == (if (gaps.isEmpty) 0L else gaps.max))
      assert(nOver == gaps.count(_ > 3600L).toLong)
    }
  }
  test("native session_window agrees with the manual lag/cumsum sessionizer") {
    val rows = graft.queries.MmStream.queries("stream_session_window")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // windows are [start, last+gap): end - start >= gap, sessions per user
    // are disjoint and ordered
    val gapUs = 1800L * 1000000L
    assert(rows.forall { case (_, s, e, _) => e - s >= gapUs })
    for ((_, grp0) <- rows.groupBy(_._1)) {
      val grp = grp0.sortBy(_._2)
      for (w <- grp.sliding(2) if w.length == 2) {
        val (a, b) = (w(0), w(1))
        assert(b._2 > a._3 - gapUs, s"overlapping sessions: $a $b")
      }
    }
    // event count reconciles
    assert(rows.map(_._4).sum == graft.core.Tables.events(spark, sf).count())
  }
  test("session_window boundary: an exact-gap pair MERGES; one us more splits") {
    import org.apache.spark.sql.functions.{col, session_window, timestamp_micros, count, lit}
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    def sessions(deltaUs: Long): Long = {
      val df = Seq(1000000000000L, 1000000000000L + deltaUs).toDF("us")
        .select(timestamp_micros(col("us")).as("ts"))
      df.groupBy(session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1))).count()
    }
    // exactly the gap -> still merged (closed end boundary); one
    // microsecond beyond -> split. The stream_session_window oracle
    // mirrors this with a strict > on the micros diff.
    assert(sessions(gapUs) == 1L)
    assert(sessions(gapUs + 1) == 2L)
  }
  test("native session_window equals its streaming run (readStream parity)") {
    import org.apache.spark.sql.functions.{col, count, lit, session_window, unix_micros}
    val batch = graft.queries.MmStream.queries("stream_session_window")(spark, sf)
      .collect().map(_.toString).sorted
    val se = Streams.eventsStream(spark, stagedEvents).withWatermark("ts", "1 hour")
    val stream = se
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.core.Determinism.dsum(col("value"), 18, 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"), col("n_events"), col("sum_value"))
    val q = stream.writeStream.format("memory")
      .queryName("session_window_test").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("session_window_test")
      .collect().map(_.toString).sorted
    assert(got.sameElements(batch), s"stream ${got.length} vs batch ${batch.length}")
  }
}

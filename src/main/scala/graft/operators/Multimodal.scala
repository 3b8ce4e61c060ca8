package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 "multimodal").
  *
  * Design: media (image/audio/video) travel as opaque `binary` columns with a
  * typed metadata struct alongside. Everything schema/partitioning-shaped is
  * real; only the actual codec is stubbed (this container has no media
  * libraries) behind [[decodeStub]] — a deterministic fake with the exact
  * batch shape a real decoder (e.g. an `mapInPandas`/JNI ffmpeg bridge on a
  * production cluster) would have.
  */
object Multimodal {

  /** Fail at call time — not mid-job with an opaque ClassCastException —
    * when the id/payload columns don't have the types the imperative
    * samplers read positionally (getLong / getAs[Array[Byte]]).
    */
  private def requireIdPayload(df: DataFrame, idCol: String,
                               payloadCol: String): Unit = {
    val idT = df.schema(idCol).dataType
    val pT = df.schema(payloadCol).dataType
    require(idT == LongType,
      s"$idCol must be LongType (bigint), got ${idT.simpleString} — cast it first")
    require(pT == BinaryType,
      s"$payloadCol must be BinaryType, got ${pT.simpleString}")
  }

  /** Attach typed metadata to a binary payload column: byte length, md5,
    * magic-prefix sniff. Pure column expressions — metadata extraction
    * never leaves codegen, and at 100 TB it's a projection over the scan.
    */
  def withBinaryMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)))
      .withColumn("content_md5", md5(col(payloadCol)))
      .withColumn("magic", lower(hex(substring(col(payloadCol), 1, 4))))
      .withColumn("sniffed_type",
        when(col("magic").startsWith("89504e47"), "image/png")
          .when(col("magic").startsWith("ffd8ff"), "image/jpeg")
          .when(col("magic").startsWith("494433"), "audio/mp3")
          // MP4: the first 4 bytes are the (variable) ftyp box size; the
          // signature is 'ftyp' at bytes 5-8
          .when(lower(hex(substring(col(payloadCol), 5, 4))) === "66747970",
            "video/mp4")
          .otherwise("application/octet-stream"))

  /** Deterministic fixed-size frame/chunk sampler over a binary column:
    * split the payload into `frameSize`-byte frames, keep every `every`-th.
    * Imperative per-partition work (the one legitimate mapPartitions in this
    * codebase): streams over rows, allocates per-frame only, no partition
    * materialization — safe for arbitrarily large partitions.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int = 32, every: Int = 4): DataFrame = {
    requireIdPayload(df, idCol, payloadCol)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_len", IntegerType, nullable = false),
      StructField("frame_md5", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.filter(r => !r.isNullAt(idIdx) && !r.isNullAt(pIdx)).flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](pIdx)
        val nFrames = (bytes.length + frameSize - 1) / frameSize
        (0 until nFrames).iterator
          .filter(_ % every == 0)
          .map { i =>
            val from = i * frameSize
            val until = math.min(from + frameSize, bytes.length)
            val frame = java.util.Arrays.copyOfRange(bytes, from, until)
            digest.reset()
            val hex = digest.digest(frame).map("%02x".format(_)).mkString
            Row(id, i, until - from, hex)
          }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB: media resize/downsample. A production build replaces the stride
    * sampler with a real scaler (image resize / audio resample) behind the
    * same signature: binary in → smaller binary out + output metadata. The
    * fake keeps every `stride`-th byte — deterministic, size-reducing, and
    * recomputable in the oracle (ASCII corpus ⇒ byte stride ≡ char
    * stride). Streams per row (no partition materialization); output is
    * ~len/stride per row, so executor memory is bounded by the largest
    * single payload, same as a real scaler.
    */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String,
                 stride: Int = 4): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    requireIdPayload(df, idCol, payloadCol)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("out_len", IntegerType, nullable = false),
      StructField("out_md5", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.filter(r => !r.isNullAt(idIdx) && !r.isNullAt(pIdx)).map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val out = new Array[Byte]((bytes.length + stride - 1) / stride)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
        digest.reset()
        val hex = digest.digest(out).map("%02x".format(_)).mkString
        Row(r.getLong(idIdx), out.length, hex)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB: media decode / feature extraction. A production build replaces
    * this with a real codec behind the same signature (binary → fixed-width
    * feature vector). The fake is deterministic: 4-bin byte histogram
    * normalized to [0,1] — enough to exercise schema, batching and
    * downstream consumers end to end.
    */
  def decodeStub(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    requireIdPayload(df, idCol, payloadCol)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.filter(r => !r.isNullAt(idIdx) && !r.isNullAt(pIdx)).map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        val bins = new Array[Double](4)
        var i = 0
        while (i < bytes.length) { bins(((bytes(i) & 0xff) >> 6)) += 1.0; i += 1 }
        val n = math.max(bytes.length, 1).toDouble
        Row(r.getLong(idIdx), bins.map(_ / n).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

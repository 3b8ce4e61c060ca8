package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the test-data star schema (TPC-H-ish + documents/embeddings/
  * events). All operators take a `dir` so the same code runs at any scale
  * factor — and, on a real cluster, against any parquet location.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts normalized to Spark's UTC-instant TimestampType whatever
    * the parquet physical encoding is — the driver has shipped the column
    * as TIMESTAMP(NANOS) (unrepresentable in Spark 4 directly; read nanos
    * as long and truncate to micros — downstream ops bucket at >= second
    * grain) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (inferred as
    * TIMESTAMP_NTZ; reinterpret the wall-clock as UTC, exact because the
    * session timezone is pinned to UTC in GraftSession). Every operator
    * must load events through here, never `t(...)` directly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // session-global legacy flag, also declared in GraftSession.builder;
    // set here too so events() works on sessions built elsewhere (driver,
    // tests). Documented side effect: later nanos-parquet reads in this
    // session also map nanos to long.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→timestamp cast below reinterprets the wall-clock in the
    // SESSION zone; only UTC makes that the identity mapping, so pin it
    // here too rather than trusting every session constructor did
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Ensure minimum map-side parallelism. The testdata tables are single
    * parquet files with ONE row group, so Spark scans them as one partition
    * and everything before the first shuffle — shingle hashing, token
    * explosion, vector dot products — runs on one core of 32. Redistribute
    * cheaply (the inputs are small; the derived work is what's expensive)
    * up to the session's parallelism. On a production cluster inputs arrive
    * in many splits and this no-ops.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}

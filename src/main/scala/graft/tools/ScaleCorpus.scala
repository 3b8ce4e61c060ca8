package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-shift strides used to make the replicated copies id-disjoint; the
  * probe spec uses [[doc]] to recover a row's copy index.
  */
final case class ScaleStrides(doc: Long, vec: Long, cust: Long, supp: Long,
                              order: Long, event: Long, user: Long)

/** Builder for the 10× throughput-probe corpus: every probed table is
  * rewritten as `factor` id-disjoint copies so a probed query sees 10× the
  * rows with the SAME per-key statistics — constant duplicate fraction,
  * constant join fan-out, constant vertex degree. A probe ratio near the
  * factor then certifies linear scaling of the OPERATOR; a
  * corpus-proportional parameterization reads ~factor², and a quadratic
  * candidate generation blows past it.
  *
  * Documents are made LEXICALLY DISJOINT across copies by salting every
  * token with the copy index (copy 0 keeps the original text). Rotating the
  * token array — the previous scheme — preserves the word-3-gram shingle
  * set except at the cut (Jaccard ≈ (m−2)/(m+2) ≈ 1), so each doc's copies
  * formed a mutual near-duplicate clique under minhash LSH and the probe
  * partly measured planted-data growth (r5 ADVICE). With per-copy salts the
  * shingle sets truly diverge: cross-copy LSH candidates are ~zero
  * (asserted in ScaleCorpusSpec) and within-copy duplicate structure is
  * preserved exactly, so the dup FRACTION is constant by construction.
  *
  * Relational tables replicate with shifted keys (customer/supplier/order/
  * event/user ids), leaving dates, amounts, and dimension references
  * untouched: 10 disconnected copies of the same star schema. nation /
  * region / part copy verbatim (entity-domain tables a real 10× load would
  * also hold constant).
  */
object ScaleCorpus {

  /** Standalone builder: `runMain graft.tools.ScaleCorpus <sfDir> <outDir>
    * [factor]` — used by tools/sf1check.sh to materialize the sf1 anchor
    * corpus before the heavy-query DuckDB compare.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_scale10x")
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.local("graft-scale-corpus")
    build(spark, sfDir, outDir, factor)
    println(s"[scale-corpus] built ${factor}x of $sfDir at $outDir")
    spark.stop()
  }

  private def strideOf(df: DataFrame, idCol: String): Long =
    df.agg(max(col(idCol))).head().getLong(0) + 1L

  /** Write the `factor`× corpus for `sfDir` into `outDir` and return the
    * id strides used. Each table lands as several files so the scan
    * parallelizes like real multi-split input.
    */
  def build(spark: SparkSession, sfDir: String, outDir: String,
            factor: Int = 10): ScaleStrides = {
    // provenance stamp, written by EVERY builder of this path (the bench
    // probe section and sf1check both rebuild it): a corpus scaled from
    // one sf can never masquerade as another's anchor — the round-11
    // sf1 run initially validated against a 10×-sf0.01 corpus because a
    // bench smoke had rebuilt the dir without re-stamping it
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.write(java.nio.file.Paths.get(outDir, "_source"),
      sfDir.getBytes("UTF-8"))
    // events.ts is parquet TIMESTAMP(NANOS); read it as long (the same
    // session flag GraftSession/Tables.events set) and write it back as
    // long — Tables.events converts on read either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def read(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.repartition(8).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def copies(df: DataFrame)(one: Int => DataFrame): DataFrame =
      (0 until factor).map(one).reduce(_ unionByName _)

    val emb = read("embeddings")
    val vecStride = strideOf(emb, "vec_id")
    write(copies(emb)(i => emb.withColumn("vec_id", col("vec_id") + lit(i * vecStride))),
      "embeddings")

    val doc = read("documents")
    val docStride = strideOf(doc, "doc_id")
    write(copies(doc) { i =>
      val toks = split(col("text"), " ", -1)
      // copy 0 = the original; copy i salts EVERY token, so copies share
      // no shingles of any length with each other or with copy 0
      val salted = if (i == 0) col("text")
        else array_join(transform(toks, t => concat(t, lit("~" + i))), " ")
      doc.withColumn("doc_id", col("doc_id") + lit(i * docStride))
        .withColumn("text", salted)
    }, "documents")

    val cust = read("customer")
    val supp = read("supplier")
    val ord = read("orders")
    val li = read("lineitem")
    val ev = read("events")
    val custStride = strideOf(cust, "c_custkey")
    val suppStride = strideOf(supp, "s_suppkey")
    val orderStride = strideOf(ord, "o_orderkey")
    val eventStride = strideOf(ev, "event_id")
    val userStride = strideOf(ev, "user_id")

    write(copies(cust)(i =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(i * custStride))), "customer")
    write(copies(supp)(i =>
      supp.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppStride))), "supplier")
    write(copies(ord)(i =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderStride))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custStride))), "orders")
    write(copies(li)(i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppStride))), "lineitem")
    write(copies(ev)(i =>
      ev.withColumn("event_id", col("event_id") + lit(i * eventStride))
        .withColumn("user_id", col("user_id") + lit(i * userStride))), "events")

    Seq("nation", "region", "part").foreach(n => write(read(n), n))

    ScaleStrides(docStride, vecStride, custStride, suppStride,
      orderStride, eventStride, userStride)
  }
}

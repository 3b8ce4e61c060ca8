package graft.sources

import org.apache.spark.sql.DataFrame

/** Output-layout operators (SURVEY.md §3 "Partitioning & shuffle"): how a
  * table is *written* decides what the next hundred queries pay.
  */
object Sinks {

  /** Hive-style partitioned parquet: queries filtering on the partition
    * columns scan only matching directories (PartitionFilters in the plan —
    * asserted in SinksSpec). Choose low-cardinality columns (date, type).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: joins and aggregations on the bucket key
    * skip the shuffle entirely (no Exchange in the plan — asserted in
    * SinksSpec). The 100 TB pattern: bucket the fact tables on their join
    * key once at ingest; every subsequent fact-fact join is co-located.
    * Bucketing requires the table catalog (saveAsTable), not bare paths.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Gzip-compressed CSV export — the opendata/carto publish format
    * (opendata.py:79-90 compress_csv gzips the written csv; opendata.py:336
    * petl tocsv writes QUOTE_MINIMAL). Spark writes one `.csv.gz` part per
    * partition, compressing inline rather than as the reference's separate
    * re-read pass; `df.coalesce(n)` upstream picks the file count.
    * `escape="` makes embedded quotes double (csv-standard, petl parity)
    * instead of Spark's backslash default; quoting stays minimal.
    */
  def writeCsvGz(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("compression", "gzip")
      .option("escape", "\"")
      .csv(path)
}

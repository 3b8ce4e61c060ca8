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
}

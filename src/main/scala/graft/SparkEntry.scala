package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Etl.queries ++
      graft.queries.Geom.queries ++ graft.queries.Dedup.queries ++
      graft.queries.Ann.queries ++ graft.queries.Text.queries ++
      graft.queries.MmStream.queries ++ graft.queries.Advanced.queries ++
      graft.queries.Ingest.queries ++ graft.queries.Sampling.queries ++
      graft.queries.Graph.queries ++ graft.queries.Layout.queries

  /** DuckDB-equivalent SQL per query key (driver hash-compares results). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Etl.oracles ++
      graft.queries.Geom.oracles ++ graft.queries.Dedup.oracles ++
      graft.queries.Ann.oracles ++ graft.queries.Text.oracles ++
      graft.queries.MmStream.oracles ++ graft.queries.Advanced.oracles ++
      graft.queries.Ingest.oracles ++ graft.queries.Sampling.oracles ++
      graft.queries.Graph.oracles ++ graft.queries.Layout.oracles
}

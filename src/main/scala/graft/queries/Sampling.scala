package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._
import graft.functions.HashFunctions._

/** Training-mix sampling operators (SURVEY.md §2 "LLM-pipeline") — the two
  * selection primitives a pretraining data pipeline runs after filtering:
  * per-source rate sampling (to hit a target mixture) and per-source token
  * budgeting (to cap each source's contribution). Both are deterministic
  * (hash-based / fixed order), so a re-run selects the identical corpus —
  * the property that makes a 100 TB ingestion job restartable and its
  * output citable.
  */
object Sampling {

  /** Per-stratum sampling rates (per-10000, integral so both engines
    * compare exactly): source k → rate bps. The training-mix knob.
    */
  val MixRates: Map[Int, Int] = Map(0 -> 10000, 1 -> 5000, 2 -> 2500, 3 -> 1000)

  /** Weighted stratified sampling: doc_id-hash coin per row against its
    * stratum's rate. Pure map-side filter — no shuffle, no RNG state; the
    * md5-derived coin is independent of partitioning and engine. The
    * stratum here is doc_id%4 standing in for a source/domain tag.
    */
  def mixture(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
    val source = (col("doc_id") % 4).cast("int")
    val coin = md5Long(concat(lit("mix:"), col("doc_id"))) % 10000L
    val rate = MixRates.foldLeft(lit(0): org.apache.spark.sql.Column) {
      case (acc, (k, v)) => when(source === k, lit(v)).otherwise(acc)
    }
    doc.select(col("doc_id"), source.as("source"), coin.as("coin"))
      .filter(col("coin") < rate)
      .orderBy("doc_id")
  }

  /** Per-source token budgeting: in deterministic doc_id order, keep each
    * source's docs while the running token total stays within the budget
    * (the doc that crosses the line is kept — budgets are soft caps). One
    * window per source partition: a single shuffle by source, cumulative
    * sum inside, no driver-side iteration.
    */
  val TokenBudget = 20000L

  def tokenBudget(s: SparkSession, d: String): DataFrame = {
    val doc = documents(s, d)
      .select(col("doc_id"), (col("doc_id") % 4).cast("int").as("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < TokenBudget)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_mixture"      -> (mixture _),
    "sample_token_budget" -> (tokenBudget _)
  )

  val oracles: Map[String, String] = Map(
    "sample_mixture" -> {
      val rateSql = MixRates.toSeq.sorted
        .map { case (k, v) => s"WHEN doc_id % 4 = $k THEN $v" }.mkString(" ")
      s"""SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source,
         ${md5LongSql("'mix:' || doc_id")} % 10000 AS coin
         FROM documents
         WHERE ${md5LongSql("'mix:' || doc_id")} % 10000 < (CASE $rateSql ELSE 0 END)
         ORDER BY doc_id"""
    },
    "sample_token_budget" ->
      s"""WITH toks AS (SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS source,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         cum AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM toks)
         SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM cum WHERE cum_tokens - n_tokens < $TokenBudget
         ORDER BY source, doc_id"""
  )
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic hashing for the dedup/sketch family.
  *
  * Everything is built on md5 so sketches are bit-identical across engines
  * (SURVEY.md §4): Spark `conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` — 60 bits, always positive,
  * comfortably inside BIGINT. xxhash64 would be faster but has no DuckDB
  * twin; at scale swap `md5Long` for `xxhash64` behind the same signature.
  */
object HashFunctions {

  /** 60-bit positive hash of a string column. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL fragment mirror of [[md5Long]] for DuckDB oracles. */
  def md5LongSql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Lowercased space-token array (single-space split, mirroring DuckDB
    * `string_split(x, ' ')` exactly — including empty tokens on runs).
    */
  def tokens(text: Column): Column = split(lower(text), " ", -1)

  /** Distinct word n-gram ("shingle") array from a *materialized* token
    * array column. IMPORTANT: pass an attribute (project `tokens(text)`
    * into a column first), not the `tokens(...)` expression itself —
    * higher-order-function lambdas are interpreted (no codegen, no
    * subexpression elimination), so an inline expression would re-split the
    * text for every element access.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    // guard: sequence(0, -1) counts DOWN ([0,-1]) and element_at(_, 0)
    // throws — docs shorter than n tokens must yield an empty set, exactly
    // like the DuckDB twin's range(1, len-1)
    when(count > 0,
      array_distinct(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience one-shot shingler for tests/small inputs (re-splits per
    * element — do not use in hot paths; see [[shinglesFromTokens]]).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  // ---- MinHash permutations: one md5 per shingle, k linear perms ----------
  /** Prime modulus < 2^30 so a*h+b stays under 2^60 in both engines
    * (DuckDB errors on BIGINT overflow; Java would silently wrap).
    */
  val MinhashP: Long = 1073741789L

  /** Deterministic (a_i, b_i) permutation parameters. */
  def permParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i =>
      (((2L * i + 1) * 12582917L) % MinhashP,
        (i * 4256249L + 98765431L) % MinhashP))

  /** Reduce a 60-bit hash into the permutation domain. */
  def h30(c: Column): Column = c % MinhashP

  def minhashPerm(h: Column, a: Long, b: Long): Column =
    (lit(a) * h + lit(b)) % MinhashP

  def minhashPermSql(hExpr: String, a: Long, b: Long): String =
    s"(($a * $hExpr + $b) % $MinhashP)"

  /** SQL mirror of [[shingles]]: DISTINCT n-grams per row, exploded. Emits a
    * `(doc_id, sh)` relation body — callers wrap it in a CTE.
    */
  def shinglesSql(n: Int, idCol: String, textCol: String, table: String): String = {
    val parts = (0 until n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""SELECT DISTINCT $idCol, $parts AS sh
        FROM (SELECT $idCol, string_split(lower($textCol), ' ') AS ws FROM $table),
             UNNEST(range(1, len(ws) - ${n - 2})) AS t(i)"""
  }
}

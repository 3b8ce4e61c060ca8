package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Internal-API shim — the ONLY file outside the `graft.*` packages. It
  * rebinds a DataFrame's logical plan onto a conf-cloned session so an
  * operator can require session confs (e.g. the RocksDB state-store
  * provider that `transformWithState` needs) without mutating the caller's
  * session: public Spark offers no supported way to scope a session conf
  * to one query. `cloneSession` + `Dataset.ofRows` is the same mechanism
  * Structured Streaming itself uses for per-query conf isolation
  * (StreamExecution.sparkSessionForStream), reached here via a
  * `org.apache.spark.sql` subpackage because both members are
  * `private[sql]`.
  */
object SessionScope {

  /** A clone of `df`'s session (conf copied, SparkContext shared) with
    * `confs` applied, and `df` rebound to it. Works for batch and
    * streaming plans: execution — including `writeStream.start()`'s own
    * conf snapshot — then reads the scoped values while the caller's
    * session keeps its originals.
    */
  def rebindToClone(df: DataFrame, confs: Map[String, String]): DataFrame = {
    val scoped = df.sparkSession.asInstanceOf[ClassicSession].cloneSession()
    confs.foreach { case (k, v) => scoped.conf.set(k, v) }
    Dataset.ofRows(scoped, df.queryExecution.logical)
  }
}

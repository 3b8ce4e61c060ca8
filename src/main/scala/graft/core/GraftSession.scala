package graft.core

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession entry point for graft workloads.
  *
  * Encodes the §3 scale defaults: AQE on (runtime re-plan + skew-join
  * splitting + partition coalescing), shuffle partitions from the
  * environment (a library must never hardcode cluster geometry), UTC
  * session time, and graft's SQL extensions (graft_dot etc.). On a real
  * cluster the same builder is used without `master` — spark-submit
  * supplies it.
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session sized by SPARK_GRAFT_CPUS (driver/test environments). */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

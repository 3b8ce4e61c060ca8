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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session sized by SPARK_GRAFT_CPUS, defaulting to every core the
    * machine has (the driver benches on a 32-core box — a "4" default left
    * 28 cores idle in any environment that didn't set the variable).
    */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val s = builder(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Single-JVM resilience: local[n] runs driver + executor in one heap,
      // so a multi-second full GC stalls BOTH sides of the heartbeat RPC at
      // once. At the 10s default a 45-minute bench accumulated 60 failed
      // heartbeats and the executor self-terminated mid-run (r11 driver
      // bench, rc=1). 60s intervals with a 600s network timeout tolerate
      // the worst observed stall with a 10× margin and cost nothing when
      // healthy; on a real cluster spark-submit overrides apply as usual.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    // getOrCreate returns any PRE-EXISTING session, silently ignoring every
    // builder config — re-apply the runtime-settable ones so graft behaves
    // identically either way (extensions can't be injected post-hoc, but
    // the function registry can).
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    if (!s.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
      graft.plans.GraftExtensions.register(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug utility: time a named SparkEntry query and dump its executed plan.
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir] [reps]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.GraftSession.local("graft-plandump")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[plandump] run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same per-measurement hygiene as Bench: leftover checkpoint blocks
      // from prior reps otherwise pile up and skew later timings
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    println(fn(spark, sfDir).queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}

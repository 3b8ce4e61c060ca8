package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Debug utility: run a named SparkEntry query and attribute its wall time
  * to Spark jobs and stages (the local-mode substitute for the Spark UI,
  * which Bench disables). Prints one line per job — duration, stage count,
  * task count — and per-stage shuffle bytes, so a multi-second query can be
  * blamed on "12 jobs of 80 ms scheduling floor" vs "one 2 s stage".
  *
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.GraftSession.local("graft-jobprofile")
    for (name <- args(0).split(",").map(_.trim).filter(_.nonEmpty))
      profileOne(spark, name, sfDir, reps)
    spark.stop()
  }

  private def profileOne(spark: org.apache.spark.sql.SparkSession,
                         name: String, sfDir: String, reps: Int): Unit = {
    println(s"[jobprofile] ===== $name =====")
    val fn = graft.SparkEntry.queries(name)

    case class JobRow(id: Int, start: Long, var end: Long = -1L,
                      var stages: Int = 0, var tasks: Int = 0,
                      var shufRead: Long = 0L, var shufWrite: Long = 0L,
                      var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRow(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, r): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        // attribute to the most recent open job (good enough locally)
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.filter(j => j.end < 0 || j.end >= info.completionTime.getOrElse(0L))
          .toSeq.sortBy(-_.id).headOption.foreach { j =>
            j.stages += 1
            j.tasks += info.numTasks
            j.shufRead += info.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufWrite += info.taskMetrics.shuffleWriteMetrics.bytesWritten
          }
      }
    }

    // warm run (JIT + codegen + file index)
    fn(spark, sfDir).count(): Unit
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    spark.sparkContext.addSparkListener(listener)
    var best = Double.MaxValue
    for (i <- 1 to reps) {
      jobs.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val phases = df.queryExecution.tracker.phases
      println("[jobprofile]   build phases: " + phases.map { case (k, v) =>
        f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.3f s" }.mkString(", "))
      val n = df.count()
      val t = (System.nanoTime() - t0) / 1e9
      best = math.min(best, t)
      println(f"[jobprofile] run $i: $n rows in $t%.3f s")
      import scala.jdk.CollectionConverters._
      val rows = jobs.values.asScala.toSeq.sortBy(_.id)
      val busy = rows.map(r => (r.end - r.start).max(0L)).sum
      println(f"[jobprofile]   ${rows.size} jobs, sum job wall ${busy / 1e3}%.3f s (gaps = driver/planning)")
      for (r <- rows)
        println(f"[jobprofile]   job ${r.id}%3d ${(r.end - r.start).max(0L) / 1e3}%7.3f s  stages=${r.stages}%2d tasks=${r.tasks}%4d shufR=${r.shufRead}%9d shufW=${r.shufWrite}%9d  ${r.desc.take(60)}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    println(f"[jobprofile] best of $reps: $best%.3f s")
    spark.sparkContext.removeSparkListener(listener)
  }
}

package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Debug utility: dump `.explain("formatted")` for named SparkEntry queries
  * into per-query files (the optimization rounds' plan-evidence artifacts).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <query>[,<query>...]
  *   - outDir: directory the files land in (created if absent)
  *   - suffix: appended to the file name, e.g. "before"/"after"
  *             → <outDir>/<query>_<suffix>.txt
  *   - queries: comma-separated SparkEntry names, or "all"
  *
  * The dump captures the FORMATTED plan of the DataFrame the query
  * returns (scan details: PushedFilters/ReadSchema; exchange placement;
  * join strategies; codegen spans). Side-effecting lifecycle queries run
  * their mutations while building the frame — same semantics as a bench
  * leg's plan.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val names: Seq[String] =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = graft.core.GraftSession.local("graft-explain")
    for (n <- names) {
      val txt =
        try {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      // lifecycle queries persist/cache nothing across dumps
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      println(s"[explaindump] $n -> ${outDir.resolve(s"${n}_$suffix.txt")}")
    }
    spark.stop()
  }
}

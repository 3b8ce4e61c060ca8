package graft.tools

/** NND recall tuning probe: prints the clustered-corpus recall trajectory
  * (avg recall@k per descent round) at a given sf dir, plus the flat-corpus
  * value — the measurement loop behind the NND_WORKK constant (the r8
  * verdict's "documented future work" on the sf0.1 clustered gate).
  * Usage: runMain graft.tools.NndTune [sfDir ...]
  */
object NndTune {
  def main(args: Array[String]): Unit = {
    val (iterArgs, dirArgs) = args.partition(_.forall(_.isDigit))
    val maxIters = iterArgs.headOption.map(_.toInt)
      .getOrElse(graft.queries.Ann.NND_ITERS)
    val dirs = if (dirArgs.nonEmpty) dirArgs.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("graft-nnd-tune")
    for (d <- dirs) {
      val cl = graft.queries.Ann.clusteredDir(spark, d)
      for (it <- 0 to maxIters) {
        val r = graft.queries.Ann.nndRecallAt(spark, cl, it)
        println(f"NNDTUNE dir=$d corpus=clustered iters=$it recall=$r%.4f")
      }
      val rf = graft.queries.Ann.nndRecallAt(spark, d, graft.queries.Ann.NND_ITERS)
      println(f"NNDTUNE dir=$d corpus=flat iters=${graft.queries.Ann.NND_ITERS} recall=$rf%.4f")
    }
    spark.stop()
  }
}

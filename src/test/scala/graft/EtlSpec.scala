package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EtlOps

class EtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("sanitizeHeader lowercases, maps # and fixes objectid_N") {
    val df = Seq((1, "a", 2)).toDF("OBJECTID_1", "N#NAME", "Region#Key")
    assert(EtlOps.sanitizeHeader(df).columns.toSeq ==
      Seq("objectid", "n_name", "region_key"))
  }

  test("sanitizeHeader leaves objectid_N alone when objectid exists") {
    val df = Seq((1, 2)).toDF("objectid", "objectid_1")
    assert(EtlOps.sanitizeHeader(df).columns.toSeq == Seq("objectid", "objectid_1"))
  }

  test("sanitizeHeader fails fast on post-sanitation name collisions") {
    val df = Seq((1, 2)).toDF("A#B", "a_b")
    val e = intercept[IllegalArgumentException](EtlOps.sanitizeHeader(df))
    assert(e.getMessage.contains("A#B") && e.getMessage.contains("a_b"))
  }

  test("cleanNullBytes strips real NUL bytes") {
    val df = Seq(("a\u0000b\u0000c", 1L)).toDF("s", "id")
    val out = EtlOps.cleanNullBytes(df, Seq("s")).select("s").as[String].head()
    assert(out == "abc")
  }

  test("fixQnan rewrites QNAN and NULL coordinate tokens") {
    val df = Seq("POLYGON ((1 2 1.#QNAN000, 3 4 NULL))").toDF("shape")
    val out = EtlOps.fixQnan(df, "shape").as[String].head()
    assert(out == "POLYGON ((1 2 NaN, 3 4 NaN))")
  }

  test("upsert: staging wins on pk conflict, prod-only rows survive") {
    val prod = Seq((1, "p1"), (2, "p2"), (3, "p3")).toDF("pk", "v")
    val staging = Seq((2, "s2"), (4, "s4")).toDF("pk", "v")
    val out = EtlOps.upsert(prod, staging, Seq("pk"))
      .orderBy("pk").as[(Int, String)].collect().toSeq
    assert(out == Seq((1, "p1"), (2, "s2"), (3, "p3"), (4, "s4")))
  }

  test("deleteStale keeps only rows still present in staging") {
    val prod = Seq((1, "p1"), (2, "p2")).toDF("pk", "v")
    val staging = Seq((2, "s2")).toDF("pk", "v")
    val out = EtlOps.deleteStale(prod, staging, Seq("pk")).as[(Int, String)].collect()
    assert(out.toSeq == Seq((2, "p2")))
  }

  test("localizeTimestamps: EST and EDT wall times map to correct UTC instants") {
    val df = Seq("2024-01-15 12:00:00", "2024-07-15 12:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val out = EtlOps.localizeTimestamps(df, Seq("ts"))
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as[String].collect()
    assert(out.toSeq == Seq("2024-01-15 17:00:00", "2024-07-15 16:00:00"))
  }

  test("agoCleanText strips non-ascii and AGO-hostile chars; epoch millis is EST-aware") {
    val out = spark.range(1)
      .select(EtlOps.agoCleanText(lit("café<b>'x' \"y\" ok")).as("c"))
      .as[String].head()
    assert(out == "caf<b>x y ok".replace("<b>", "b")) // é, quotes, <> gone
    // 2024-01-01 12:00 naive == EST wall time -> 17:00 UTC
    val ms = spark.range(1)
      .select(EtlOps.agoEpochMillis(lit("2024-01-01 12:00:00").cast("timestamp")))
      .as[Long].head()
    assert(ms == 1704128400000L) // cross-checked against DuckDB epoch_ms
  }

  test("quarantine: failed checks collect in order; NULL check result fails closed") {
    val df = Seq(
      (1L, Some(10.0), Some("p")),   // clean
      (2L, Some(-1.0), Some("p")),   // one failure
      (3L, Some(-1.0), None),        // both failures
      (4L, None, Some("p"))          // NULL check input -> fail closed
    ).toDF("id", "value", "props")
    val out = EtlOps.quarantine(df, Seq(
        "null_props" -> col("props").isNotNull,
        "positive_value" -> (col("value") > 0)))
      .select(col("id"), col("qc_status"), concat_ws(",", col("qc_reasons")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("pass", ""))
    assert(out(2L) == ("quarantine", "positive_value"))
    assert(out(3L) == ("quarantine", "null_props,positive_value"))
    // value NULL makes (value > 0) NULL — must quarantine, never pass
    assert(out(4L) == ("quarantine", "positive_value"))
  }

  test("enrichLookup appends lookup fields and broadcasts") {
    val fact = Seq((1, 10), (2, 99)).toDF("id", "key")
    val lut = Seq((10, "ten")).toDF("k", "label")
    val out = EtlOps.enrichLookup(fact, lut, Seq("key" -> "k"))
    assert(out.columns.toSeq == Seq("id", "key", "label"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(2) == "ten" && rows(1).isNullAt(2))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("dropAllNullRows removes only fully-null rows") {
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), Some("a")), (None, Some("b")), (Some(3), None), (None, None))
      .toDF("x", "y")
    val out = EtlOps.dropAllNullRows(df).collect()
    assert(out.length == 3) // only the all-null row dropped
    assert(!out.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("dateAtMidnightEastern: EST and EDT dates map to 05:00/04:00 UTC") {
    import org.apache.spark.sql.functions.{date_format, lit}
    def utc(s: String): String = spark.range(1)
      .select(date_format(EtlOps.dateAtMidnightEastern(lit(s)),
        "yyyy-MM-dd HH:mm:ss")).collect().head.getString(0)
    assert(utc("2024-01-15") == "2024-01-15 05:00:00") // EST
    assert(utc("2024-07-15") == "2024-07-15 04:00:00") // EDT
    assert(spark.range(1)
      .select(EtlOps.dateAtMidnightEastern(lit(null).cast("string")))
      .collect().head.isNullAt(0)) // empty date -> null pass-through
  }

  test("parseColumnMapping reads the reference registry format") {
    // the example_column_mapping.txt shape: braces, tabs, single quotes
    val text = "{\n    'objectid_x': 'objectid',\n\t'casenumber_x': 'casenumber',\n\t'posse_jobid_x': 'posse_jobid'\n}"
    assert(EtlOps.parseColumnMapping(text) == Map(
      "objectid_x" -> "objectid", "casenumber_x" -> "casenumber",
      "posse_jobid_x" -> "posse_jobid"))
    // double quotes, trailing comma, escapes, commas inside strings
    assert(EtlOps.parseColumnMapping("""{"a": 'b', 'c,d': "e\'f",}""") ==
      Map("a" -> "b", "c,d" -> "e'f"))
    assert(EtlOps.parseColumnMapping("{}") == Map.empty[String, String])
    // malformed shapes fail loudly
    intercept[IllegalArgumentException](EtlOps.parseColumnMapping("not a dict"))
    intercept[IllegalArgumentException](EtlOps.parseColumnMapping("{'a' 'b'}"))
    intercept[IllegalArgumentException](EtlOps.parseColumnMapping("{'a': 'b', , 'c': 'd'}"))
    intercept[IllegalArgumentException](EtlOps.parseColumnMapping("{'a': 'b', 'a': 'c'}"))
    // parsed map drives the rename end to end
    val df = Seq((1, "x")).toDF("objectid_x", "casenumber_x")
    val out = EtlOps.applyColumnMapping(df,
      EtlOps.parseColumnMapping("{'objectid_x': 'objectid'}"))
    assert(out.columns.toSeq == Seq("objectid", "casenumber_x"))
  }

  test("geocode miss semantics: empty-string AIS fields on miss, counted gate") {
    val rows = graft.queries.Etl.geocodeMiss(spark, sf).collect()
    val (miss, hit) = rows.partition(_.getLong(0) % 11 == 0)
    assert(miss.nonEmpty && hit.nonEmpty)
    // misses: empty-string AIS fields (not null), matched=0
    assert(miss.forall(r => r.getString(2) == "" && r.getString(3) == ""
      && r.getString(4) == "" && r.getInt(5) == 0))
    // hits: populated fields, EWKT shape, matched=1
    assert(hit.forall(r => r.getString(2).nonEmpty
      && r.getString(4).startsWith("SRID=2272;POINT (") && r.getInt(5) == 1))
    // the errors counter and its >5 gate are consistent on every row
    val nMiss = rows.head.getLong(6)
    assert(nMiss == miss.length.toLong)
    assert(rows.forall(r => r.getLong(6) == nMiss
      && r.getInt(7) == (if (nMiss > 5) 1 else 0)))
  }

  test("ago batch split: full 500-row batches, one partial tail per shard") {
    val rows = graft.queries.Etl.queries("ago_batch_split")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    val B = graft.queries.Etl.AgoBatchSize
    for ((shard, batches) <- rows.groupBy(_._1)) {
      val ordered = batches.sortBy(_._2)
      // batch ids are dense from 0; id ranges never overlap
      assert(ordered.map(_._2).toSeq == (0L until ordered.length.toLong))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 < b._4)
        case _ =>
      }
      // every batch but the last is exactly full; partial flag only on a
      // short tail (an exactly-full tail is NOT partial — ago.py's leftover
      // branch only fires when rows remain)
      val (full, tail) = (ordered.init, ordered.last)
      assert(full.forall(b => b._3 == B && b._6 == 0))
      assert(tail._3 <= B && (tail._6 == 1) == (tail._3 < B))
    }
    // nothing dropped: batch sizes sum to the event count
    assert(rows.map(_._3).sum == graft.core.Tables.events(spark, sf).count())
  }

  test("cdc apply: last-wins updates, tombstone deletes, inserts appear") {
    val rows = graft.queries.Etl.queries("etl_cdc_apply")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byKey = rows.map(r => r._1 -> r).toMap
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    for ((k, p) <- o) {
      if (k % 20 == 0)      // two updates — the seq-2 one must win
        assert(byKey(k) == ((k, p + 20.0, "updated")), s"key $k")
      else if (k % 4 == 0)
        assert(byKey(k) == ((k, p + 10.0, "updated")), s"key $k")
      else if (k % 5 == 0)  // tombstoned
        assert(!byKey.contains(k), s"key $k not deleted")
      else
        assert(byKey(k) == ((k, p, "kept")), s"key $k")
      if (k % 9 == 0)
        assert(byKey(k + 10000000L) == ((k + 10000000L, 1.0, "inserted")))
    }
    // row accounting: base − deletes + inserts
    val expected = o.length - o.count(x => x._1 % 5 == 0 && x._1 % 4 != 0) +
      o.count(_._1 % 9 == 0)
    assert(rows.length == expected)
  }

  test("profile: one-pass per-column stats match driver-side recomputation") {
    val rows = graft.queries.Etl.queries("etl_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(rows.keySet == Set("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
    val o = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = o.length.toLong
    assert(rows.values.forall(_._1 == n))
    // key column: dense, no nulls, all distinct
    val k = rows("o_orderkey")
    assert(k._2 == 0L && k._3 == n && k._4 == o.map(_._1).min.toString)
    // status: exactly the planted %13 nulls; distincts among surviving values
    val sKept = o.filter(_._1 % 13 != 0).map(_._2)
    val st = rows("o_orderstatus")
    assert(st._2 == o.count(_._1 % 13 == 0).toLong)
    assert(st._3 == sKept.distinct.length.toLong)
    assert(st._4 == sKept.min && st._5 == sKept.max)
  }

  test("checksum: value-sensitive where a row count is blind") {
    val out = graft.queries.Etl.queries("etl_checksum")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set("customer", "lineitem", "orders"))
    // counts agree with the tables themselves
    assert(out("customer")._1 == graft.core.Tables.customer(spark, sf).count())
    assert(out("lineitem")._1 == graft.core.Tables.lineitem(spark, sf).count())
    // deterministic across runs (order independence of xor + decimal sum)
    val again = graft.queries.Etl.queries("etl_checksum")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out == again)
    // signatures are value-level: the three tables cannot collide
    assert(out.values.map(_._3).toSet.size == 3)
  }

  test("schemaDiff statuses") {
    val prod = spark.range(1).select($"id", lit("x").as("a"), lit(1.0).as("b"))
    val staging = spark.range(1).select($"id", lit(2).as("a"), lit("new").as("c"))
    val m = EtlOps.schemaDiff(spark, prod, staging).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(m == Map("id" -> "match", "a" -> "type_mismatch",
      "b" -> "missing_in_staging", "c" -> "missing_in_prod"))
  }
  test("anonymize: join-stable tokens, generalized quasi-identifiers") {
    val out = graft.queries.Etl.queries("etl_anonymize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val raw = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.length == raw.length)
    val rawMap = raw.map(r => r._1 -> r).toMap
    for ((id, tok, bucket, _) <- out) {
      val (_, name, bal) = rawMap(id)
      // token leaks nothing of the original name
      assert(tok.startsWith("cust_") && !tok.contains(name))
      // bucket generalizes: floor to the containing 100-unit band
      assert(bucket % 100.0 == 0.0 && bucket <= bal && bal < bucket + 100.0)
    }
    // deterministic (join-stable across extracts)
    val again = graft.queries.Etl.queries("etl_anonymize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.sameElements(again))
  }
  test("partition plan: file counts and shares reconcile") {
    val rows = graft.queries.Etl.queries("etl_partition_plan")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val t = graft.queries.Etl.TargetFileBytes
    // ceil division and share bookkeeping
    assert(rows.forall { case (_, _, b, f, _) => f == (b + t - 1) / t && f >= 1 })
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-3)
    assert(rows.map(_._2).sum == graft.core.Tables.orders(spark, sf).count())
    // bytes follow width, not just count: every group averages > 30 B/row
    assert(rows.forall { case (_, n, b, _, _) => b > 30L * n })
  }
  test("type infer: every verdict class exercised; counts reconcile") {
    val rows = graft.queries.Etl.queries("etl_type_infer")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(rows.keySet == Set("c_key", "c_price", "c_price_dirty", "c_date", "c_text"))
    val n = graft.core.Tables.orders(spark, sf).count()
    assert(rows.values.forall(_._1 == n))
    assert(rows("c_key")._5 == "bigint")
    assert(rows("c_price")._5 == "double")
    assert(rows("c_price_dirty")._5 == "text") // one 'N/A' demotes the column
    assert(rows("c_date")._5 == "date")
    assert(rows("c_text")._5 == "text")
    // int parses are a subset of numeric parses everywhere
    assert(rows.values.forall { case (_, i, num, _, _) => i <= num })
    // the dirty column fails exactly the planted rows
    val planted = graft.core.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 13 === 0).count()
    assert(rows("c_price_dirty")._3 == n - planted)
  }

  test("fk check: planted orphans counted, clean reference passes") {
    val rows = graft.queries.Etl.queries("etl_fk_check")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = rows("lineitem.orderkey->orders")
    val cu = rows("orders.custkey->customer")
    val planted = graft.core.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") % 97 === 0).count()
    assert(li._2 == planted && planted > 0)
    assert(li._3 >= 1000000000000L) // first offender is a shifted key (key 0 → exactly 1e12)
    assert(cu._2 == 0L && cu._3 == -1L) // clean check: no orphans, sentinel
    assert(li._1 == graft.core.Tables.lineitem(spark, sf).count())
  }
  test("snapshot diff: all four verdicts, counts match the planted edits") {
    val rows = graft.queries.Etl.queries("etl_snapshot_diff")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("added", "removed", "changed", "unchanged"))
    val keys = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    assert(rows("removed")._1 == keys.count(_ % 31 == 0))
    assert(rows("added")._1 == keys.count(_ % 41 == 0))
    // changed = %7 keys that survived the removal
    assert(rows("changed")._1 == keys.count(k => k % 7 == 0 && k % 31 != 0))
    assert(rows.values.map(_._1).sum ==
      keys.length + keys.count(_ % 41 == 0)) // every key classified once
    assert(rows("added")._2 >= 2000000000000L)
  }

  test("snapshotDiff operator: NULL column values never read as absent") {
    import spark.implicits._
    val old = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "v")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "v")
    val m = EtlOps.snapshotDiff(old, neu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // row 1: NULL -> NULL is UNCHANGED (presence via markers, not values)
    assert(m == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("snapshotDiff operator: NULL keys match themselves (null-safe join)") {
    import spark.implicits._
    val old = Seq((Option(1L), "x"), (Option.empty[Long], "y")).toDF("k", "v")
    val neu = Seq((Option(1L), "x"), (Option.empty[Long], "z")).toDF("k", "v")
    val m = EtlOps.snapshotDiff(old, neu, Seq("k")).collect()
      .map(r => Option(r.get(0)) -> r.getString(1)).toMap
    // the NULL-key row pairs with itself via <=> — changed (y→z), never
    // the added+removed double-count plain equality produced (r5 ADVICE)
    assert(m == Map(Option(1L) -> "unchanged", None -> "changed"))
  }
  test("ago upsert route: adds/updates/dup-deletes with the live objectid swapped in") {
    val rows = graft.queries.Etl.queries("ago_upsert_route")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keys = graft.core.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val adds = rows.filter(_._2 == "add")
    val upd = rows.filter(_._2 == "update")
    val dels = rows.filter(_._2 == "delete")
    // every %10==3 PK is absent from the live layer -> routed to adds
    assert(adds.length == keys.count(_ % 10 == 3) && adds.forall(_._3 == -1L))
    // every surviving PK updates, carrying the live (first) objectid 2pk+1
    assert(upd.length == keys.count(_ % 10 != 3))
    assert(upd.forall { case (pk, _, oid) => oid == 2 * pk + 1 })
    // each planted dup live feature (2pk+2) surfaces exactly once as delete
    assert(dels.map(_._1).sorted.sameElements(
      keys.filter(k => k % 10 != 3 && k % 97 == 0).sorted))
    assert(dels.forall { case (pk, _, oid) => oid == 2 * pk + 2 })
    assert(dels.nonEmpty) // fixture actually exercises the dup-delete path
  }

  test("ago index manifest: composite split, name derivation, every unique-lookup branch") {
    val rows = graft.queries.Etl.queries("ago_index_manifest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4), r.getInt(5), r.getString(6)))
    val ks = graft.core.Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"),
        lower(regexp_replace(col("n_name"), " ", "_")))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(rows.nonEmpty)
    for ((ds, _, raw, name, fields, uniq, json) <- rows) {
      val k = ks(ds)
      // ago.py:966-968 + 972: pluses become commas in fields, underscores
      // in the _idx-suffixed name
      assert(name == raw.replace("+", "_") + "_idx")
      assert(fields == raw.replace("+", ","))
      // composite raw entries never match a schema field name (ago.py:1037)
      if (raw.contains("+")) assert(uniq == 0)
      // the S3-404 branch: no schema file -> nothing is unique
      if (k % 5 == 0) assert(uniq == 0)
      // objectid unique iff its schema entry exists and carries unique=true
      if (raw == "objectid") assert((uniq == 1) == (k % 5 != 0 && k % 5 != 2))
      // 'name' has no unique key in its dict; acct is explicitly false
      if (raw == "name" || raw == "acct") assert(uniq == 0)
      // the addToDefinition payload is internally consistent
      assert(json.contains(s""""name": "$name"""")
        && json.contains(s""""fields": "$fields"""")
        && json.contains(s""""isUnique": ${uniq == 1}"""))
    }
    // directive expansion: positions contiguous, count matches the directive
    for ((ds, grp) <- rows.groupBy(_._1)) {
      val k = ks(ds)
      val expect = 1 + (if (k % 2 == 0) 1 else 0) +
        (if (k % 3 == 0) 1 else 0) + (if (k % 4 == 1) 1 else 0)
      assert(grp.map(_._2).sorted.toSeq == (0 until expect))
    }
    // the fixture exercises both unique classes and the composite path
    assert(rows.exists(_._6 == 1) && rows.exists(_._6 == 0))
    assert(rows.exists(_._3.contains("+")))
  }

  test("carto privacy: substring publicuser test, absent directive, grant script") {
    val rows = graft.queries.Etl.queries("carto_privacy")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getString(4)))
    val ks = graft.core.Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"),
        lower(regexp_replace(col("n_name"), " ", "_")))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(rows.nonEmpty)
    for ((ds, su, privacy, nUsers, grants) <- rows) {
      val k = ks(ds)
      // carto_.py:474-479: 'publicuser' in the RAW string — substring
      // containment, so the notapublicuserish row is PUBLIC too
      assert((privacy == "PUBLIC") == su.contains("publicuser"))
      if (k % 4 == 0) { // absent directive: PRIVATE + empty grants
        assert(su == "" && privacy == "PRIVATE" && nUsers == 0 && grants == "")
      } else {
        // one GRANT per comma-separated user, in directive order
        val users = su.split(",").toSeq
        assert(nUsers == users.size)
        assert(grants == users.map(u =>
          s"""GRANT SELECT ON "$ds" TO "$u";""").mkString(""))
      }
    }
    // fixture coverage: both privacy classes, the quirk row, an absent row
    assert(rows.exists(_._3 == "PUBLIC") && rows.exists(_._3 == "PRIVATE"))
    assert(rows.exists(r => r._3 == "PUBLIC" && !r._2.split(",").contains("publicuser")))
    assert(rows.exists(_._2 == ""))
  }

  test("pk check: planted duplicates surface, clean key passes") {
    val rows = graft.queries.Etl.queries("etl_pk_check")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val keys = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    val staged = rows("orders_staged.o_orderkey")
    val planted = keys.count(_ % 53 == 0)
    assert(staged._1 == keys.length + planted)
    assert(staged._2 == keys.length.toLong)
    assert(staged._3 == planted && planted > 0)
    assert(staged._4 == 2L)
    val clean = rows("customer.c_custkey")
    assert(clean._3 == 0L && clean._4 == 1L && clean._1 == clean._2)
  }
  test("dead column report: planted dead columns classified, live ones pass") {
    val rows = graft.queries.Etl.queries("etl_dead_column")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows("c_legacy_notes")._3 == "all_null" && rows("c_legacy_notes")._1 == 0L)
    assert(rows("c_source_system")._3 == "constant" && rows("c_source_system")._2 == 1L)
    assert(rows("o_orderkey")._3 == "ok")
    assert(rows("o_orderstatus")._3 == "ok")
  }
  test("backfill plan: exactly the planted missing days, in order") {
    val rows = graft.queries.Etl.queries("etl_backfill_plan")(spark, sf)
      .collect().map(_.getString(0))
    assert(rows.toSeq == Seq("2024-01-05", "2024-01-17"))
  }

  test("rule engine: six rules from one scan; format/range fire, null/domain pass") {
    val rows = graft.queries.Etl.queries("etl_rule_engine")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 6)
    val n = rows.values.head._2
    assert(rows.values.forall(_._2 == n), "every rule checked every row")
    // clean gates: nulls and status domain hold on this data
    assert(rows("orderkey_not_null")._1 == 0)
    assert(rows("custkey_not_null")._1 == 0)
    assert(rows("status_in_domain")._1 == 0)
    // '4-NOT SPECIFIED' has a space — the format rule must fire
    assert(rows("priority_format")._1 > 0)
    assert(rows.values.forall { case (v, nn, ppm) =>
      ppm == (nn - v) * 1000000L / nn })
    // single-pass claim: exactly one scan of orders in the plan
    val plan = graft.queries.Etl.queries("etl_rule_engine")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1, "rules must share one scan")
  }

  test("psi drift: bucket spine complete, totals consistent, zero self-drift") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.Etl.queries("etl_psi_drift")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val buckets = rows.filter(_._1 >= 0)
    assert(buckets.length == graft.queries.Etl.PsiBuckets)
    assert(buckets.map(_._1).sorted.sameElements(0L until graft.queries.Etl.PsiBuckets.toLong))
    val total = rows.find(_._1 == -1L).get
    assert(buckets.map(_._2).sum == total._2 && buckets.map(_._3).sum == total._3)
    // PSI ≥ 0 up to rounding slack, and both periods are genuinely populated
    assert(total._4 >= -0.001, s"psi ${total._4}")
    assert(total._2 > 0 && total._3 > 0)
    // every bucket term has the sign of its (smoothed) proportion gap —
    // (p−q) and log(p/q) always agree, so no term may be negative
    assert(buckets.forall(_._4 >= -0.000002), "PSI terms are non-negative")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** ETL operators re-expressing the reference's table-lifecycle semantics
  * (databridge-etl-tools) as declarative Spark transformations.
  *
  * Everything here is either pure metadata work (schema/rename — driver-side,
  * O(#columns)) or a single declarative DataFrame op (join/filter/expr) that
  * Catalyst plans with pushdown + broadcast intact, so each operator scales to
  * arbitrary input size: no collect(), no per-row driver logic.
  */
object EtlOps {

  /** Header sanitation, re-expressing postgres.py:400-418 + opendata.py:96-98:
    * lowercase, trim, `#`→`_`, and if no `objectid` column exists, rename the
    * first `objectid_N` column to `objectid` (Oracle-export artifact fix).
    */
  def sanitizeHeader(df: DataFrame): DataFrame = {
    val lowered = df.columns.map(
      _.filterNot(_ == 0xFEFF.toChar) // BOM leaks into the first CSV header
        .trim.toLowerCase.replace("#", "_"))
    val hasObjectId = lowered.contains("objectid")
    val objectidN = "^objectid_\\d+$".r
    var renamedFirst = false
    val fixed = lowered.map { c =>
      if (!hasObjectId && !renamedFirst && objectidN.matches(c)) {
        renamedFirst = true; "objectid"
      } else c
    }
    // distinct inputs can sanitize to one name ('A#B' and 'a_b' → 'a_b');
    // toDF would accept the duplicates and every later by-name lookup or
    // parquet write would fail far from here — fail fast with the originals
    val collisions = df.columns.zip(fixed).groupBy(_._2).filter(_._2.length > 1)
    require(collisions.isEmpty,
      "header sanitation collisions: " + collisions.map { case (to, from) =>
        from.map(_._1).mkString("[", ", ", "]") + " -> " + to
      }.mkString("; "))
    df.toDF(fixed.toIndexedSeq: _*)
  }

  /** Parse the reference's column-mapping registry text — a Python dict
    * literal, read via ast.literal_eval from an inline string or a file/S3
    * key (postgres.py:651-668 _make_mapping_dict;
    * example_column_mapping.txt) — into the Map [[applyColumnMapping]]
    * takes. Accepts single- or double-quoted strings, \\-escapes inside
    * them, arbitrary whitespace/tabs/newlines, and a trailing comma (all
    * accepted by literal_eval). Anything that is not a flat str→str dict
    * fails loudly, mirroring the reference's `assert type(...) == dict`.
    */
  def parseColumnMapping(text: String): Map[String, String] = {
    val t = text.trim
    require(t.startsWith("{") && t.endsWith("}"),
      "column mapping must be a {...} dict literal")
    val s = t.substring(1, t.length - 1)
    def fail(pos: Int, what: String): Nothing =
      throw new IllegalArgumentException(
        s"column mapping: expected $what at offset ${pos + 1}: " +
          s"...${s.substring(math.max(0, pos - 10), math.min(s.length, pos + 10))}...")
    def skipWs(i: Int): Int = { var j = i
      while (j < s.length && s(j).isWhitespace) j += 1; j }
    // one quoted string with \x escapes, either quote style
    def readString(i: Int): (String, Int) = {
      if (i >= s.length || (s(i) != '\'' && s(i) != '"'))
        fail(i, "a quoted string")
      val q = s(i); val sb = new StringBuilder; var j = i + 1
      while (j < s.length && s(j) != q) {
        if (s(j) == '\\' && j + 1 < s.length) { sb.append(s(j + 1)); j += 2 }
        else { sb.append(s(j)); j += 1 }
      }
      if (j >= s.length) fail(i, s"a closing $q")
      (sb.toString, j + 1)
    }
    var i = skipWs(0)
    val pairs = scala.collection.mutable.ListBuffer.empty[(String, String)]
    while (i < s.length) {
      val (k, afterK) = readString(i)
      i = skipWs(afterK)
      if (i >= s.length || s(i) != ':') fail(i, "':'")
      i = skipWs(i + 1)
      val (v, afterV) = readString(i)
      pairs += (k -> v)
      i = skipWs(afterV)
      if (i < s.length) {
        if (s(i) != ',') fail(i, "',' or end of dict")
        i = skipWs(i + 1) // trailing comma before '}' is fine (literal_eval)
      }
    }
    // divergence from literal_eval (which last-wins silently): duplicate
    // keys in a rename registry are an authoring error — fail loudly
    val dupes = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dupes.isEmpty, s"duplicate mapping keys: ${dupes.mkString(", ")}")
    pairs.toMap
  }

  /** Mapping-dict rename + exclude-fields (postgres.py:651-680, 859-865).
    * Unmapped columns pass through; excluded columns are dropped after rename.
    */
  def applyColumnMapping(df: DataFrame, mapping: Map[String, String],
                         exclude: Seq[String] = Nil): DataFrame = {
    val renamed = df.toDF(df.columns.map(c => mapping.getOrElse(c, c)).toIndexedSeq: _*)
    if (exclude.isEmpty) renamed else renamed.drop(exclude: _*)
  }

  /** Cast columns to a target (JSON-schema-derived) type map
    * (postgres.py:527-549 builds DDL from a schema; here the same schema
    * drives declarative casts). Missing columns are ignored. Uses try_cast:
    * Spark 4 runs ANSI-on by default, where a plain cast() ABORTS the job
    * on one malformed cell — a cleaning ingest must null it instead.
    * Single projection (not a withColumn chain) to keep the plan flat.
    */
  def castColumns(df: DataFrame, types: Map[String, String]): DataFrame = {
    val projected = df.columns.map { c =>
      types.get(c) match {
        case Some(t) => expr(s"try_cast(`$c` AS $t)").as(c)
        case None    => col(c)
      }
    }
    df.select(projected.toIndexedSeq: _*)
  }

  /** Remove NUL bytes (and other C0 controls the reference's csv writer would
    * choke on) from string columns (_cleanup.py:40-66 semantics, applied to
    * every row rather than the reference's first-500-line heuristic — on a
    * cluster the scan is free and partial cleaning is a correctness bug).
    */
  def cleanNullBytes(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, regexp_replace(col(c), "[\\x00\\x01]", "")))

  /** QNAN / literal-NULL coordinate fix inside WKT strings
    * (postgres.py:374-381): `1.#QNAN000` and `NULL` tokens → `NaN`.
    */
  def fixQnan(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName,
      regexp_replace(col(colName), "(1\\.#QNAN000|NULL)", "NaN"))

  /** Naive-timestamp localization (postgres.py:837-857): interpret a naive
    * timestamp as wall time in `zone` and convert to the UTC instant —
    * the Spark equivalent of pytz `localize` + UTC normalize.
    */
  def localizeTimestamps(df: DataFrame, cols: Seq[String],
                         zone: String = "America/New_York"): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, to_utc_timestamp(col(c), zone)))

  /** Carto date-field preparation (carto_.py:339-351): JSON-schema type
    * `date` (NOT timestamp) fields get " 00:00:00" appended and are
    * localized as US/Eastern wall time so Carto renders the calendar date
    * correctly; empty/null dates pass through as null (the reference maps
    * them to None). DST-aware: the UTC instant is 05:00 in winter (EST)
    * and 04:00 in summer (EDT).
    */
  def dateAtMidnightEastern(dateStr: Column,
                            zone: String = "America/New_York"): Column =
    to_utc_timestamp(
      to_timestamp(concat(dateStr, lit(" 00:00:00")), "yyyy-MM-dd HH:mm:ss"),
      zone)

  /** Drop rows where EVERY column is null — the reference removes all-null
    * rows when converting spreadsheet sheets to csv (sharepoint.py:118-126:
    * xlsx exports commonly carry trailing blank rows). One codegen'd filter
    * pass, no shuffle.
    */
  def dropAllNullRows(df: DataFrame): DataFrame =
    df.filter(df.columns.map(c => col(c).isNotNull).reduce(_ || _))

  /** Dead-letter routing (ago.py:320-348 writes rows that failed an AGO
    * batch to an error CSV for quarantine): tag every row with the named
    * checks it fails. Adds `qc_reasons` (failed check names, in declaration
    * order) and `qc_status` ('pass' / 'quarantine'); callers route each
    * side to its sink. A NULL check result counts as FAILED (three-valued
    * logic is hostile here — an unevaluable check must never wave a row
    * through). One projection pass, no shuffle.
    */
  def quarantine(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val reasons = array_compact(array(checks.map { case (name, ok) =>
      when(ok, lit(null).cast("string")).otherwise(lit(name))
    }: _*))
    df.withColumn("qc_reasons", reasons)
      .withColumn("qc_status",
        when(size(col("qc_reasons")) === 0, lit("pass")).otherwise(lit("quarantine")))
  }

  /** AGO row-format text cleaning (ago.py:445-452): strip non-ASCII bytes
    * and the characters AGO chokes on (' " < >) from a column headed into
    * an addFeatures/updateFeatures payload. One codegen regexp.
    */
  def agoCleanText(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]|['\"<>]", "")

  /** AGO date formatting (ago.py:462-471): esriFieldTypeDate values are
    * posted as UTC epoch MILLIS; a timezone-naive value is interpreted as
    * Eastern wall time first. (The reference's `timezone.est` is a latent
    * AttributeError — `datetime.timezone` only defines `utc` — so the
    * naive branch would crash there; this models the documented intent.)
    */
  def agoEpochMillis(ts: Column, zone: String = "America/New_York"): Column =
    unix_millis(to_utc_timestamp(ts, zone))

  /** PK upsert of staging into prod (postgres.py:1092-1180
    * INSERT .. ON CONFLICT DO UPDATE): staging wins on PK collision, prod
    * rows without a staging match survive. Set-oriented: one anti-join
    * (shuffle on pk, staging side broadcast if small) + union — the
    * MERGE plan a warehouse would produce, no row-at-a-time conflict checks.
    */
  def upsert(prod: DataFrame, staging: DataFrame, pks: Seq[String]): DataFrame =
    prod.join(staging.select(pks.map(col): _*), pks, "left_anti")
      .unionByName(staging)

  /** Delete-stale (postgres.py:1034-1090): the reference DELETEs prod PKs
    * absent from staging; expressed set-wise that leaves the SURVIVOR set —
    * prod rows whose PK still exists in staging — which is what this
    * returns, as a left-semi join (never materializes staging's non-key
    * columns).
    */
  def deleteStale(prod: DataFrame, staging: DataFrame, pks: Seq[String]): DataFrame =
    prod.join(staging.select(pks.map(col): _*), pks, "left_semi")

  /** Row-count verification (postgres.py:867-890, ago.py:668-673): one row
    * per table with its count. Counts run as independent jobs; at scale each
    * is a metadata-only parquet row-group sum.
    */
  def rowCountCheck(spark: SparkSession, tables: Seq[(String, DataFrame)]): DataFrame = {
    val counted = tables.map { case (n, df) =>
      df.groupBy().agg(count(lit(1)).as("n_rows")).select(lit(n).as("table_name"), col("n_rows"))
    }
    counted.reduce(_ unionByName _)
  }

  /** Null/empty verification (postgres.py:867-890 companion checks): one
    * row per column with null and empty-string counts — a single
    * aggregation pass regardless of column count.
    */
  def nullEmptyCheck(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullEmptyCheck needs at least one column")
    val aggs = cols.flatMap { c =>
      val isStr = df.schema(c).dataType.typeName == "string"
      Seq(
        // coalesce: sum over zero rows is null — an empty table is clean (0)
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"_null_$c"),
        (if (isStr)
           coalesce(sum(when(col(c) === "", 1L).otherwise(0L)), lit(0L))
         else lit(0L)).as(s"_empty_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    cols.map(c => wide.select(lit(c).as("column_name"),
        col(s"_null_$c").as("n_null"), col(s"_empty_$c").as("n_empty")))
      .reduce(_ unionByName _)
  }

  /** Schema diff report (postgres.py:455-488): full outer compare of
    * (column → type) between prod and staging. Driver-side metadata only.
    */
  def schemaDiff(spark: SparkSession, prod: DataFrame, staging: DataFrame): DataFrame = {
    // timestamp_ntz vs timestamp is a storage nuance, not schema drift.
    def typ(f: org.apache.spark.sql.types.StructField): String =
      f.dataType.simpleString.stripSuffix("_ntz")
    val p = prod.schema.fields.map(f => f.name -> typ(f)).toMap
    val s = staging.schema.fields.map(f => f.name -> typ(f)).toMap
    val rows = (p.keySet ++ s.keySet).toSeq.sorted.map { c =>
      val (pt, st) = (p.get(c), s.get(c))
      val status = (pt, st) match {
        case (Some(a), Some(b)) if a == b => "match"
        case (Some(_), Some(_))           => "type_mismatch"
        case (Some(_), None)              => "missing_in_staging"
        case _                            => "missing_in_prod"
      }
      Row(c, pt.getOrElse("-"), st.getOrElse("-"), status)
    }
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("prod_type", StringType, nullable = false),
      StructField("staging_type", StringType, nullable = false),
      StructField("status", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Deterministic `pct`% sample: keep rows whose salted content hash of
    * `key` lands in the first `pct` of 100 buckets. Reproducible across
    * runs, engines and cluster sizes (unlike `df.sample`, which is seeded
    * per partition split), and consistent across tables sharing a key —
    * sample orders and lineitem by the same order key and the sample joins.
    */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(graft.functions.HashFunctions.md5Long(key) % 100 < pct)
  }

  /** Geocoder-style enrichment (ais_geocoder.py): left join a broadcast
    * lookup keyed on `keys`, appending its non-key fields. The reference
    * calls an HTTP geocoder per row; at scale the lookup is a dimension
    * table and the enrichment is a broadcast hash join.
    */
  /** Row-level diff between two snapshots of the same table — the
    * value-level complement of [[schemaDiff]] (which compares shape) and
    * [[rowCountCheck]] (which compares size): per key, is the row added,
    * removed, changed, or unchanged between loads. ONE null-safe full
    * outer hash join on the key — `<=>` on the key columns too, so a row
    * whose key is NULL in both snapshots matches ITSELF (plain equality
    * would report it added + removed); non-key columns compare with <=>
    * folded into a single predicate, so the operator is generic over any
    * column set. Both inputs must share the key columns; compared columns
    * are the intersection of the remaining ones.
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    val compared = old.columns.filterNot(keys.contains)
      .intersect(neu.columns.filterNot(keys.contains)).toSeq
    require(compared.nonEmpty, "snapshotDiff needs at least one non-key column in common")
    val o = old.select((keys ++ compared).map(col): _*).toDF(
      keys ++ compared.map("old_" + _): _*)
    val n = neu.select((keys ++ compared).map(col): _*).toDF(
      keys ++ compared.map("new_" + _): _*)
    // presence must come from the join side, not value nullability (a
    // legitimately-NULL column would read as "absent"): a literal marker
    // column per side survives the full outer join unambiguously
    val om = o.withColumn("_old_present", lit(1))
    val nm = n.withColumn("_new_present", lit(1))
    val j = om.join(nm, keys.map(k => om(k) <=> nm(k)).reduce(_ && _), "full_outer")
    val changed = compared.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    j.select(keys.map(k => coalesce(om(k), nm(k)).as(k)) :+
      when(col("_old_present").isNull, "added")
        .when(col("_new_present").isNull, "removed")
        .when(changed, "changed")
        .otherwise("unchanged").as("diff_status"): _*)
  }

  def enrichLookup(fact: DataFrame, lookup: DataFrame,
                   keys: Seq[(String, String)]): DataFrame = {
    val cond = keys.map { case (f, l) => fact(f) === lookup(l) }.reduce(_ && _)
    val lookupVals = lookup.columns.filterNot(keys.map(_._2).contains)
    // name collisions with fact columns get a lookup_ prefix — duplicate
    // column names break every later by-name reference and parquet write
    val appended = lookupVals.map { c =>
      if (fact.columns.contains(c)) lookup(c).as(s"lookup_$c") else lookup(c)
    }
    fact.join(broadcast(lookup), cond, "left")
      .select(fact.columns.map(fact(_)) ++ appended: _*)
  }
}

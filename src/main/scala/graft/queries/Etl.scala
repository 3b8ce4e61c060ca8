package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.EtlOps

/** Driver-contract queries exercising the ETL operator family
  * (SURVEY.md §2 "ETL operators"). Each query deterministically "dirties"
  * a testdata table the way the reference's sources do (Oracle CSV headers,
  * NUL bytes, naive timestamps, staging/prod drift) and applies the operator;
  * the DuckDB oracle reproduces the same dirtying + expected semantics.
  */
object Etl {

  // Header sanitation: simulate an Oracle CSV export header
  // (uppercase, '#' separators, objectid_1 artifact) and sanitize it.
  def headerSanitize(s: SparkSession, d: String): DataFrame = {
    val dirty = nation(s, d).toDF("OBJECTID_1", "N#NAME", "Region#Key")
    EtlOps.sanitizeHeader(dirty).orderBy("objectid")
  }

  // Mapping-dict rename + exclude-fields on orders.
  def columnMap(s: SparkSession, d: String): DataFrame = {
    val mapped = EtlOps.applyColumnMapping(
      orders(s, d),
      Map("o_orderstatus" -> "status", "o_totalprice" -> "total_price"),
      exclude = Seq("o_orderpriority", "o_orderdate"))
    mapped.orderBy("o_orderkey")
  }

  // JSON-schema-driven casts: numeric narrowing, decimal, date, string.
  // The DECIMAL/DATE values are rendered as strings in the final projection:
  // the cast semantics are still exercised (and spec-tested as typed), but the
  // comparison surface avoids engine-specific typed encodings (int128/decimal/
  // date32) that hash differently across DuckDB/Arrow readers.
  def schemaCast(s: SparkSession, d: String): DataFrame = {
    EtlOps.castColumns(orders(s, d), Map(
      "o_orderkey"   -> "int",
      "o_totalprice" -> "decimal(12,2)",
      "o_orderdate"  -> "date"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("string").as("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy("o_orderkey")
  }

  // NUL-byte + QNAN cleanup. The control byte is injected deterministically
  // (chr(1) stands in for the NUL byte in the oracle-paired path because
  // DuckDB VARCHARs cannot hold \x00; the real \x00 path is spec-tested).
  def nullClean(s: SparkSession, d: String): DataFrame = {
    val dirty = documents(s, d).select(col("doc_id"),
      concat(substring(col("text"), 1, 20), lit("\u0001"),
             lit("POINT (1.#QNAN000 NULL)")).as("payload"))
    val cleaned = EtlOps.fixQnan(EtlOps.cleanNullBytes(dirty, Seq("payload")), "payload")
    cleaned.select(col("doc_id"), col("payload"), length(col("payload")).as("n_chars"))
      .orderBy("doc_id")
  }

  // Naive event timestamps localized as US/Eastern wall time → UTC instants.
  def tzLocalize(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_id"), col("ts"))
    EtlOps.localizeTimestamps(e, Seq("ts"))
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("utc_ts"))
      .orderBy("event_id")
  }

  // SCD2 history construction: turn a change-event stream into versioned
  // validity intervals — the warehouse-standard alternative to the
  // reference's wholesale truncate/upsert replacement (each entity keeps
  // every state with [valid_from, valid_to) and an is_current marker).
  // version and the interval end share ONE window sort (same partition +
  // order), so the whole build is a single shuffle on the entity key.
  def scd2History(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        col("next_ts").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "version")
  }

  // Carto date-field localization (carto_.py:339-351): schema-type `date`
  // fields get midnight appended and are localized as US/Eastern wall time;
  // empty dates come through blank. The fixture's dates span years, so both
  // EST (UTC 05:00) and EDT (UTC 04:00) instants are exercised; every 13th
  // key is planted null to prove the None pass-through.
  def dateLocalize(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val dateStr = when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
      .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd"))
    o.select(col("o_orderkey"),
        coalesce(date_format(EtlOps.dateAtMidnightEastern(dateStr),
          "yyyy-MM-dd HH:mm:ss"), lit("")).as("carto_ts"))
      .orderBy("o_orderkey")
  }

  // AGO row formatting ahead of an addFeatures POST: ASCII/quote-char
  // cleaning on text, esriFieldTypeDate → UTC epoch millis (naive values
  // read as Eastern wall time). Planted unicode + quote chars prove the
  // cleaning; the date leg shares etl_tz_localize's localization semantics.
  def agoFormatRow(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val dirty = concat(col("event_type"), lit("<tag>'café'\"x\""))
    e.select(col("event_id"),
        graft.operators.EtlOps.agoCleanText(dirty).as("cleaned"),
        graft.operators.EtlOps.agoEpochMillis(col("ts")).as("date_ms"))
      .orderBy("event_id")
  }

  // Incremental high-watermark extraction: given the previous run's
  // watermark, pull only newer rows and report the new watermark alongside
  // them — the restartable incremental-load shape (a full-scan filter that
  // parquet min/max statistics prune to the recent files at scale; no state
  // beyond one timestamp). The fixture's watermark is the corpus midpoint,
  // derived deterministically in both engines.
  def incrementalWatermark(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    // previous watermark: midpoint of the corpus time range, derived from
    // the data in BOTH engines (no hardcoded instant) and kept inside the
    // plan as a broadcast 1-row aggregate — same decorrelation shape as
    // q23, no driver-side action
    // explicit floor on BOTH engines: Spark's cast(double→long) truncates
    // while DuckDB's CAST rounds-to-nearest, so an odd min+max sum would
    // otherwise put the two watermarks 1 s apart (the sum stays < 2^53, so
    // the double midpoint is exact and floor is deterministic)
    val wmDf = e.agg(floor((min(col("ts")).cast("long")
      + max(col("ts")).cast("long")) / 2).cast("long").as("wm_sec"))
    e.crossJoin(broadcast(wmDf))
      .filter(col("ts").cast("long") > col("wm_sec"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_new"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("new_watermark"))
      .orderBy("event_type")
  }

  // Dead-letter routing over a frame with planted defects: negative values
  // and null props must land in quarantine with the right reason list,
  // everything else passes. Aggregated to (status, reasons) counts for a
  // bounded oracle result.
  def quarantineQ(s: SparkSession, d: String): DataFrame = {
    val dirty = events(s, d)
      .withColumn("value",
        when(col("event_id") % 97 === 0, -col("value")).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 89 === 0, lit(null).cast("string"))
          .otherwise(col("props")))
    graft.operators.EtlOps.quarantine(dirty, Seq(
        "null_props" -> col("props").isNotNull,
        "nonpositive_value" -> (col("value") > 0)))
      .groupBy(col("qc_status"),
        concat_ws(",", col("qc_reasons")).as("reasons"))
      .agg(count(lit(1)).as("n"))
      .orderBy("qc_status", "reasons")
  }

  private def prodOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), lit("prod").as("src"))

  private[graft] def stagingOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 1000.0).as("o_totalprice"), lit("staging").as("src"))

  // PK upsert: staging wins on conflict, unmatched prod rows survive —
  // routed through a real SQL `MERGE INTO` (postgres.py:1092-1180
  // INSERT..ON CONFLICT): prod is seeded as a real catalog table, the
  // planner rewrites the MERGE group-based through
  // SupportsRowLevelOperations (StagedRowLevelOperation), and each
  // affected partition directory swaps atomically — a crash mid-merge
  // leaves prod serving its pre-merge rows. The library-API variant
  // (StagedParquet.upsertInto, the staged anti-join∪replace) remains
  // spec-covered as the bulk full-replace path.
  def upsert(s: SparkSession, d: String): DataFrame = {
    val ns = Ingest.stagedNs(s, d)
    val tbl = s"graft_staged.$ns.orders_prod"
    prodOrders(s, d).writeTo(tbl).createOrReplace()
    stagingOrders(s, d).createOrReplaceTempView("upsert_staging")
    s.sql(
      s"""MERGE INTO $tbl AS t USING upsert_staging AS u
          ON t.o_orderkey = u.o_orderkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    s.read.parquet(graft.sources.v2.StagedParquet.tableDir(s, tbl))
      .orderBy("o_orderkey")
  }

  // Delete-stale: prod rows whose PK vanished from staging are dropped.
  def deleteStale(s: SparkSession, d: String): DataFrame =
    EtlOps.deleteStale(prodOrders(s, d), stagingOrders(s, d), Seq("o_orderkey"))
      .orderBy("o_orderkey")

  // Row-count verification across the star schema.
  def rowCountCheck(s: SparkSession, d: String): DataFrame =
    EtlOps.rowCountCheck(s, Seq(
      "customer" -> customer(s, d), "orders" -> orders(s, d),
      "lineitem" -> lineitem(s, d), "nation" -> nation(s, d)))
      .orderBy("table_name")

  // Null/empty verification over a frame with planted nulls/empties.
  def nullCheck(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
        .otherwise(col("c_name")).as("name"),
      when(col("c_custkey") % 13 === 0, lit(""))
        .otherwise(col("c_mktsegment")).as("segment"),
      when(col("c_custkey") % 17 === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal")).as("acctbal"))
    EtlOps.nullEmptyCheck(c, Seq("name", "segment", "acctbal"))
      .orderBy("column_name")
  }

  // Schema diff between prod (orders) and drifted staging.
  def schemaDiff(s: SparkSession, d: String): DataFrame = {
    val staging = orders(s, d)
      .drop("o_orderpriority")
      .withColumn("o_totalprice", col("o_totalprice").cast("string"))
      .withColumn("load_ts", current_timestamp())
    EtlOps.schemaDiff(s, orders(s, d), staging).orderBy("column_name")
  }

  // AIS geocode-miss semantics (ais_geocoder.py:73-105): rows the service
  // can't match keep their input fields but get EMPTY-STRING AIS fields
  // (csv.DictWriter's restval='' over keys never set on the row), and the
  // run reports its miss counter (`errors`, printed at ais_geocoder.py:114;
  // the request layer gives up after 5 attempts). Misses planted: every
  // 11th key is absent from the service relation. The miss count and the
  // errors>5 gate ride along as a broadcast 1-row aggregate (same
  // decorrelation shape as q23 — in-plan, no driver action).
  def geocodeMiss(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val k = col("c_custkey")
    val addrs = c.select(k.as("id"), col("c_name").as("name"))
    val ais = c.filter(k % 11 =!= 0).select(
      k.as("ais_id"),
      ((k * 7919L) % 1000000L + 2400000L).cast("string").as("a_lon"),
      ((k * 104729L) % 300000L + 200000L).cast("string").as("a_lat"))
    val matched = col("ais_id").isNotNull
    val enriched = addrs.join(ais, col("id") === col("ais_id"), "left")
      .select(col("id"), col("name"),
        coalesce(col("a_lon"), lit("")).as("lon"),
        coalesce(col("a_lat"), lit("")).as("lat"),
        when(matched, concat(lit("SRID=2272;POINT ("), col("a_lon"),
            lit(" "), col("a_lat"), lit(")")))
          .otherwise(lit("")).as("shape"),
        matched.cast("int").as("matched"))
    val gate = enriched.agg(
      sum(when(col("matched") === 0, 1L).otherwise(0L)).as("n_miss"))
    enriched.crossJoin(broadcast(gate))
      .select(col("id"), col("name"), col("lon"), col("lat"), col("shape"),
        col("matched"), col("n_miss"),
        (col("n_miss") > 5).cast("int").as("fail_gate"))
      .orderBy("id")
  }

  // Geocoder-style enrichment: append nation name via broadcast lookup.
  def enrichLookup(s: SparkSession, d: String): DataFrame =
    EtlOps.enrichLookup(
      customer(s, d).select("c_custkey", "c_name", "c_nationkey"),
      nation(s, d).withColumnRenamed("n_name", "nation_name"),
      Seq("c_nationkey" -> "n_nationkey"))
      .select("c_custkey", "c_name", "nation_name", "n_regionkey")
      .orderBy("c_custkey")

  /** AGO addFeatures batch assignment (ago.py:604-616, 859-883): rows are
    * POSTed in arrival order in batches of batch_size (500), with one
    * final partial batch per stream. Here the "streams" are deterministic
    * shards (the reference runs one sequential stream; a 1000-executor
    * uploader runs one stream PER TASK, which is exactly what a global
    * row_number could not express without collapsing to one partition —
    * so the shard key is the scale design, not a concession). Emits the
    * per-batch manifest the uploader would log: size, id bounds, partial
    * flag.
    */
  val AgoBatchSize = 500L

  def agoBatchSplit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(s, d).select(col("event_id"),
      (col("event_id") % 4).cast("int").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(rn - 1) div $AgoBatchSize"))
      .groupBy(col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("event_id")).as("first_id"), max(col("event_id")).as("last_id"))
      .withColumn("is_partial", (col("n_rows") < AgoBatchSize).cast("int"))
      .orderBy("shard", "batch_id")
  }

  /** AGO upsert routing (ago/ago.py:760-887) — the reference's most-used
    * sync mode. Each staged CSV row is classified against the LIVE layer
    * by primary key: no live match → an "add" (addFeatures), a match → an
    * "update" with the live side's objectid SWAPPED onto the row (the CSV
    * objectid is ignored — updateFeatures matches on the live objectid),
    * and when the live layer holds TWO features for one PK the reference
    * deletes the second one returned, modeled here as the higher objectid
    * (>2 raises in the reference — the fixture plants at most 2).
    *
    * The reference runs one query_features HTTP call per row; at scale the
    * classification is ONE shuffle hash join staged⋈live on the PK plus a
    * per-PK dup-rank window on the live side — both linear, both
    * partitioned by the same key, no broadcast of the corpus-sized layer.
    *
    * Fixture: live = customers minus every %10==3 PK (those staged rows
    * route to adds), objectid = 2·pk+1; every %97==0 live PK carries a
    * planted duplicate feature (objectid 2·pk+2) that must surface as a
    * delete. Output = the manifest the uploader would POST, one row per
    * staged row plus one per dup-delete.
    */
  def agoUpsertRoute(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = customer(s, d)
    val liveBase = c.filter(col("c_custkey") % 10 =!= 3)
      .select(col("c_custkey").as("pk"),
        (col("c_custkey") * 2 + 1).as("objectid"))
    val livePlantedDup = c.filter(col("c_custkey") % 10 =!= 3 &&
        col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("pk"),
        (col("c_custkey") * 2 + 2).as("objectid"))
    val live = liveBase.unionByName(livePlantedDup)
    val w = Window.partitionBy(col("pk")).orderBy(col("objectid"))
    val ranked = live.withColumn("rk", row_number().over(w))
    val first = ranked.filter(col("rk") === 1)
      .select(col("pk"), col("objectid").as("live_oid"))
    val dups = ranked.filter(col("rk") === 2)
      .select(col("pk"), col("objectid").as("del_oid"))
    val staged = c.select(col("c_custkey").as("pk"), col("c_name").as("payload"))
    staged.join(first, Seq("pk"), "left")
      .select(col("pk"),
        when(col("live_oid").isNull, lit("add")).otherwise(lit("update")).as("action"),
        coalesce(col("live_oid"), lit(-1L)).as("ago_objectid"),
        col("payload"))
      .unionByName(dups.select(col("pk"), lit("delete").as("action"),
        col("del_oid").as("ago_objectid"),
        lit(null).cast("string").as("payload")))
      .orderBy("pk", "action")
  }

  /** AGO server-side statistics extraction (ago.py:898-908, the
    * `outStatistics` query parameter): instead of paging raw features, the
    * feature service returns AGGREGATED rows and the client pages + merges
    * them. Modeled as the two-level aggregation that shape IS in a
    * distributed engine: the "server" leg pre-aggregates per
    * (page, group) — page = resultOffset window of [[AgoPageSize]] ids —
    * into mergeable partials (count / exact cents sum / min / max), and
    * the "client" leg folds partials per group. Identical to Spark's own
    * partial→final aggregate split, so the plan pattern is what a 1000-
    * executor merge of per-shard server responses would run; n_pages
    * reports how many server responses fed each group.
    */
  val AgoPageSize = 1000L

  /** SDE metadata → typed DDL (db2/db2.py:101-266): the reference derives a
    * staging CREATE TABLE from three catalog relations — information_schema
    * column types (mapped through `{"character varying": "text"}`, the ESRI
    * bookkeeping column `gdb_geomattr_data` dropped), geometry_columns
    * (geom field + srid), and the SDE XML item definition whose
    * `<HasM>/<HasZ>` flags suffix the st_geometrytype-derived type (ST_
    * stripped, capitalized) into e.g. `geometry(PointMZ, 2272)`. The geom
    * column is excluded from the generic map and appended last; datasets
    * with no geometry row are plain tables; a geom dataset missing its XML
    * definition defaults M/Z to false (the reference's first-run path).
    *
    * One deviation, documented: the reference emits non-geom columns in
    * information_schema result order (unspecified); here they are
    * alphabetical — any stable order yields equivalent DDL. The whole
    * derivation is joins + string math over catalog-sized relations
    * (thousands of rows for thousands of tables), grouped per dataset with
    * an order-pinned aggregation — no driver loop, so planning DDL for an
    * entire warehouse is one job.
    *
    * Fixture: 25 datasets from nation; every %3==2 key is a plain table,
    * every %5==0 geom dataset lacks its XML row, M ⇔ key%5==1,
    * Z ⇔ even key — all four suffix classes and both no-geom paths fire.
    */
  def sdeDdl(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).select(col("n_nationkey").cast("long").as("k"),
      lower(regexp_replace(col("n_name"), " ", "_")).as("ds"))
    val colsCatalog = n.select(col("ds"), col("k"), explode(array(
        struct(lit("objectid").as("column_name"), lit("integer").as("data_type")),
        struct(lit("name").as("column_name"), lit("character varying").as("data_type")),
        struct(lit("acct").as("column_name"), lit("double precision").as("data_type")),
        struct(lit("gdb_geomattr_data").as("column_name"), lit("bytea").as("data_type")),
        struct(lit("shape").as("column_name"), lit("USER-DEFINED").as("data_type"))
      )).as("c"))
      .select(col("ds"), col("k"), col("c.column_name"), col("c.data_type"))
      // plain tables have no shape column at all
      .filter(!(col("column_name") === "shape" && col("k") % 3 === 2))
    val geomCatalog = n.filter(col("k") % 3 =!= 2)
      .select(col("ds"), lit("shape").as("geom_field"),
        when(col("k") % 2 === 0, 2272L).otherwise(4326L).as("srid"),
        element_at(array(lit("ST_POINT"), lit("ST_MULTIPOLYGON"),
          lit("ST_LINESTRING"), lit("ST_POLYGON")), (col("k") % 4 + 1).cast("int"))
          .as("st_type"),
        col("k"))
    val xmlCatalog = geomCatalog.filter(col("k") % 5 =!= 0)
      .select(col("ds"), concat(lit("<HasM>"),
        when(col("k") % 5 === 1, "true").otherwise("false"),
        lit("</HasM><HasZ>"),
        when(col("k") % 2 === 0, "true").otherwise("false"),
        lit("</HasZ>")).as("definition"))

    // the reference's regex: re.search(r"<HasM>\D*</HasM>") then 'true' in it
    def flag(tag: String) = regexp_extract(col("definition"),
      s"<$tag>[^<]*</$tag>", 0).contains("true")
    val mz = xmlCatalog.select(col("ds"),
      flag("HasM").as("m"), flag("HasZ").as("z"))
    val geom = geomCatalog.join(mz, Seq("ds"), "left")
      .select(col("ds"), col("geom_field"), col("srid"),
        concat(
          upper(substring(regexp_replace(col("st_type"), "^ST_", ""), 1, 1)),
          lower(substring(regexp_replace(col("st_type"), "^ST_", ""), 2, 1000)),
          when(coalesce(col("m"), lit(false)), "M").otherwise(""),
          when(coalesce(col("z"), lit(false)), "Z").otherwise("")).as("geom_type"))

    val generic = colsCatalog
      .filter(col("column_name") =!= "gdb_geomattr_data")
      .join(geom.select(col("ds"), col("geom_field")), Seq("ds"), "left")
      .filter(col("geom_field").isNull || col("column_name") =!= col("geom_field"))
      .select(col("ds"), lit(0).as("is_geom"), col("column_name"),
        concat(col("column_name"), lit(" "),
          when(col("data_type") === "character varying", "text")
            .otherwise(col("data_type"))).as("frag"))
    val geomFrag = geom.select(col("ds"), lit(1).as("is_geom"),
      col("geom_field").as("column_name"),
      concat(col("geom_field"), lit(" geometry("), col("geom_type"),
        lit(", "), col("srid"), lit(")")).as("frag"))

    generic.unionByName(geomFrag)
      .groupBy(col("ds"))
      .agg(count(lit(1)).as("n_cols"),
        concat(lit("CREATE TABLE staging."), col("ds"), lit(" ("),
          concat_ws(", ", transform(
            array_sort(collect_list(struct(col("is_geom"), col("column_name"),
              col("frag")))),
            x => x.getField("frag"))), lit(")")).as("ddl"))
      .join(geom.select(col("ds"), col("srid"), col("geom_type")), Seq("ds"), "left")
      .select(col("ds"), col("n_cols"),
        coalesce(col("srid"), lit(-1L)).as("srid"),
        coalesce(col("geom_type"), lit("")).as("geom_type"), col("ddl"))
      .orderBy("ds")
  }

  def agoOutstats(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      expr(s"event_id div $AgoPageSize").as("page"),
      col("event_type"), col("value"))
    val partials = e.groupBy(col("page"), col("event_type"))
      .agg(count(lit(1)).as("pn"),
        sum(((col("value").cast("decimal(18,2)")) * 100).cast("long")).as("psum"),
        min(col("value")).as("pmin"), max(col("value")).as("pmax"))
    partials.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_rows"),
        sum(col("psum")).as("sum_cents"),
        min(col("pmin")).as("min_v"), max(col("pmax")).as("max_v"),
        count(lit(1)).as("n_pages"))
      .orderBy("event_type")
  }

  /** AGO index-manifest derivation (ago/ago.py:932-1041
    * `post_index_fields`) — the one sliver of data logic inside the
    * otherwise pure REST-POST indexing path. Per dataset, the
    * comma-separated `index_fields` directive expands to one index
    * definition per entry: a composite entry (`field1+field2`) has its
    * pluses turned into commas for the JSON `fields` value and into
    * underscores for the index name (always suffixed `_idx`); the
    * unique flag is looked up by EXACT raw-entry match against the
    * dbtools-extract JSON schema's field list — so composites (which
    * contain `+`) and fields whose schema entry carries no `unique` key
    * default to non-unique, and a dataset whose schema file is missing
    * entirely (the reference's S3-404 branch, ago.py:951-956) gets
    * non-unique for every index. The emitted `index_json` is the
    * `addToDefinition` payload body; the reference stamps a run date
    * into `description` — runtime metadata, not data logic — so the
    * stamp is omitted here, and the string `'true'/'false'` flags are
    * normalized to JSON booleans.
    *
    * Shape: split + posexplode of a per-dataset directive string, one
    * broadcast-sized left join against the schema catalog — linear in
    * the number of declared indexes, no driver loop (the reference
    * posts them one HTTP call at a time).
    *
    * Fixture: 25 datasets from nation; every dataset indexes objectid,
    * even keys add name, %3==0 adds the composite name+acct, %4==1 adds
    * acct; the schema catalog is absent for %5==0 (S3-404), marks
    * objectid unique except %5==2, never carries a unique key for name,
    * and explicitly sets acct non-unique — every lookup branch fires.
    */
  def agoIndexManifest(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).select(col("n_nationkey").cast("long").as("k"),
      lower(regexp_replace(col("n_name"), " ", "_")).as("ds"))
    // concat_ws skips the null branches, mirroring an absent directive
    val directives = n.select(col("ds"), col("k"),
      concat_ws(",", lit("objectid"),
        when(col("k") % 2 === 0, lit("name")),
        when(col("k") % 3 === 0, lit("name+acct")),
        when(col("k") % 4 === 1, lit("acct"))).as("index_fields"))
    val entries = directives.select(col("ds"), col("k"),
      posexplode(split(col("index_fields"), ",")).as(Seq("pos", "field_raw")))
    val schemaCat = n.filter(col("k") % 5 =!= 0)
      .select(col("ds").as("sds"), explode(array(
        struct(lit("objectid").as("fname"),
          (col("k") % 5 =!= 2).cast("boolean").as("funiq")),
        // 'name' has no unique key in its field dict → null, not false
        struct(lit("name").as("fname"), lit(null).cast("boolean").as("funiq")),
        struct(lit("acct").as("fname"), lit(false).as("funiq")))).as("f"))
      .select(col("sds"), col("f.fname"), col("f.funiq"))
    val uniq = coalesce(col("funiq"), lit(false))
    entries.join(schemaCat,
        entries("ds") === schemaCat("sds") &&
          col("field_raw") === col("fname"), "left")
      .select(col("ds"), col("pos"), col("field_raw"),
        concat(translate(col("field_raw"), "+", "_"), lit("_idx")).as("idx_name"),
        translate(col("field_raw"), "+", ",").as("idx_fields"),
        uniq.cast("int").as("is_unique"),
        concat(lit("""{"indexes": [{"name": """"),
          translate(col("field_raw"), "+", "_"), lit("""_idx", "fields": """"),
          translate(col("field_raw"), "+", ","),
          lit("""", "isUnique": """), when(uniq, "true").otherwise("false"),
          lit(""", "isAscending": true, "description": "installed by dbtools"}]}"""))
          .as("index_json"))
      .orderBy("ds", "pos")
  }

  /** Carto privacy resolution + select-grant generation
    * (carto/carto_.py:458-491 `enforce_privacy`, :418-427
    * `generate_select_grants`) — the last data-logic sliver of the Carto
    * loader. Per dataset, the comma-separated `select_users` directive
    * resolves to the privacy the loader force-sets: the reference tests
    * `'publicuser' in self.select_users` on the RAW string — substring
    * containment, not token membership — so a user named
    * `notapublicuserish` also yields PUBLIC; that quirk is reproduced
    * faithfully (one fixture row exercises it) rather than "fixed".
    * Absent/empty directive → PRIVATE, grants SQL `''` (the reference's
    * else-branch). The grant script is the per-user GRANT SELECT
    * concatenation in directive order.
    *
    * Shape: pure per-row column math (split + transform + concat) — one
    * codegen'd projection over the dataset catalog, no shuffle at all.
    *
    * Fixture: 25 datasets from nation; k%4==0 absent, ==1 publicuser
    * alone, ==2 publicuser second in the list, ==3 no publicuser (except
    * k%8==7: the substring-containment quirk row) — every reference
    * branch fires.
    */
  def cartoPrivacy(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).select(col("n_nationkey").cast("long").as("k"),
      lower(regexp_replace(col("n_name"), " ", "_")).as("ds"))
    val users = when(col("k") % 4 === 1, lit("publicuser"))
      .when(col("k") % 4 === 2, lit("tileuser,publicuser"))
      .when(col("k") % 4 === 3,
        when(col("k") % 8 === 7, lit("notapublicuserish,tileuser"))
          .otherwise(lit("someuser,tileuser")))
    n.select(col("ds"), users.as("su"))
      .select(col("ds"),
        coalesce(col("su"), lit("")).as("select_users"),
        when(col("su").isNotNull && col("su").contains("publicuser"),
          lit("PUBLIC")).otherwise(lit("PRIVATE")).as("privacy"),
        when(col("su").isNotNull, size(split(col("su"), ",")))
          .otherwise(lit(0)).cast("int").as("n_users"),
        when(col("su").isNotNull,
          concat_ws("", transform(split(col("su"), ","),
            u => concat(lit("GRANT SELECT ON \""), col("ds"),
              lit("\" TO \""), u, lit("\";")))))
          .otherwise(lit("")).as("grants_sql"))
      .orderBy("ds")
  }

  /** Single-pass dataset profile — the pre-load report a loader prints
    * before committing a staging table (rows, nulls, distincts, typed
    * min/max per column; the generalization of the reference's row-count
    * and null checks). ONE scan computes every stat (one aggregate node,
    * map-side partial), then a driver-free `stack` unpivots the 1-row
    * result into the per-column report. Floats are 2-dp-floored before
    * formatting so both engines render identical strings; every 13th
    * status is planted NULL to prove the null counters.
    */
  def profile(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val status = when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
      .otherwise(col("o_orderstatus"))
    // spread: the single-row-group source otherwise runs the whole
    // Expand(x5)+partial-aggregate on ONE core of 32 (profiled 1.5 s of a
    // 1.7 s query on one task, optimization round r13; Tables.spread
    // no-ops on multi-split production inputs)
    val src = spread(o.select(col("o_orderkey").as("k"), status.as("status"),
      col("o_totalprice").as("price"), col("o_orderdate").as("dt")))
    def r2fmt(c: org.apache.spark.sql.Column) =
      format_string("%.2f", floor(c * 100.0 + 0.5) / 100.0)
    val agg = src.agg(
      count(lit(1)).as("n_rows"),
      sum(col("k").isNull.cast("long")).as("k_nulls"),
      countDistinct(col("k")).as("k_dist"),
      min(col("k")).cast("string").as("k_min"),
      max(col("k")).cast("string").as("k_max"),
      sum(col("status").isNull.cast("long")).as("s_nulls"),
      countDistinct(col("status")).as("s_dist"),
      min(col("status")).as("s_min"), max(col("status")).as("s_max"),
      sum(col("price").isNull.cast("long")).as("p_nulls"),
      countDistinct(col("price")).as("p_dist"),
      r2fmt(min(col("price"))).as("p_min"), r2fmt(max(col("price"))).as("p_max"),
      sum(col("dt").isNull.cast("long")).as("d_nulls"),
      countDistinct(col("dt")).as("d_dist"),
      date_format(min(col("dt")), "yyyy-MM-dd").as("d_min"),
      date_format(max(col("dt")), "yyyy-MM-dd").as("d_max"))
    agg.selectExpr("n_rows", """stack(4,
        'o_orderkey',    k_nulls, k_dist, k_min, k_max,
        'o_orderstatus', s_nulls, s_dist, s_min, s_max,
        'o_totalprice',  p_nulls, p_dist, p_min, p_max,
        'o_orderdate',   d_nulls, d_dist, d_min, d_max
      ) AS (col_name, n_nulls, n_distinct, min_val, max_val)""")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy("col_name")
  }

  /** CDC apply: merge an ordered change feed (I/U/D with sequence numbers)
    * into a base table — the log-shipping generalization of etl_upsert
    * (which replaces whole rows) and etl_scd2_history (which keeps every
    * version): per key only the HIGHEST-sequence change wins, a 'D'
    * tombstone deletes, 'I' inserts a new key. Planted feed: every 4th
    * key updated (+10), every 20th updated twice (seq 2 wins, +20), every
    * 5th-not-4th deleted, every 9th key re-inserted far above the key
    * space. Shape: one window over the (small) change feed keyed+ordered,
    * then ONE full-outer hash join on the key — base never shuffles twice.
    */
  def cdcApply(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = orders(s, d)
    val k = col("o_orderkey")
    val base = o.select(k.as("key"), col("o_totalprice").as("price"))
    val u1 = o.filter(k % 4 === 0).select(k.as("key"), lit(1L).as("seq"),
      lit("U").as("op"), (col("o_totalprice") + 10.0).as("new_price"))
    val u2 = o.filter(k % 20 === 0).select(k.as("key"), lit(2L).as("seq"),
      lit("U").as("op"), (col("o_totalprice") + 20.0).as("new_price"))
    val del = o.filter(k % 5 === 0 && k % 4 =!= 0).select(k.as("key"),
      lit(1L).as("seq"), lit("D").as("op"), lit(null).cast("double").as("new_price"))
    val ins = o.filter(k % 9 === 0).select((k + 10000000L).as("key"),
      lit(1L).as("seq"), lit("I").as("op"), lit(1.0).as("new_price"))
    val changes = u1.unionByName(u2).unionByName(del).unionByName(ins)
    val w = Window.partitionBy(col("key")).orderBy(col("seq").desc, col("op"))
    val last = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("key", "op", "new_price")
    base.join(last, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("key"),
        coalesce(col("new_price"), col("price")).as("price"),
        when(col("op").isNull, "kept").when(col("op") === "U", "updated")
          .otherwise("inserted").as("status"))
      .orderBy("key")
  }

  /** Order-independent table fingerprints — the "did the load produce
    * byte-identical data" verification the reference approximates with row
    * counts (postgres.py:719-760 verify_count; carto_.py row-count gate).
    * A checksum catches what a count cannot: silently corrupted values,
    * duplicated-then-dropped rows, column transposition.
    *
    * Per table: rows serialize to a canonical string (doubles as exact
    * cents, timestamps as epoch seconds — never engine-formatted floats or
    * timestamp strings), hash to the shared 60-bit md5, then combine with
    * BOTH an XOR (order-independent, but blind to duplicate pairs) and an
    * exact decimal sum (order-independent AND duplicate-sensitive; emitted
    * as digits since DECIMAL output is hash-fragile). Scale shape: the
    * hash is map-side; the aggregation is partially combined, so the one
    * shuffle carries 32 partial rows per table regardless of input size.
    */
  def checksum(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HashFunctions.md5Long
    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100.0 + 0.5).cast("long")
    val rows =
      customer(s, d).select(lit("customer").as("table_name"), md5Long(concat_ws("|",
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        cents(col("c_acctbal")), col("c_mktsegment"))).as("h"))
      .unionAll(orders(s, d).select(lit("orders").as("table_name"), md5Long(concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        // NTZ → (UTC-session) timestamp → epoch seconds; matches the
        // oracle's epoch() on the same naive value
        cents(col("o_totalprice")), col("o_orderdate").cast("timestamp").cast("long"),
        col("o_orderpriority"))).as("h")))
      .unionAll(lineitem(s, d).select(lit("lineitem").as("table_name"), md5Long(concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        cents(col("l_quantity")), cents(col("l_extendedprice")),
        cents(col("l_discount")), cents(col("l_tax")),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("timestamp").cast("long"))).as("h")))
    rows.groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_sig"),
        sum(col("h").cast("decimal(38,0)")).cast("string").as("sum_sig"))
      .orderBy("table_name")
  }

  /** Column-level pseudonymization for sharing derived tables: identifying
    * names become salted-hash surrogate tokens (same input → same token, so
    * joins across anonymized extracts still line up — the property ad-hoc
    * random ids destroy), and the quasi-identifier balance generalizes to
    * its 100-unit bucket (k-anonymity-style coarsening). Pure map-side
    * column math; the text-level complement is text_pii_scrub.
    */
  def anonymize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HashFunctions.md5Long
    customer(s, d).select(col("c_custkey"),
        concat(lit("cust_"),
          md5Long(concat(lit("anon:"), col("c_name")))).as("name_token"),
        (floor(col("c_acctbal") / 100.0) * 100.0).as("acctbal_bucket"),
        col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Target bytes per output file for [[partitionPlan]] — production sets
    * ~128 MB (HDFS-block-aligned parquet); the fixture target is small so
    * every status group plans multiple files at test scale.
    */
  val TargetFileBytes = 32768L

  /** Write-layout planning — the sizing pass run before a big partitioned
    * write: estimate each partition key's on-disk bytes from the exact
    * serialized row width (never row COUNTS alone — wide-row skew is what
    * kills file sizing), derive the file count at the target file size,
    * and report each key's share of the total so the caller can pick
    * `repartition(n_files, key)` / detect skewed keys before the shuffle.
    * One partially-aggregated pass; the 1-row total broadcasts back.
    */
  def partitionPlan(s: SparkSession, d: String): DataFrame = {
    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100.0 + 0.5).cast("long")
    val o = orders(s, d).select(col("o_orderstatus"),
      length(concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")),
        col("o_orderdate").cast("timestamp").cast("long"),
        col("o_orderpriority"))).cast("long").as("row_bytes"))
    val per = o.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).as("est_bytes"))
    val tot = per.agg(sum(col("est_bytes")).as("total_bytes"))
    per.crossJoin(broadcast(tot))
      .select(col("o_orderstatus"), col("n_rows"), col("est_bytes"),
        expr(s"(est_bytes + $TargetFileBytes - 1) div $TargetFileBytes").as("n_files"),
        graft.core.Determinism.r4(
          col("est_bytes").cast("double") / col("total_bytes").cast("double"))
          .as("share"))
      .orderBy("o_orderstatus")
  }

  /** Schema inference over string-typed staged columns — what the reference
    * delegates to a hand-maintained JSON schema (postgres.py:449-559), run
    * the other way: scan the strings, count which type each value parses
    * as, and infer the STRICTEST type every row satisfies (one dirty value
    * demotes the column to text — silent coercion is how bad loads hide).
    * The staged fixture covers all verdicts: a key column (→ bigint), a
    * clean decimal (→ double), the same decimal with planted 'N/A's
    * (→ text, the fallback path), an ISO date (→ date) and free text.
    * One aggregate node over regexp flags + a stack unpivot — the
    * etl_profile shape.
    */
  def typeInfer(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
    // exact-cents decimal rendering (never engine double-formatting):
    // cents < 2^53 so the /100 double divide is exact before truncation
    val priceStr = concat((cents / 100).cast("long").cast("string"),
      lit("."), lpad((cents % 100L).cast("string"), 2, "0"))
    val staged = o.select(
      col("o_orderkey").cast("string").as("c_key"),
      priceStr.as("c_price"),
      when(col("o_orderkey") % 13 === 0, lit("N/A")).otherwise(priceStr).as("c_price_dirty"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("c_date"),
      col("o_orderpriority").as("c_text"))
    val intRe = "^-?[0-9]+$"
    val numRe = "^-?[0-9]+(\\.[0-9]+)?$"
    val dateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
    def stats(c: String) = Seq(
      count(lit(1)).as(s"${c}_n"),
      sum(when(col(c).rlike(intRe), 1L).otherwise(0L)).as(s"${c}_int"),
      sum(when(col(c).rlike(numRe), 1L).otherwise(0L)).as(s"${c}_num"),
      sum(when(col(c).rlike(dateRe), 1L).otherwise(0L)).as(s"${c}_date"))
    val cols = Seq("c_key", "c_price", "c_price_dirty", "c_date", "c_text")
    val aggs = cols.flatMap(stats)
    val wide = staged.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}_n, ${c}_int, ${c}_num, ${c}_date").mkString(", ")
    wide.select(expr(
        s"stack(${cols.length}, $stacked) AS (column_name, n_rows, n_int, n_num, n_date)"))
      .select(col("column_name"), col("n_rows"), col("n_int"), col("n_num"), col("n_date"),
        when(col("n_int") === col("n_rows"), "bigint")
          .when(col("n_num") === col("n_rows"), "double")
          .when(col("n_date") === col("n_rows"), "date")
          .otherwise("text").as("inferred_type"))
      .orderBy("column_name")
  }

  /** Referential-integrity gate — the FK-orphan complement of the
    * row-count/null checks (a load that drops parents silently strands
    * children). Each check is ONE anti-join aggregated to a verdict row;
    * orphans are planted (every 97th lineitem key shifted out of range) so
    * both the firing and the clean path are exercised.
    */
  def fkCheck(s: SparkSession, d: String): DataFrame = {
    val liKeys = lineitem(s, d).select(
      when(col("l_orderkey") % 97 === 0, col("l_orderkey") + 1000000000000L)
        .otherwise(col("l_orderkey")).as("k"))
    val oKeys = orders(s, d).select(col("o_orderkey").as("k"))
    val custRef = orders(s, d).select(col("o_custkey").cast("long").as("k"))
    val custKeys = customer(s, d).select(col("c_custkey").cast("long").as("k"))
    def check(name: String, child: DataFrame, parent: DataFrame): DataFrame = {
      val orphans = child.join(parent, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"),
          coalesce(min(col("k")), lit(-1L)).as("min_orphan"))
      child.agg(count(lit(1)).as("n_child_rows"))
        .crossJoin(orphans)
        .select(lit(name).as("fk_check"), col("n_child_rows"),
          col("n_orphans"), col("min_orphan"))
    }
    check("lineitem.orderkey->orders", liKeys, oKeys)
      .unionAll(check("orders.custkey->customer", custRef, custKeys))
      .orderBy("fk_check")
  }

  /** Snapshot diff (EtlOps.snapshotDiff) between the orders table and a
    * planted next-day load: every 31st row removed, every 41st key added
    * out-of-range, every 7th price changed — all four verdicts exercised.
    * The report aggregates the per-row statuses plus each status's first
    * key so the firing rows are addressable.
    */
  def snapshotDiffQ(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey").as("k"),
      col("o_totalprice").as("price"), col("o_orderpriority").as("prio"))
    val neu = o.filter(col("k") % 31 =!= 0)
      .select(col("k"),
        when(col("k") % 7 === 0, col("price") + 5.0).otherwise(col("price")).as("price"),
        col("prio"))
      .unionAll(o.filter(col("k") % 41 === 0)
        .select((col("k") + 2000000000000L).as("k"), col("price"), col("prio")))
    EtlOps.snapshotDiff(o, neu, Seq("k"))
      .groupBy(col("diff_status"))
      .agg(count(lit(1)).as("n_rows"), min(col("k")).as("first_key"))
      .orderBy("diff_status")
  }

  /** Primary-key uniqueness gate — the verification the upsert/delete
    * operators assume and nothing yet checked: planted duplicates (every
    * 53rd order re-appended) must surface as dup keys with their
    * multiplicity, and a clean key column must pass. One count-per-key
    * aggregate per check, partially combined; only (key) pairs shuffle.
    */
  def pkCheck(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey").as("k"))
    val dirty = o.unionAll(o.filter(col("k") % 53 === 0))
    val clean = customer(s, d).select(col("c_custkey").as("k"))
    def check(name: String, keys: DataFrame): DataFrame =
      keys.groupBy(col("k")).agg(count(lit(1)).as("m"))
        .agg(sum(col("m")).as("n_rows"),
          count(lit(1)).as("n_distinct_keys"),
          sum(when(col("m") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
          max(col("m")).as("max_multiplicity"))
        .select(lit(name).as("pk_check"), col("n_rows"),
          col("n_distinct_keys"), col("n_dup_keys"), col("max_multiplicity"))
    check("orders_staged.o_orderkey", dirty)
      .unionAll(check("customer.c_custkey", clean))
      .orderBy("pk_check")
  }

  /** Dead-column report — the drop-candidate complement of etl_profile:
    * classify every column as all_null, constant (one non-null value), or
    * ok. Legacy wide tables carry dozens of dead columns; finding them
    * BEFORE a 100 TB migration is how the target schema gets thinner.
    * Planted: a constant literal and an all-null column ride along with
    * two live ones. Same single-aggregate + stack shape as etl_profile.
    */
  def deadColumn(s: SparkSession, d: String): DataFrame = {
    // spread: same single-task partial-aggregate profile as etl_profile
    val staged = spread(orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      lit("databridge").as("c_source_system"),
      lit(null).cast("string").as("c_legacy_notes")))
    val cols = Seq("o_orderkey", "o_orderstatus", "c_source_system", "c_legacy_notes")
    def stats(c: String) = Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"))
    val aggs = cols.flatMap(stats)
    val stacked = cols.map(c => s"'$c', ${c}_nn, ${c}_nd").mkString(", ")
    orders(s, d).agg(count(lit(1)).as("n")).crossJoin(
        staged.agg(aggs.head, aggs.tail: _*))
      .select(col("n"), expr(
        s"stack(${cols.length}, $stacked) AS (column_name, n_nonnull, n_distinct)"))
      .select(col("column_name"), col("n_nonnull"), col("n_distinct"),
        when(col("n_nonnull") === 0, "all_null")
          .when(col("n_distinct") === 1 && col("n_nonnull") === col("n"), "constant")
          .otherwise("ok").as("verdict"))
      .orderBy("column_name")
  }

  /** Load-volume anomaly detection: day-over-day event counts with the
    * relative change, flagged when the swing exceeds ±50% — the monitoring
    * query that catches a silently-halved ingest or a doubled replay
    * before it poisons downstream tables. The window runs over PER-DAY
    * AGGREGATES (rows ∝ days, not events), so the lag is free at any
    * volume; change is exact integer-derived arithmetic, r4-emitted.
    */
  def volumeAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDay = events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_rows"))
    val w = Window.orderBy(col("day"))
    perDay.withColumn("prev_rows", lag(col("n_rows"), 1).over(w))
      .select(col("day"), col("n_rows"),
        coalesce(col("prev_rows"), lit(-1L)).as("prev_rows"),
        graft.core.Determinism.r4(
          when(col("prev_rows").isNull, 0.0)
            .otherwise((col("n_rows") - col("prev_rows")).cast("double")
              / col("prev_rows"))).as("rel_change"),
        when(col("prev_rows").isNotNull
            && abs((col("n_rows") - col("prev_rows")).cast("double")
              / col("prev_rows")) > 0.5, 1).otherwise(0).as("anomaly"))
      .orderBy("day")
  }

  /** Backfill planning: diff the full calendar spine of a time-partitioned
    * table against the day-partitions actually present and emit the
    * missing days — the gap report that drives incremental backfills. The
    * spine generates IN-ROW from the min/max bounds (one 1-row aggregate,
    * sequence() + explode — never a driver-side date loop) and anti-joins
    * the present-day set. Planted: two known days are dropped from the
    * "loaded" table, so the plan must name exactly those.
    */
  def backfillPlan(s: SparkSession, d: String): DataFrame = {
    val day = date_format(col("ts"), "yyyy-MM-dd")
    val loaded = events(s, d)
      .filter(!day.isin("2024-01-05", "2024-01-17"))
      .select(to_date(day).as("day"))
    val present = loaded.distinct()
    val bounds = events(s, d)
      .agg(to_date(min(date_format(col("ts"), "yyyy-MM-dd"))).as("d0"),
        to_date(max(date_format(col("ts"), "yyyy-MM-dd"))).as("d1"))
    val spine = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(present, Seq("day"), "left_anti")
      .select(date_format(col("day"), "yyyy-MM-dd").as("missing_day"))
      .orderBy("missing_day")
  }

  /** Declarative data-quality rule engine (the Deequ/Great-Expectations
    * shape): N rules — null / domain / regex-format / numeric-range /
    * date-range — evaluated over orders in ONE scan: each rule compiles to
    * a conditional sum inside a single partial aggregate, and the per-rule
    * rows are unpivoted from that one result row with stack(). Adding a
    * rule adds a column to the agg, never a pass over the data — the
    * property that keeps a 50-rule suite a single 100 TB scan. Violation
    * mix is real: priority format (the '4-NOT SPECIFIED' space) and the
    * price/date ranges genuinely fire; the null/domain gates pass.
    */
  def ruleEngine(s: SparkSession, d: String): DataFrame = {
    def viol(c: org.apache.spark.sql.Column) = sum(c.cast("long"))
    val agg = orders(s, d).agg(
      count(lit(1)).as("n"),
      viol(col("o_orderkey").isNull).as("v_key_null"),
      viol(col("o_custkey").isNull).as("v_cust_null"),
      viol(!col("o_orderstatus").isin("O", "F", "P")).as("v_status_domain"),
      viol(!col("o_orderpriority").rlike("^[1-5]-[A-Z]+$")).as("v_prio_format"),
      viol(col("o_totalprice") <= 0 || col("o_totalprice") > 450000)
        .as("v_price_range"),
      viol(col("o_orderdate") < lit("1995-01-01").cast("timestamp")
        || col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .as("v_date_range"))
    agg.select(expr(
        """stack(6,
           'orderkey_not_null',  v_key_null,      n,
           'custkey_not_null',   v_cust_null,     n,
           'status_in_domain',   v_status_domain, n,
           'priority_format',    v_prio_format,   n,
           'price_in_range',     v_price_range,   n,
           'date_in_range',      v_date_range,    n)
           AS (rule, n_violations, n_checked)"""))
      .select(col("rule"), col("n_violations"), col("n_checked"),
        expr("(n_checked - n_violations) * 1000000 div n_checked")
          .as("pass_ppm"))
      .orderBy("rule")
  }

  /** PSI drift-bucket count (price domain 0..450k+ in 50k steps, capped). */
  val PsiBuckets = 10

  /** Population Stability Index between a reference and a current period
    * (orders before/after 1998-01-01) over fixed-width price buckets — the
    * standard model-monitoring drift score. Counts come from ONE scan
    * (conditional sums per side), the bucket spine is generated (all
    * [[PsiBuckets]] buckets present even when empty — absent buckets are
    * exactly where drift hides), add-one smoothing keeps empty buckets
    * finite, and each (p−q)·log2(p/q) term follows the entropy float
    * policy: 6-dp-floor-rounded, summed as exact DECIMAL, total rounded to
    * 4 dp. Output: one row per bucket plus a TOTAL row (bucket −1).
    */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val bucketed = orders(s, d).select(
      least(floor(col("o_totalprice") / 50000.0).cast("long"),
        lit(PsiBuckets - 1L)).as("bucket"),
      (col("o_orderdate") < cut).cast("long").as("is_ref"))
    val counts = bucketed.groupBy(col("bucket"))
      .agg(sum(col("is_ref")).as("cr"), sum(lit(1) - col("is_ref")).as("ct"))
    val spine = s.range(PsiBuckets).toDF("bucket")
    val full = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = full.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val r6 = graft.core.Determinism.r6 _
    val terms = full.crossJoin(broadcast(totals))
      .select(col("bucket"), col("cr"), col("ct"),
        r6((((col("cr") + 1).cast("double") / (col("nr") + PsiBuckets)) -
            ((col("ct") + 1).cast("double") / (col("nt") + PsiBuckets))) *
          log2(((col("cr") + 1).cast("double") * (col("nt") + PsiBuckets)) /
            (((col("ct") + 1).cast("double") * (col("nr") + PsiBuckets)))))
          .as("term_bits"))
    val total = terms.agg(
        max(lit(-1L)).as("bucket"),
        sum(col("cr")).as("cr"), sum(col("ct")).as("ct"),
        graft.core.Determinism.r4(
          sum(col("term_bits").cast("decimal(28,6)")).cast("double"))
          .as("term_bits"))
    terms.unionByName(total)
      .select(col("bucket"), col("cr").as("n_ref"), col("ct").as("n_cur"),
        col("term_bits"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_rule_engine"     -> (ruleEngine _),
    "etl_psi_drift"       -> (psiDrift _),
    "etl_backfill_plan"   -> (backfillPlan _),
    "etl_volume_anomaly"  -> (volumeAnomaly _),
    "etl_dead_column"     -> (deadColumn _),
    "etl_pk_check"        -> (pkCheck _),
    "etl_snapshot_diff"   -> (snapshotDiffQ _),
    "etl_type_infer"      -> (typeInfer _),
    "etl_fk_check"        -> (fkCheck _),
    "etl_partition_plan"  -> (partitionPlan _),
    "etl_anonymize"       -> (anonymize _),
    "etl_checksum"        -> (checksum _),
    "etl_cdc_apply"       -> (cdcApply _),
    "etl_profile"         -> (profile _),
    "ago_batch_split"     -> (agoBatchSplit _),
    "ago_upsert_route"    -> (agoUpsertRoute _),
    "ago_outstats"        -> (agoOutstats _),
    "ago_index_manifest"  -> (agoIndexManifest _),
    "carto_privacy"       -> (cartoPrivacy _),
    "etl_sde_ddl"         -> (sdeDdl _),
    "etl_header_sanitize" -> (headerSanitize _),
    "etl_column_map"      -> (columnMap _),
    "etl_schema_cast"     -> (schemaCast _),
    "etl_null_clean"      -> (nullClean _),
    "etl_tz_localize"     -> (tzLocalize _),
    "etl_date_localize"   -> (dateLocalize _),
    "etl_scd2_history"    -> (scd2History _),
    "ago_format_row"      -> (agoFormatRow _),
    "etl_quarantine"      -> (quarantineQ _),
    "etl_incremental_watermark" -> (incrementalWatermark _),
    "etl_upsert"          -> (upsert _),
    "etl_delete_stale"    -> (deleteStale _),
    "etl_row_count_check" -> (rowCountCheck _),
    "etl_null_check"      -> (nullCheck _),
    "etl_schema_diff"     -> (schemaDiff _),
    "etl_enrich_lookup"   -> (enrichLookup _),
    "etl_geocode_miss"    -> (geocodeMiss _)
  )

  val oracles: Map[String, String] = Map(
    "etl_rule_engine" ->
      """WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS v_key_null,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS v_cust_null,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
             AS BIGINT) AS v_status_domain,
           CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z]+$')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_prio_format,
           CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 450000
             THEN 1 ELSE 0 END) AS BIGINT) AS v_price_range,
           CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
             OR o_orderdate >= TIMESTAMP '2001-01-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS v_date_range
           FROM orders),
         rules AS (
           SELECT 'orderkey_not_null' AS rule, v_key_null AS n_violations, n AS n_checked FROM agg
           UNION ALL SELECT 'custkey_not_null', v_cust_null, n FROM agg
           UNION ALL SELECT 'status_in_domain', v_status_domain, n FROM agg
           UNION ALL SELECT 'priority_format', v_prio_format, n FROM agg
           UNION ALL SELECT 'price_in_range', v_price_range, n FROM agg
           UNION ALL SELECT 'date_in_range', v_date_range, n FROM agg)
         SELECT rule, n_violations, n_checked,
           (n_checked - n_violations) * 1000000 // n_checked AS pass_ppm
         FROM rules ORDER BY rule""",
    "etl_psi_drift" -> {
      val r6 = graft.core.Determinism.r6Sql _
      val r4 = graft.core.Determinism.r4Sql _
      s"""WITH bucketed AS (SELECT
             least(CAST(floor(o_totalprice / 50000.0) AS BIGINT),
               ${PsiBuckets - 1}) AS bucket,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
               THEN 1 ELSE 0 END AS is_ref
           FROM orders),
         counts AS (SELECT bucket, CAST(sum(is_ref) AS BIGINT) AS cr,
             CAST(sum(1 - is_ref) AS BIGINT) AS ct
           FROM bucketed GROUP BY bucket),
         spine AS (SELECT CAST(b AS BIGINT) AS bucket
           FROM range(0, $PsiBuckets) t(b)),
         filled AS (SELECT s.bucket, COALESCE(c.cr, 0) AS cr,
             COALESCE(c.ct, 0) AS ct
           FROM spine s LEFT JOIN counts c ON c.bucket = s.bucket),
         tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
             CAST(sum(ct) AS BIGINT) AS nt FROM filled),
         terms AS (SELECT bucket, cr, ct,
             ${r6(s"""((CAST(cr + 1 AS DOUBLE) / (nr + $PsiBuckets)) -
                 (CAST(ct + 1 AS DOUBLE) / (nt + $PsiBuckets))) *
               log2((CAST(cr + 1 AS DOUBLE) * (nt + $PsiBuckets)) /
                 (CAST(ct + 1 AS DOUBLE) * (nr + $PsiBuckets)))""")} AS term_bits
           FROM filled, tot)
         SELECT bucket, cr AS n_ref, ct AS n_cur, term_bits FROM terms
         UNION ALL
         SELECT CAST(-1 AS BIGINT), (SELECT nr FROM tot), (SELECT nt FROM tot),
           ${r4("CAST(sum(CAST(term_bits AS DECIMAL(28,6))) AS DOUBLE)")}
         FROM terms
         ORDER BY bucket"""
    },
    "etl_backfill_plan" ->
      """WITH days AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
           FROM events),
         present AS (SELECT DISTINCT day FROM days
           WHERE day NOT IN ('2024-01-05', '2024-01-17')),
         bounds AS (SELECT CAST(min(day) AS DATE) AS d0,
             CAST(max(day) AS DATE) AS d1 FROM days),
         spine AS (SELECT CAST(unnest(generate_series(d0, d1,
             INTERVAL 1 DAY)) AS DATE) AS day FROM bounds)
         SELECT strftime(s.day, '%Y-%m-%d') AS missing_day
         FROM spine s
         WHERE strftime(s.day, '%Y-%m-%d') NOT IN (SELECT day FROM present)
         ORDER BY missing_day""",
    "etl_volume_anomaly" ->
      s"""WITH per_day AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_rows FROM events GROUP BY day),
         lagged AS (SELECT day, n_rows,
             lag(n_rows) OVER (ORDER BY day) AS prev FROM per_day)
         SELECT day, n_rows,
           COALESCE(prev, -1) AS prev_rows,
           ${graft.core.Determinism.r4Sql(
             "CASE WHEN prev IS NULL THEN 0.0 " +
             "ELSE CAST(n_rows - prev AS DOUBLE) / prev END")} AS rel_change,
           CAST(prev IS NOT NULL
             AND abs(CAST(n_rows - prev AS DOUBLE) / prev) > 0.5
             AS INTEGER) AS anomaly
         FROM lagged ORDER BY day""",
    "etl_dead_column" ->
      """WITH staged AS (SELECT o_orderkey, o_orderstatus,
             'databridge' AS c_source_system,
             CAST(NULL AS VARCHAR) AS c_legacy_notes
           FROM orders),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
         st AS (
           SELECT 'o_orderkey' AS column_name,
             CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM staged
           UNION ALL SELECT 'o_orderstatus', CAST(count(o_orderstatus) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM staged
           UNION ALL SELECT 'c_source_system', CAST(count(c_source_system) AS BIGINT),
             CAST(count(DISTINCT c_source_system) AS BIGINT) FROM staged
           UNION ALL SELECT 'c_legacy_notes', CAST(count(c_legacy_notes) AS BIGINT),
             CAST(count(DISTINCT c_legacy_notes) AS BIGINT) FROM staged)
         SELECT column_name, n_nonnull, n_distinct,
           CASE WHEN n_nonnull = 0 THEN 'all_null'
                WHEN n_distinct = 1 AND n_nonnull = n THEN 'constant'
                ELSE 'ok' END AS verdict
         FROM st, n ORDER BY column_name""",
    "etl_pk_check" ->
      """WITH dirty AS (SELECT o_orderkey AS k FROM orders
           UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 53 = 0),
         d AS (SELECT k, count(*) AS m FROM dirty GROUP BY k),
         c AS (SELECT c_custkey AS k, count(*) AS m FROM customer GROUP BY k)
         SELECT 'customer.c_custkey' AS pk_check,
           CAST(sum(m) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct_keys,
           CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
           CAST(max(m) AS BIGINT) AS max_multiplicity
         FROM c
         UNION ALL
         SELECT 'orders_staged.o_orderkey',
           CAST(sum(m) AS BIGINT), CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(max(m) AS BIGINT)
         FROM d
         ORDER BY pk_check""",
    "etl_snapshot_diff" ->
      """WITH old AS (SELECT o_orderkey AS k, o_totalprice AS price,
             o_orderpriority AS prio FROM orders),
         neu AS (
           SELECT k, CASE WHEN k % 7 = 0 THEN price + 5.0 ELSE price END AS price,
             prio
           FROM old WHERE k % 31 <> 0
           UNION ALL
           SELECT k + 2000000000000, price, prio FROM old WHERE k % 41 = 0),
         j AS (SELECT COALESCE(o.k, n.k) AS k,
             o.k IS NOT NULL AS in_old, n.k IS NOT NULL AS in_new,
             (o.price IS DISTINCT FROM n.price)
               OR (o.prio IS DISTINCT FROM n.prio) AS changed
           FROM old o FULL OUTER JOIN neu n ON n.k = o.k),
         st AS (SELECT k,
             CASE WHEN NOT in_old THEN 'added'
                  WHEN NOT in_new THEN 'removed'
                  WHEN changed THEN 'changed'
                  ELSE 'unchanged' END AS diff_status
           FROM j)
         SELECT diff_status, CAST(count(*) AS BIGINT) AS n_rows,
           min(k) AS first_key
         FROM st GROUP BY diff_status ORDER BY diff_status""",
    "etl_type_infer" -> {
      val price =
        """(CAST(floor(floor(o_totalprice * 100.0 + 0.5) / 100) AS BIGINT)
           || '.' || lpad(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 100
                          AS VARCHAR), 2, '0'))"""
      val intRe = "^-?[0-9]+$"
      val numRe = "^-?[0-9]+(\\.[0-9]+)?$"
      val dateRe = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
      def stats(c: String) =
        s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN regexp_matches($c, '$intRe') THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
           CAST(sum(CASE WHEN regexp_matches($c, '$numRe') THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
           CAST(sum(CASE WHEN regexp_matches($c, '$dateRe') THEN 1 ELSE 0 END) AS BIGINT) AS n_date
           FROM staged"""
      val cols = Seq("c_key", "c_price", "c_price_dirty", "c_date", "c_text")
      s"""WITH staged AS (SELECT
           CAST(o_orderkey AS VARCHAR) AS c_key,
           $price AS c_price,
           CASE WHEN o_orderkey % 13 = 0 THEN 'N/A' ELSE $price END AS c_price_dirty,
           strftime(o_orderdate, '%Y-%m-%d') AS c_date,
           o_orderpriority AS c_text
         FROM orders),
         st AS (${cols.map(stats).mkString(" UNION ALL ")})
         SELECT column_name, n_rows, n_int, n_num, n_date,
           CASE WHEN n_int = n_rows THEN 'bigint'
                WHEN n_num = n_rows THEN 'double'
                WHEN n_date = n_rows THEN 'date'
                ELSE 'text' END AS inferred_type
         FROM st ORDER BY column_name"""
    },
    "etl_fk_check" ->
      """WITH li_child AS (SELECT CASE WHEN l_orderkey % 97 = 0
             THEN l_orderkey + 1000000000000 ELSE l_orderkey END AS k
           FROM lineitem),
         li_orphans AS (SELECT CAST(count(*) AS BIGINT) AS n_orphans,
             COALESCE(min(k), -1) AS min_orphan
           FROM li_child WHERE k NOT IN (SELECT o_orderkey FROM orders)),
         cust_orphans AS (SELECT CAST(count(*) AS BIGINT) AS n_orphans,
             COALESCE(min(CAST(o_custkey AS BIGINT)), -1) AS min_orphan
           FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
         SELECT 'lineitem.orderkey->orders' AS fk_check,
           (SELECT CAST(count(*) AS BIGINT) FROM li_child) AS n_child_rows,
           n_orphans, min_orphan FROM li_orphans
         UNION ALL
         SELECT 'orders.custkey->customer',
           (SELECT CAST(count(*) AS BIGINT) FROM orders),
           n_orphans, min_orphan FROM cust_orphans
         ORDER BY fk_check""",
    "etl_partition_plan" ->
      s"""WITH rows_b AS (SELECT o_orderstatus,
             CAST(strlen(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
               CAST(floor(epoch(o_orderdate)) AS BIGINT),
               o_orderpriority)) AS BIGINT) AS row_bytes
           FROM orders),
         per AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(row_bytes) AS BIGINT) AS est_bytes
           FROM rows_b GROUP BY o_orderstatus),
         tot AS (SELECT CAST(sum(est_bytes) AS BIGINT) AS total_bytes FROM per)
         SELECT o_orderstatus, n_rows, est_bytes,
           (est_bytes + $TargetFileBytes - 1) // $TargetFileBytes AS n_files,
           ${graft.core.Determinism.r4Sql(
             "CAST(est_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE)")} AS share
         FROM per, tot ORDER BY o_orderstatus""",
    "etl_anonymize" ->
      s"""SELECT c_custkey,
         'cust_' || ${graft.functions.HashFunctions.md5LongSql("'anon:' || c_name")}
           AS name_token,
         floor(c_acctbal / 100.0) * 100.0 AS acctbal_bucket,
         c_mktsegment
         FROM customer ORDER BY c_custkey""",
    "etl_checksum" -> {
      import graft.functions.HashFunctions.md5LongSql
      def cents(e: String) = s"CAST(floor(($e) * 100.0 + 0.5) AS BIGINT)"
      val cust = md5LongSql("concat_ws('|', c_custkey, c_name, c_nationkey, " +
        s"${cents("c_acctbal")}, c_mktsegment)")
      val ord = md5LongSql("concat_ws('|', o_orderkey, o_custkey, o_orderstatus, " +
        s"${cents("o_totalprice")}, CAST(floor(epoch(o_orderdate)) AS BIGINT), o_orderpriority)")
      val li = md5LongSql("concat_ws('|', l_orderkey, l_partkey, l_suppkey, l_linenumber, " +
        s"${cents("l_quantity")}, ${cents("l_extendedprice")}, ${cents("l_discount")}, " +
        s"${cents("l_tax")}, l_returnflag, l_linestatus, " +
        "CAST(floor(epoch(l_shipdate)) AS BIGINT))")
      s"""WITH rows_h AS (
           SELECT 'customer' AS table_name, $cust AS h FROM customer
           UNION ALL
           SELECT 'orders', $ord FROM orders
           UNION ALL
           SELECT 'lineitem', $li FROM lineitem)
         SELECT table_name, CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(h) AS xor_sig,
           CAST(sum(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS sum_sig
         FROM rows_h GROUP BY table_name ORDER BY table_name"""
    },
    "etl_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey AS key, o_totalprice AS price FROM orders),
         changes AS (
           SELECT o_orderkey AS key, CAST(1 AS BIGINT) AS seq, 'U' AS op,
             o_totalprice + 10.0 AS new_price FROM orders WHERE o_orderkey % 4 = 0
           UNION ALL
           SELECT o_orderkey, 2, 'U', o_totalprice + 20.0 FROM orders
           WHERE o_orderkey % 20 = 0
           UNION ALL
           SELECT o_orderkey, 1, 'D', NULL FROM orders
           WHERE o_orderkey % 5 = 0 AND o_orderkey % 4 <> 0
           UNION ALL
           SELECT o_orderkey + 10000000, 1, 'I', 1.0 FROM orders
           WHERE o_orderkey % 9 = 0),
         last AS (SELECT key, op, new_price FROM (
             SELECT key, op, new_price,
               row_number() OVER (PARTITION BY key ORDER BY seq DESC, op) AS rn
             FROM changes) WHERE rn = 1)
         SELECT COALESCE(b.key, l.key) AS key,
           COALESCE(l.new_price, b.price) AS price,
           CASE WHEN l.op IS NULL THEN 'kept'
                WHEN l.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS status
         FROM base b FULL OUTER JOIN last l ON l.key = b.key
         WHERE l.op IS NULL OR l.op <> 'D'
         ORDER BY key""",
    "etl_profile" ->
      """WITH src AS (SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderstatus END AS status,
           o_totalprice AS price, o_orderdate AS dt FROM orders),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
           CAST(count(DISTINCT k) AS BIGINT) AS k_dist,
           CAST(min(k) AS VARCHAR) AS k_min, CAST(max(k) AS VARCHAR) AS k_max,
           CAST(sum(CASE WHEN status IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
           CAST(count(DISTINCT status) AS BIGINT) AS s_dist,
           min(status) AS s_min, max(status) AS s_max,
           CAST(sum(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
           CAST(count(DISTINCT price) AS BIGINT) AS p_dist,
           printf('%.2f', floor(min(price) * 100.0 + 0.5) / 100.0) AS p_min,
           printf('%.2f', floor(max(price) * 100.0 + 0.5) / 100.0) AS p_max,
           CAST(sum(CASE WHEN dt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
           CAST(count(DISTINCT dt) AS BIGINT) AS d_dist,
           strftime(min(dt), '%Y-%m-%d') AS d_min,
           strftime(max(dt), '%Y-%m-%d') AS d_max
         FROM src)
         SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val FROM (
           SELECT 'o_orderkey' AS col_name, n_rows, k_nulls AS n_nulls,
             k_dist AS n_distinct, k_min AS min_val, k_max AS max_val FROM a
           UNION ALL SELECT 'o_orderstatus', n_rows, s_nulls, s_dist, s_min, s_max FROM a
           UNION ALL SELECT 'o_totalprice', n_rows, p_nulls, p_dist, p_min, p_max FROM a
           UNION ALL SELECT 'o_orderdate', n_rows, d_nulls, d_dist, d_min, d_max FROM a)
         ORDER BY col_name""",
    "ago_batch_split" ->
      s"""WITH ranked AS (SELECT event_id, CAST(event_id % 4 AS INTEGER) AS shard,
             row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) AS rn
           FROM events),
         b AS (SELECT shard, (rn - 1) // $AgoBatchSize AS batch_id, event_id
           FROM ranked)
         SELECT shard, batch_id, CAST(count(*) AS BIGINT) AS n_rows,
           min(event_id) AS first_id, max(event_id) AS last_id,
           CAST(count(*) < $AgoBatchSize AS INTEGER) AS is_partial
         FROM b GROUP BY shard, batch_id ORDER BY shard, batch_id""",
    "ago_upsert_route" ->
      """WITH live AS (
           SELECT c_custkey AS pk, c_custkey * 2 + 1 AS objectid
           FROM customer WHERE c_custkey % 10 <> 3
           UNION ALL
           SELECT c_custkey AS pk, c_custkey * 2 + 2 AS objectid
           FROM customer WHERE c_custkey % 10 <> 3 AND c_custkey % 97 = 0),
         ranked AS (SELECT pk, objectid,
             row_number() OVER (PARTITION BY pk ORDER BY objectid) AS rk
           FROM live),
         first_live AS (SELECT pk, objectid AS live_oid FROM ranked WHERE rk = 1),
         dups AS (SELECT pk, objectid AS del_oid FROM ranked WHERE rk = 2),
         staged AS (SELECT c_custkey AS pk, c_name AS payload FROM customer)
         SELECT s.pk,
           CASE WHEN f.live_oid IS NULL THEN 'add' ELSE 'update' END AS action,
           COALESCE(f.live_oid, -1) AS ago_objectid, s.payload
         FROM staged s LEFT JOIN first_live f ON s.pk = f.pk
         UNION ALL
         SELECT pk, 'delete' AS action, del_oid AS ago_objectid,
           CAST(NULL AS VARCHAR) AS payload
         FROM dups
         ORDER BY pk, action""",
    "ago_outstats" ->
      s"""WITH paged AS (SELECT event_id // $AgoPageSize AS page, event_type, value
           FROM events),
         partials AS (SELECT page, event_type,
             CAST(count(*) AS BIGINT) AS pn,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS psum,
             min(value) AS pmin, max(value) AS pmax
           FROM paged GROUP BY page, event_type)
         SELECT event_type, CAST(sum(pn) AS BIGINT) AS n_rows,
           CAST(sum(psum) AS BIGINT) AS sum_cents,
           min(pmin) AS min_v, max(pmax) AS max_v,
           CAST(count(*) AS BIGINT) AS n_pages
         FROM partials GROUP BY event_type ORDER BY event_type""",
    "ago_index_manifest" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
             lower(replace(n_name, ' ', '_')) AS ds FROM nation),
         directives AS (SELECT ds, k,
             concat_ws(',', 'objectid',
               CASE WHEN k % 2 = 0 THEN 'name' END,
               CASE WHEN k % 3 = 0 THEN 'name+acct' END,
               CASE WHEN k % 4 = 1 THEN 'acct' END) AS index_fields
           FROM n),
         entries AS (SELECT ds, k,
             CAST(generate_subscripts(fs, 1) - 1 AS INTEGER) AS pos,
             unnest(fs) AS field_raw
           FROM (SELECT ds, k, string_split(index_fields, ',') AS fs
                 FROM directives)),
         schemacat AS (
           SELECT ds AS sds, 'objectid' AS fname, (k % 5 <> 2) AS funiq
             FROM n WHERE k % 5 <> 0
           UNION ALL SELECT ds, 'name', NULL FROM n WHERE k % 5 <> 0
           UNION ALL SELECT ds, 'acct', false FROM n WHERE k % 5 <> 0)
         SELECT e.ds, e.pos, e.field_raw,
           replace(e.field_raw, '+', '_') || '_idx' AS idx_name,
           replace(e.field_raw, '+', ',') AS idx_fields,
           CAST(coalesce(s.funiq, false) AS INTEGER) AS is_unique,
           '{"indexes": [{"name": "' || replace(e.field_raw, '+', '_')
             || '_idx", "fields": "' || replace(e.field_raw, '+', ',')
             || '", "isUnique": '
             || CASE WHEN coalesce(s.funiq, false) THEN 'true' ELSE 'false' END
             || ', "isAscending": true, "description": "installed by dbtools"}]}'
             AS index_json
         FROM entries e LEFT JOIN schemacat s
           ON s.sds = e.ds AND s.fname = e.field_raw
         ORDER BY e.ds, e.pos""",
    "carto_privacy" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
             lower(replace(n_name, ' ', '_')) AS ds FROM nation),
         dirs AS (SELECT ds,
             CASE WHEN k % 4 = 1 THEN 'publicuser'
                  WHEN k % 4 = 2 THEN 'tileuser,publicuser'
                  WHEN k % 4 = 3 THEN
                    CASE WHEN k % 8 = 7 THEN 'notapublicuserish,tileuser'
                         ELSE 'someuser,tileuser' END
             END AS su
           FROM n)
         SELECT ds, coalesce(su, '') AS select_users,
           CASE WHEN su IS NOT NULL AND contains(su, 'publicuser')
             THEN 'PUBLIC' ELSE 'PRIVATE' END AS privacy,
           CAST(CASE WHEN su IS NOT NULL
             THEN len(string_split(su, ',')) ELSE 0 END AS INTEGER) AS n_users,
           CASE WHEN su IS NOT NULL
             THEN list_aggregate(list_transform(string_split(su, ','),
               u -> 'GRANT SELECT ON "' || ds || '" TO "' || u || '";'),
               'string_agg', '')
             ELSE '' END AS grants_sql
         FROM dirs ORDER BY ds""",
    "etl_sde_ddl" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
             lower(replace(n_name, ' ', '_')) AS ds FROM nation),
         cols0 AS (SELECT ds, k, column_name, data_type FROM n
           CROSS JOIN (VALUES ('objectid','integer'),('name','character varying'),
             ('acct','double precision'),('gdb_geomattr_data','bytea'),
             ('shape','USER-DEFINED')) AS c(column_name, data_type)
           WHERE NOT (column_name = 'shape' AND k % 3 = 2)),
         geomcat AS (SELECT ds, k, 'shape' AS geom_field,
             CAST(CASE WHEN k % 2 = 0 THEN 2272 ELSE 4326 END AS BIGINT) AS srid,
             (['ST_POINT','ST_MULTIPOLYGON','ST_LINESTRING','ST_POLYGON'])[k % 4 + 1]
               AS st_type
           FROM n WHERE k % 3 <> 2),
         xmlcat AS (SELECT ds, '<HasM>' ||
             CASE WHEN k % 5 = 1 THEN 'true' ELSE 'false' END ||
             '</HasM><HasZ>' ||
             CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END || '</HasZ>'
             AS definition
           FROM geomcat WHERE k % 5 <> 0),
         mz AS (SELECT ds,
             contains(regexp_extract(definition, '<HasM>[^<]*</HasM>', 0), 'true') AS m,
             contains(regexp_extract(definition, '<HasZ>[^<]*</HasZ>', 0), 'true') AS z
           FROM xmlcat),
         geom AS (SELECT g.ds, g.geom_field, g.srid,
             upper(substr(replace(g.st_type, 'ST_', ''), 1, 1)) ||
             lower(substr(replace(g.st_type, 'ST_', ''), 2)) ||
             CASE WHEN coalesce(m.m, false) THEN 'M' ELSE '' END ||
             CASE WHEN coalesce(m.z, false) THEN 'Z' ELSE '' END AS geom_type
           FROM geomcat g LEFT JOIN mz m ON m.ds = g.ds),
         generic AS (SELECT c.ds, 0 AS is_geom, c.column_name,
             c.column_name || ' ' || CASE WHEN c.data_type = 'character varying'
               THEN 'text' ELSE c.data_type END AS frag
           FROM cols0 c LEFT JOIN geom g ON g.ds = c.ds
           WHERE c.column_name <> 'gdb_geomattr_data'
             AND (g.geom_field IS NULL OR c.column_name <> g.geom_field)),
         gfrag AS (SELECT ds, 1 AS is_geom, geom_field AS column_name,
             geom_field || ' geometry(' || geom_type || ', ' || srid || ')' AS frag
           FROM geom),
         allc AS (SELECT * FROM generic UNION ALL SELECT * FROM gfrag),
         agg AS (SELECT ds, CAST(count(*) AS BIGINT) AS n_cols,
             'CREATE TABLE staging.' || ds || ' (' ||
             string_agg(frag, ', ' ORDER BY is_geom, column_name) || ')' AS ddl
           FROM allc GROUP BY ds)
         SELECT a.ds, a.n_cols, COALESCE(g.srid, -1) AS srid,
           COALESCE(g.geom_type, '') AS geom_type, a.ddl
         FROM agg a LEFT JOIN geom g ON g.ds = a.ds
         ORDER BY a.ds""",
    "etl_header_sanitize" ->
      """SELECT n_nationkey AS objectid, n_name, n_regionkey AS region_key
         FROM nation ORDER BY objectid""",
    "etl_column_map" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus AS status,
         o_totalprice AS total_price
         FROM orders ORDER BY o_orderkey""",
    "etl_schema_cast" ->
      """SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey, o_custkey,
         o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS o_totalprice,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
         FROM orders ORDER BY o_orderkey""",
    "etl_null_clean" ->
      """SELECT doc_id,
         regexp_replace(
           regexp_replace(substr(text,1,20) || chr(1) || 'POINT (1.#QNAN000 NULL)',
                          '[\x01]', '', 'g'),
           '(1\.#QNAN000|NULL)', 'NaN', 'g') AS payload,
         length(regexp_replace(
           regexp_replace(substr(text,1,20) || chr(1) || 'POINT (1.#QNAN000 NULL)',
                          '[\x01]', '', 'g'),
           '(1\.#QNAN000|NULL)', 'NaN', 'g')) AS n_chars
         FROM documents ORDER BY doc_id""",
    "etl_incremental_watermark" ->
      """WITH wm AS (SELECT CAST(floor((CAST(floor(epoch(min(ts))) AS BIGINT)
             + CAST(floor(epoch(max(ts))) AS BIGINT)) / 2.0) AS BIGINT) AS wm_sec
           FROM events)
         SELECT event_type, count(*) AS n_new,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS new_watermark
         FROM events, wm
         WHERE CAST(floor(epoch(ts)) AS BIGINT) > wm_sec
         GROUP BY 1 ORDER BY 1""",
    "etl_quarantine" ->
      """WITH dirty AS (SELECT event_id,
           CASE WHEN event_id % 97 = 0 THEN -value ELSE value END AS value,
           CASE WHEN event_id % 89 = 0 THEN NULL ELSE props END AS props
         FROM events),
         checked AS (SELECT *,
           coalesce(array_to_string(list_filter([
             CASE WHEN props IS NOT NULL THEN NULL ELSE 'null_props' END,
             CASE WHEN value > 0 THEN NULL ELSE 'nonpositive_value' END],
             x -> x IS NOT NULL), ','), '') AS reasons
         FROM dirty)
         SELECT CASE WHEN reasons = '' THEN 'pass' ELSE 'quarantine' END AS qc_status,
           reasons, count(*) AS n
         FROM checked GROUP BY 1, 2 ORDER BY 1, 2""",
    "ago_format_row" ->
      """SELECT event_id,
         regexp_replace(event_type || '<tag>''café''"x"',
                        '[^\x00-\x7F]|[''"<>]', '', 'g') AS cleaned,
         CAST(epoch_ms(ts AT TIME ZONE 'America/New_York') AS BIGINT) AS date_ms
         FROM events ORDER BY event_id""",
    "etl_tz_localize" ->
      """SELECT event_id,
         strftime(CAST((ts AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS TIMESTAMP),
                  '%Y-%m-%d %H:%M:%S') AS utc_ts
         FROM events ORDER BY event_id""",
    "etl_scd2_history" ->
      """SELECT user_id, version, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
         coalesce(strftime(next_ts, '%Y-%m-%d %H:%M:%S'),
                  '9999-12-31 00:00:00') AS valid_to,
         CAST(next_ts IS NULL AS INTEGER) AS is_current
         FROM (SELECT user_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
               FROM events)
         ORDER BY user_id, version""",
    "etl_date_localize" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN ''
              ELSE strftime(CAST((CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 00:00:00' AS TIMESTAMP)
                     AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS TIMESTAMP),
                   '%Y-%m-%d %H:%M:%S')
         END AS carto_ts
         FROM orders ORDER BY o_orderkey""",
    "etl_upsert" ->
      """WITH prod AS (
           SELECT o_orderkey, o_totalprice, 'prod' AS src FROM orders WHERE o_orderkey % 3 <> 0),
         staging AS (
           SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'staging' AS src
           FROM orders WHERE o_orderkey % 2 = 0)
         SELECT * FROM prod WHERE o_orderkey NOT IN (SELECT o_orderkey FROM staging)
         UNION ALL SELECT * FROM staging
         ORDER BY o_orderkey""",
    "etl_delete_stale" ->
      """WITH prod AS (
           SELECT o_orderkey, o_totalprice, 'prod' AS src FROM orders WHERE o_orderkey % 3 <> 0),
         staging AS (
           SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
         SELECT p.* FROM prod p WHERE EXISTS
           (SELECT 1 FROM staging s WHERE s.o_orderkey = p.o_orderkey)
         ORDER BY o_orderkey""",
    "etl_row_count_check" ->
      """SELECT 'customer' AS table_name, count(*) AS n_rows FROM customer
         UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         UNION ALL SELECT 'nation', count(*) FROM nation
         UNION ALL SELECT 'orders', count(*) FROM orders
         ORDER BY table_name""",
    "etl_null_check" ->
      """WITH planted AS (SELECT
           CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS name,
           CASE WHEN c_custkey % 13 = 0 THEN '' ELSE c_mktsegment END AS segment,
           CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS acctbal
         FROM customer)
         SELECT 'acctbal' AS column_name,
           CAST(sum(CASE WHEN acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(0 AS BIGINT) AS n_empty FROM planted
         UNION ALL SELECT 'name',
           CAST(sum(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN name = '' THEN 1 ELSE 0 END) AS BIGINT) FROM planted
         UNION ALL SELECT 'segment',
           CAST(sum(CASE WHEN segment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN segment = '' THEN 1 ELSE 0 END) AS BIGINT) FROM planted
         ORDER BY column_name""",
    "etl_schema_diff" ->
      """SELECT * FROM (VALUES
           ('load_ts', '-', 'timestamp', 'missing_in_prod'),
           ('o_custkey', 'bigint', 'bigint', 'match'),
           ('o_orderdate', 'timestamp', 'timestamp', 'match'),
           ('o_orderkey', 'bigint', 'bigint', 'match'),
           ('o_orderpriority', 'string', '-', 'missing_in_staging'),
           ('o_orderstatus', 'string', 'string', 'match'),
           ('o_totalprice', 'double', 'string', 'type_mismatch')
         ) AS t(column_name, prod_type, staging_type, status)
         ORDER BY column_name""",
    "etl_geocode_miss" ->
      """WITH addrs AS (SELECT c_custkey AS id, c_name AS name FROM customer),
         ais AS (SELECT c_custkey AS ais_id,
             CAST((c_custkey * 7919) % 1000000 + 2400000 AS VARCHAR) AS a_lon,
             CAST((c_custkey * 104729) % 300000 + 200000 AS VARCHAR) AS a_lat
           FROM customer WHERE c_custkey % 11 <> 0),
         joined AS (SELECT a.id, a.name,
             coalesce(s.a_lon, '') AS lon, coalesce(s.a_lat, '') AS lat,
             CASE WHEN s.ais_id IS NOT NULL
                  THEN 'SRID=2272;POINT (' || s.a_lon || ' ' || s.a_lat || ')'
                  ELSE '' END AS shape,
             CAST(s.ais_id IS NOT NULL AS INTEGER) AS matched
           FROM addrs a LEFT JOIN ais s ON s.ais_id = a.id),
         gate AS (SELECT CAST(sum(CASE WHEN matched = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_miss FROM joined)
         SELECT id, name, lon, lat, shape, matched, n_miss,
           CAST(n_miss > 5 AS INTEGER) AS fail_gate
         FROM joined, gate ORDER BY id""",
    "etl_enrich_lookup" ->
      """SELECT c_custkey, c_name, n_name AS nation_name, n_regionkey
         FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey"""
  )
}

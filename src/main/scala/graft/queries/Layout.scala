package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables._

/** Write-layout planning queries (SURVEY.md §2 "ETL operators"): the
  * data-layout half of running a 100 TB table — where etl_partition_plan
  * sizes HOW MANY files to write, these decide WHICH ROWS land together
  * and measure what that buys.
  *
  * - [[zorderLayout]]: multi-dimensional clustering by Morton code (the
  *   layout Delta/Iceberg expose as OPTIMIZE ... ZORDER BY), on the
  *   native codegen expression [[graft.plans.ZOrder]].
  * - [[zonemapPrune]]: a zone-map (per-file min/max, parquet row-group
  *   stats) pruning simulator that scores a 2-D predicate against the
  *   insertion-order layout and the z-order layout on the SAME rows —
  *   the measurement that justifies paying for a rewrite.
  * - [[compactBins]]: greedy size-sorted bin packing of small files into
  *   target-size compaction groups (the Iceberg/Delta "OPTIMIZE" small
  *   -file problem), expressed as one per-partition window.
  *
  * Scale design: every query is a scan plus ONE aggregation keyed by
  * file/partition — no self-joins, no global sorts. The z-order file
  * assignment uses fixed-width code ranges (`z div 256`) rather than a
  * global row sort precisely so the plan has no SinglePartition window;
  * a production writer would range-partition by z with the same math.
  */
object Layout {

  /** Grid cells per axis (6 bits — z codes span [0, 4095]). */
  private val Cells = 64L
  /** Z-codes per output file: 4096/256 → 16 files. */
  private val ZSpan = 256L

  private def cents(c: Column): Column =
    floor(c * 100.0 + 0.5).cast("long")

  /** Orders quantized onto the 64×64 (custkey × price-cents) grid with the
    * Morton code attached. Bounds come from a 1-row broadcast aggregate
    * (the q23 decorrelation shape), so cell math is map-side; the codegen
    * [[graft.plans.ZOrder]] keeps the whole projection inside
    * whole-stage codegen.
    */
  private def gridded(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(
      col("o_orderkey").cast("long").as("okey"),
      col("o_custkey").cast("long").as("ck"),
      cents(col("o_totalprice")).as("ce"))
    val bounds = o.agg(max("ck").as("mx"), max("ce").as("my"))
    o.crossJoin(broadcast(bounds))
      .withColumn("x", expr(s"ck * $Cells div (mx + 1)"))
      .withColumn("y", expr(s"ce * $Cells div (my + 1)"))
      .withColumn("z", graft.plans.ZOrder.zorder(col("x"), col("y")))
  }

  /** Z-order clustering audit: rows binned into 16 files by Morton-code
    * range; per file, the axis-aligned footprint (min/max of BOTH grid
    * dims) and distinct-cell count. The point of the layout is visible in
    * the output: every file's x-span AND y-span are small simultaneously,
    * which is what makes 2-D zone-map pruning work ([[zonemapPrune]]
    * quantifies it).
    */
  def zorderLayout(s: SparkSession, d: String): DataFrame =
    gridded(s, d)
      .withColumn("file_id", expr(s"z div $ZSpan"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        countDistinct("z").as("n_cells"))
      .orderBy("file_id")

  /** Zone-map pruning scored over two layouts of the same rows: per-file
    * min/max "footer stats" are built for (a) insertion order (orderkey
    * ranges) and (b) z-order ranges, then a fixed 2-D band predicate
    * (custkey in the second quarter × cents in the second quarter) is
    * tested against each file's stats. A file is scanned iff its min/max
    * intervals intersect the predicate on BOTH columns — exactly parquet
    * row-group skipping. Output: files scanned and rows read per layout
    * against the same true match count; insertion order scans ~every file
    * (each file spans the whole custkey domain), z-order scans the few
    * whose footprint intersects the band.
    *
    * One scan: each row is stacked into both layouts via explode, then a
    * single (layout, file) aggregation feeds a 2-row rollup.
    */
  def zonemapPrune(s: SparkSession, d: String): DataFrame = {
    val g = gridded(s, d)
      .withColumn("file_ins", expr("okey div 4096"))
      .withColumn("file_z", expr(s"z div $ZSpan"))
      .withColumn("m",
        (col("ck") >= expr("(mx + 1) div 4") && col("ck") <= expr("(mx + 1) div 2") &&
         col("ce") >= expr("(my + 1) div 4") && col("ce") <= expr("(my + 1) div 2"))
          .cast("long"))
    val stacked = g.select(
      explode(array(
        struct(lit("insertion").as("layout"), col("file_ins").as("file")),
        struct(lit("zorder").as("layout"), col("file_z").as("file")))).as("lf"),
      col("ck"), col("ce"), col("m"), col("mx"), col("my"))
      .select(col("lf.layout").as("layout"), col("lf.file").as("file"),
        col("ck"), col("ce"), col("m"), col("mx"), col("my"))
    val perFile = stacked.groupBy("layout", "file")
      .agg(count(lit(1)).as("n_rows"),
        min("ck").as("mn_ck"), max("ck").as("mx_ck"),
        min("ce").as("mn_ce"), max("ce").as("mx_ce"),
        sum("m").as("nm"), max("mx").as("mx"), max("my").as("my"))
    val hit = col("mx_ck") >= expr("(mx + 1) div 4") &&
      col("mn_ck") <= expr("(mx + 1) div 2") &&
      col("mx_ce") >= expr("(my + 1) div 4") &&
      col("mn_ce") <= expr("(my + 1) div 2")
    perFile.groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum(hit.cast("long")).as("n_hit"),
        sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_hit"),
        sum("nm").as("n_match"))
      .orderBy("layout")
  }

  /** Compaction target in modeled bytes. */
  private val BinTarget = 4096L

  /** Small-file compaction plan: files (modeled per order-month shard,
    * size from row count) are packed largest-first into running bins of
    * [[BinTarget]] bytes — cumulative-sum bin assignment, the
    * deterministic relational analog of first-fit-decreasing. ONE window
    * per partition-month (never global), so planning a million-file table
    * is a single shuffle by month; the undersized flag marks tail bins a
    * writer would merge across months.
    */
  def compactBins(s: SparkSession, d: String): DataFrame = {
    val files = orders(s, d).groupBy(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (col("o_orderkey") % 23).cast("long").as("file_no"))
      .agg((lit(200L) + count(lit(1)) * lit(97L)).as("bytes"))
    val w = Window.partitionBy("month")
      .orderBy(col("bytes").desc, col("file_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.withColumn("cum", sum("bytes").over(w))
      .withColumn("bin_id", expr(s"(cum - 1) div $BinTarget"))
      .groupBy("month", "bin_id")
      .agg(count(lit(1)).as("n_files"),
        sum("bytes").as("total_bytes"),
        (sum("bytes") < BinTarget / 2).cast("int").as("undersized"))
      .orderBy("month", "bin_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_zorder_layout" -> (zorderLayout _),
    "etl_zonemap_prune" -> (zonemapPrune _),
    "etl_compact_bins"  -> (compactBins _)
  )

  /** SQL twin of the Morton interleave over 6-bit cells (12 spread-bit
    * terms — DuckDB's integer `>>`/`&`/`<<` are exact on BIGINT).
    */
  private def zSql(x: String, y: String): String =
    (0 until 6).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")

  private val griddedSql: String =
    s"""o AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS ce FROM orders),
       b AS (SELECT max(ck) AS mx, max(ce) AS my FROM o),
       g AS (SELECT okey, ck, ce, mx, my,
           (ck * $Cells) // (mx + 1) AS x, (ce * $Cells) // (my + 1) AS y
         FROM o, b),
       gz AS (SELECT *, ${zSql("x", "y")} AS z FROM g)"""

  val oracles: Map[String, String] = Map(
    "etl_zorder_layout" ->
      s"""WITH $griddedSql
         SELECT z // $ZSpan AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y,
           CAST(count(DISTINCT z) AS BIGINT) AS n_cells
         FROM gz GROUP BY file_id ORDER BY file_id""",
    "etl_zonemap_prune" ->
      s"""WITH $griddedSql,
         r AS (SELECT 'insertion' AS layout, okey // 4096 AS f,
             ck, ce, mx, my FROM gz
           UNION ALL
           SELECT 'zorder' AS layout, z // $ZSpan AS f, ck, ce, mx, my FROM gz),
         pf AS (SELECT layout, f, count(*) AS n_rows,
             min(ck) AS mn_ck, max(ck) AS mx_ck,
             min(ce) AS mn_ce, max(ce) AS mx_ce,
             sum(CASE WHEN ck BETWEEN (mx + 1) // 4 AND (mx + 1) // 2
                       AND ce BETWEEN (my + 1) // 4 AND (my + 1) // 2
                 THEN 1 ELSE 0 END) AS nm,
             max(mx) AS mx, max(my) AS my
           FROM r GROUP BY layout, f),
         ph AS (SELECT layout, n_rows, nm,
             (mx_ck >= (mx + 1) // 4 AND mn_ck <= (mx + 1) // 2
              AND mx_ce >= (my + 1) // 4 AND mn_ce <= (my + 1) // 2) AS hit
           FROM pf)
         SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT) AS rows_hit,
           CAST(sum(nm) AS BIGINT) AS n_match
         FROM ph GROUP BY layout ORDER BY layout""",
    "etl_compact_bins" ->
      s"""WITH f AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(o_orderkey % 23 AS BIGINT) AS file_no,
             200 + CAST(count(*) AS BIGINT) * 97 AS bytes
           FROM orders GROUP BY month, file_no),
         w AS (SELECT month, bytes,
             sum(bytes) OVER (PARTITION BY month
               ORDER BY bytes DESC, file_no ROWS UNBOUNDED PRECEDING) AS cum
           FROM f)
         SELECT month, CAST((cum - 1) // $BinTarget AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes,
           CAST(sum(bytes) < ${BinTarget / 2} AS INTEGER) AS undersized
         FROM w GROUP BY month, bin_id ORDER BY month, bin_id"""
  )
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** API-paged record extraction semantics (SURVEY.md §1 item 7), re-expressed
  * for Spark. The reference walks paged REST responses row-by-row
  * (knack.py:108-161, airtable.py:81-111); here each *page* is one row
  * holding the raw JSON body (however it was fetched/landed), and
  * record-explosion + type coercion are declarative column work — so a
  * million-page dump parallelizes like any other table.
  */
object PagedRecords {

  /** Explode a JSON page body (`{"records": [...]}`-shaped) into one row
    * per record (raw record JSON string, with the page's ordinal position
    * and the record's index within the page preserved for stable ordering).
    */
  def explodeRecords(pages: DataFrame, pageCol: String,
                     recordsField: String = "records"): DataFrame = {
    val arr = from_json(get_json_object(col(pageCol), s"$$.$recordsField"),
      org.apache.spark.sql.types.DataType.fromDDL("array<string>"))
    // posexplode_OUTER: a malformed page (or one without the records field)
    // yields a row with null record_json instead of silently vanishing —
    // the reference raises on missing records (knack.py:118-120); callers
    // filter or alert on `record_json IS NULL`
    pages.select(col("*"),
      posexplode_outer(arr).as(Seq("record_idx", "record_json")))
  }

  /** knack `connection` values: `[{"id": "..."}, ...]` → JSON array of ids
    * (knack.py:130-131).
    */
  def coerceConnection(record: Column, field: String): Column =
    to_json(transform(
      from_json(get_json_object(record, s"$$.$field"),
        org.apache.spark.sql.types.DataType.fromDDL("array<struct<id:string>>")),
      _.getField("id")))

  /** knack `phone` values: `{"full": "..."}` → the full string
    * (knack.py:132-133).
    */
  def coercePhone(record: Column, field: String): Column =
    get_json_object(record, s"$$.$field.full")

  /** knack `date_time` values: `{"timestamp": "MM/DD/YYYY hh:mm AM"}` →
    * ISO-8601 + 'Z' (knack.py:134-135).
    */
  def coerceDateTime(record: Column, field: String): Column =
    concat(date_format(
      to_timestamp(get_json_object(record, s"$$.$field.timestamp"),
        "M/d/yyyy h:mm a"),
      "yyyy-MM-dd'T'HH:mm:ss"), lit("Z"))

  /** airtable semantics: any list value → its JSON encoding; scalars pass
    * through (airtable.py:96-105). get_json_object already does exactly
    * that — arrays/objects come back as raw JSON text, scalars unquoted.
    */
  def coerceValue(record: Column, field: String): Column =
    get_json_object(record, s"$$.$field")

  /** Sequential objectid in (page, in-page index) order (airtable.py:107-110
    * counts arrival order; distributed, that order must be explicit).
    * Scale-safe: the only global window runs over ONE ROW PER PAGE (the
    * per-page counts) — records themselves never funnel through a single
    * partition, unlike a naive global row_number.
    */
  def addSequentialObjectId(records: DataFrame, pageCol: String,
                            idxCol: String): DataFrame = {
    val counts = records.groupBy(col(pageCol)).agg(count(lit(1)).as("_n"))
    val offsets = counts.withColumn("_off",
        sum(col("_n")).over(Window.orderBy(col(pageCol))) - col("_n"))
      .drop("_n")
    records.join(broadcast(offsets), pageCol)
      .withColumn("objectid",
        (col("_off") + col(idxCol) + 1).cast("long"))
      .drop("_off")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `dedupe` — drop events whose selected fields were already seen.
  *
  * Reference: /root/reference/src/transforms/dedupe/ (match/ignore field
  * lists, default `timestamp,host,message`; LRU cache of `num_events`,
  * common.rs:32-35; TTL variant in timed_transform.rs).
  *
  * Batch semantics: exact dedupe keeping the FIRST event per key in
  * `orderCol` order — the deterministic analogue of "first seen wins".
  * The LRU bound is a single-process memory cap, not a semantic; at scale
  * the exact shuffle-dedupe is both correct and cheaper than emulating an
  * LRU. Streaming TTL variant lives in graft.streaming (watermark +
  * dropDuplicatesWithinWatermark).
  */
object Dedupe {

  /** Keep the first row per key (deterministic via orderCol tiebreak). */
  def apply(df: DataFrame, matchFields: Seq[String], orderCol: Column): DataFrame =
    byKeys(df, matchFields.map(resolve(df, _)), orderCol)

  /** Column-expression form; a match field absent from the schema is a
    * null key (the reference matches on the field's Value, and a missing
    * field is Null — events without it dedupe together).
    */
  def byKeys(df: DataFrame, keys: Seq[Column], orderCol: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Resolve a match path against the schema, walking nested structs
    * segment by segment; any absent segment (or a non-struct parent)
    * yields a null key, exactly like the reference's missing-field-is-
    * Null match values (dedupe/common.rs). Variant columns resolve via
    * the variant path and key on canonical JSON (grouping can't order
    * raw variants).
    */
  /** Package-public: the config loader's streaming branch keys on the
    * same resolution (missing segment -> null, variants -> JSON).
    */
  private[graft] def resolve(df: DataFrame, path: String): Column = {
    val segs = path.split("\\.").toList
    def walk(dt: DataType, c: Column, rest: List[String]): Column = rest match {
      case Nil => dt match {
        case VariantType | ArrayType(VariantType, _) => to_json(c)
        case _ => c
      }
      case s :: tail => dt match {
        case st: StructType => st.fields.find(_.name == s) match {
          case Some(f) => walk(f.dataType, c.getField(s), tail)
          case None => lit(null)
        }
        case VariantType =>
          // remaining segments all walk the variant; key on JSON text
          val p = "$" + rest.map(x => s"['$x']").mkString
          to_json(try_variant_get(c, p, "variant"))
        case _ => lit(null)
      }
    }
    df.schema.fields.find(_.name == segs.head) match {
      case Some(f) => walk(f.dataType, col(segs.head), segs.tail)
      case None => lit(null)
    }
  }

  /** Order-insensitive exact dedupe (any representative row). */
  def any(df: DataFrame, matchFields: Seq[String]): DataFrame =
    df.dropDuplicates(matchFields)

  /** `fields.ignore` mode: match on every column EXCEPT the ignored ones
    * (dedupe/common.rs: match and ignore lists are mutually exclusive).
    */
  def ignoring(df: DataFrame, ignoreFields: Seq[String],
               orderCol: Column): DataFrame =
    apply(df, df.columns.filterNot(ignoreFields.contains).toSeq, orderCol)
}

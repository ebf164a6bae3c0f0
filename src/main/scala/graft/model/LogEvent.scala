package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Schema-less log-event mode: the reference's dynamic `Value` tree
  * (SURVEY §1.1-1.2) carried as a Spark 4 VARIANT column.
  *
  * Reference: LogEvent wraps an arbitrary `Value::Object`
  * (lib/vector-core/src/event/log_event.rs:155-161) addressed by path
  * expressions `.a.b[0].c` (lib/vector-lookup). Typed pipelines should
  * prefer inferred StructType columns (columnar, codegen); Variant is
  * the faithful fallback when the shape is unknown per event.
  */
object LogEvent {

  /** Decode a JSON event body into a variant (null on malformed input —
    * VRL fallibility maps to null + errorWhen routing).
    */
  def fromJson(c: Column): Column = try_parse_json(c)

  /** Path access `.a.b[0].c` → variant_get. VRL paths use the same
    * dotted/indexed syntax as Spark's ("$.a.b[0].c").
    */
  def getPath(event: Column, path: String, targetType: String = "variant"): Column =
    try_variant_get(event, jsonPath(path), targetType)

  /** VRL `.a.b[0]` → JSON path `$.a.b[0]`. */
  def jsonPath(vrlPath: String): String =
    if (vrlPath.startsWith("$")) vrlPath
    else "$" + (if (vrlPath.startsWith(".")) vrlPath else "." + vrlPath)

  /** `type_of(value)` over a variant (VRL Type category). */
  def typeOfPath(event: Column, path: String): Column =
    schema_of_variant(getPath(event, path))

  /** Existence check (`exists(.path)`). */
  def pathExists(event: Column, path: String): Column =
    getPath(event, path).isNotNull

  /** Serialize back to JSON (`encode_json`). */
  def toJsonString(event: Column): Column = to_json(event)
}

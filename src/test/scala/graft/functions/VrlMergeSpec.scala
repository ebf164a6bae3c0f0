package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `|=` merge-assignment (assignment.cue) and whole-event assignment
  * from TAny struct-building functions — the constructs the reference's
  * own shipped configs use (config/vector.yaml `. =
  * parse_syslog!(...)`, config/examples/file_to_prometheus.yaml `. |=
  * parse_apache_log!(...)`, wrapped_json.yaml's del+merge chain).
  */
class VrlMergeSpec extends SparkSpec {
  import spark.implicits._

  test(". = parse_syslog!(...) explodes the parsed struct into the event") {
    val df = Seq((1L,
      "<34>1 2024-02-13T21:53:30.605Z h1 app 77 ID1 - hello world"))
      .toDF("id", "message")
    val out = VrlCompiler.run(df,
      """. = parse_syslog!(string!(.message))""").primary
    val r = out.head()
    assert(out.columns.contains("severity") && out.columns.contains("hostname"))
    assert(r.getAs[String]("hostname") == "h1")
    assert(r.getAs[String]("severity") == "crit")
    assert(r.getAs[String]("message") == "hello world")
  }

  test(". |= parse_apache_log!(...) merges parsed fields, keeps the rest") {
    val line = "127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] " +
      "\"GET /apache_pb.gif HTTP/1.0\" 200 2326"
    val df = Seq((7L, line)).toDF("id", "message")
    val out = VrlCompiler.run(df,
      """. |= object!(parse_apache_log!(string!(.message), "common"))""")
      .primary
    val r = out.head()
    assert(r.getAs[Long]("id") == 7L)              // untouched field kept
    assert(out.columns.contains("message"))        // overridden in place
    assert(r.getAs[String]("host") == "127.0.0.1") // new fields appended
    assert(r.getAs[String]("user") == "frank")
    assert(r.getAs[Number]("status").longValue == 200L)
  }

  test("wrapped-JSON traversal: del + |= chain over nested payloads") {
    val wrapped =
      """{"message": "{\"parent\": \"{\\\"child\\\": \\\"value2\\\"}\"}"}"""
    val inner = JsonLite.parse(wrapped)
      .asInstanceOf[java.util.Map[String, Any]].get("message").toString
    val df = Seq((1L, inner)).toDF("id", "message")
    val out = VrlCompiler.run(df,
      """message = del(.message)
        |. |= object!(parse_json!(string!(message)))
        |parent = del(.parent)
        |. |= object!(parse_json!(string!(parent)))
        |""".stripMargin).primary
    val r = out.head()
    // the event went dynamic: child surfaced, message/parent deleted
    val js = r.getAs[org.apache.spark.unsafe.types.VariantVal]("__root_map")
      .toString
    assert(js.contains("\"child\":\"value2\""), js)
    assert(!js.contains("\"parent\""), js)
    assert(!js.contains("\"message\""), js)
  }

  test("non-root |= merges two objects shallowly") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val out = VrlCompiler.run(df,
      """.a = {"k1": 1, "k2": 2}
        |.a |= {"k2": 20, "k3": 3}
        |.k2 = .a.k2
        |.k3 = .a.k3
        |.k1 = .a.k1""".stripMargin).primary
    val r = out.head()
    assert(r.getAs[Long]("k1") == 1L)
    assert(r.getAs[Long]("k2") == 20L)
    assert(r.getAs[Long]("k3") == 3L)
  }

  test("v = del(.f) returns the old value and removes the field") {
    val df = Seq((1L, "keepme")).toDF("id", "s")
    val out = VrlCompiler.run(df,
      """old = del(.s)
        |.copied = old""".stripMargin).primary
    assert(!out.columns.contains("s"))
    assert(out.head().getAs[String]("copied") == "keepme")
  }
}

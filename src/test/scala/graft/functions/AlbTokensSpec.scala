package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the hand-rolled ALB tokenizer against the ORIGINAL 29-group
  * regex (verbatim below) — same struct out, same null-row failures,
  * same null-vs-"" group semantics, over well-formed lines, every
  * optional-field arity, and a battery of malformed shapes.
  */
class AlbTokensSpec extends SparkSpec {
  import spark.implicits._

  private val q = "\"([^\"]*)\""
  private val pat = "^(\\S+) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) " +
    "(\\S+) (\\S+) (\\S+) (\\S+) " + q + " " + q + " (\\S+) (\\S+) " +
    "(\\S+) " + q + " " + q + " " + q + " (\\S+) (\\S+) " + q +
    "(?: " + q + ")?(?: " + q + ")?(?: " + q + ")?(?: " + q + ")?" +
    "(?: " + q + ")?(?: " + q + ")?.*$"

  private def base(nOpt: Int, tail: String = ""): String = {
    val req = Seq(
      "https", "2022-10-11T14:32:52.000000Z", "app/lb/1",
      "10.0.0.5:3182", "10.0.1.5:80", "0.001", "0.002", "0.000", "200",
      "200", "345", "690", "\"GET https://example.com:443/p/7 HTTP/2.0\"",
      "\"Mozilla/5.0 UA x\"", "ECDHE-RSA-AES128-GCM-SHA256", "TLSv1.2",
      "arn:tg/9", "\"Root=1-abc\"", "\"example.com\"", "\"arn:cert\"",
      "0", "2022-10-11T14:32:52.000000Z", "\"forward\"")
    val opt = Seq("\"-\"", "\"err\"", "\"80 81\"", "\"200 200\"",
      "\"Acceptable\"", "\"why not\"").take(nOpt)
    (req ++ opt).mkString(" ") + tail
  }

  test("scanner == regex: arities, empties, tails, malformed battery") {
    val lines = Seq(
      base(0), base(1), base(2), base(3), base(4), base(5), base(6),
      base(6, " trailing junk"), base(0, " trailing junk"),
      base(0, " \"unclosed"), base(2, " \"unclosed"),
      base(0, " "), base(0, " \""), base(0, "\n"), base(0, "\r\n"),
      base(0, "\r"), base(0, "\nmore"), base(0, "\rx"),
      base(3, "extra_no_space"),
      base(0).replace("\"GET", "GET"), // unquoted required field
      base(0).replace(" 200 200 ", " 200  200 "), // double space
      base(0).replace(" 0.001 ", " 0.0\t01 "), // tab inside bare field
      base(0).replace("\"Mozilla/5.0 UA x\"", "\"\""), // empty quoted
      "short line", "", " ", "a b c",
      base(6, ""), base(6, " x"),
      base(0).replace("TLSv1.2", "TLS\"v1.2"), // quote inside bare field
      base(2, " \"late \n newline\" tail") // newline inside optional quotes
    )
    val df = lines.toDF("s")
    val want = df.select(RegexStruct(col("s"), pat,
      AlbTokens.FieldNames).as("g")).collect().toSeq
    val got = df.select(graft.functions.AlbTokens(col("s")).as("g"))
      .collect().toSeq
    want.zip(got).zip(lines).foreach { case ((w, g), line) =>
      assert(w == g, s"scanner != regex for line: <$line>")
    }
  }

  test("scanner == regex under codegen through the full parse struct") {
    val line = base(4)
    val out = Seq(line).toDF("s")
      .select(Vrl.parseAwsAlbLogFrom(Vrl.albTokens(col("s"))).as("p"))
      .select("p.client_host", "p.request_method", "p.redirect_url",
        "p.error_reason", "p.target_port_list", "p.classification")
      .collect().head
    assert(out.getString(0) == "10.0.0.5:3182")
    assert(out.getString(1) == "GET")
    assert(out.isNullAt(2)) // "-" -> null via nil()
    assert(out.getString(3) == "err")
    assert(out.getString(4) == "80 81")
    assert(out.isNullAt(5)) // optional group absent at arity 4
  }
}

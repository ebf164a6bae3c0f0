package graft.functions

import graft.SparkSpec

/** set / remove / dns_lookup — the external-value path editors
  * (functions/set.cue, remove.cue, dns_lookup.cue).
  */
class VrlPathFnSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, """{"a": 1, "b": 2}"""),
    (2L, """{"a": 3}""")
  ).toDF("id", "props")

  test("set inserts/overwrites a map key; remove deletes it") {
    val out = VrlCompiler.run(events,
      """
        |m = parse_key_value!("x=1 y=2")
        |m = set!(m, ["z"], "3")
        |m = set!(m, ["x"], "9")
        |m = remove!(m, ["y"])
        |.zv = m.z
        |.xv = m.x
        |.has_y = exists(m.y)
        |""".stripMargin)
    val r = out.primary.orderBy("id").head()
    assert(r.getAs[String]("zv") == "3")
    assert(r.getAs[String]("xv") == "9")
    assert(!r.getAs[Boolean]("has_y"))
  }

  test("dns_lookup resolves from the literal table and NXDOMAINs otherwise") {
    val out = VrlCompiler.run(
      Seq((1L, "db.example.com"), (2L, "nope.example.com")).toDF("id", "host"),
      """
        |r = dns_lookup(.host, table: {"db.example.com": "10.0.0.5"})
        |.rcode = r.rcodeName
        |.first = r.answers[0]
        |""".stripMargin)
    val rows = out.primary.orderBy("id").collect()
    assert(rows(0).getAs[String]("rcode") == "NOERROR")
    assert(rows(0).getAs[String]("first") == "10.0.0.5")
    assert(rows(1).getAs[String]("rcode") == "NXDOMAIN")
    assert(rows(1).getAs[String]("first") == null)
  }
}

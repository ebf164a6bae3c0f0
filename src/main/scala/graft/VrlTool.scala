package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `vector vrl`-style CLI (reference src/vrl_cli / `vector vrl` REPL
  * entry, SURVEY §3.3): run a VRL program over JSON events and print the
  * transformed events as JSON — plus the vrl crate's `.vrl` test-file
  * format (lib/vector-vrl/tests/tests/example.vrl: `# object:` input,
  * `# result:` expected) so the reference's own VRL test files run
  * verbatim.
  *
  * Usage:
  *   graft.VrlTool program.vrl '{"a":1}' ['{"a":2}' ...]   # transform events
  *   graft.VrlTool --test tests/example.vrl                # run a .vrl test
  */
object VrlTool {

  /** Canonical JSON of an event row set, one line per event: columns
    * key-sorted, internal plumbing columns dropped, nulls omitted (the
    * reference renders absent fields as absent).
    */
  def eventsJson(df: DataFrame): Seq[String] = {
    val cols = df.columns.filterNot(_.startsWith("__")).sorted
    df.select(to_json(struct(cols.map(col): _*)).as("j"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Run VRL source over JSON event texts; returns the primary output
    * events as canonical JSON.
    */
  def transform(spark: SparkSession, source: String,
                events: Seq[String]): Seq[String] = {
    import spark.implicits._
    val df = spark.read.json(events.toDS)
    eventsJson(graft.functions.VrlCompiler.run(df, source).primary)
  }

  /** Key-sort a JSON document recursively (comparison canonicalization). */
  private def sortJson(v: Any): Any = v match {
    case m: java.util.LinkedHashMap[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.asInstanceOf[java.util.LinkedHashMap[String, Any]]
        .entrySet().stream().sorted(java.util.Map.Entry.comparingByKey())
        .forEach(e => out.put(e.getKey, sortJson(e.getValue)))
      out
    case l: java.util.ArrayList[_] =>
      val out = new java.util.ArrayList[Any]()
      l.forEach(x => out.add(sortJson(x)))
      out
    case other => other
  }

  private def canonical(json: String): String =
    graft.functions.JsonLite.render(
      sortJson(graft.functions.JsonLite.parse(json)))

  /** Run one `.vrl` test file (vrl crate format): `# object:` is the
    * input event, `# result:` the expected output; comment lines strip,
    * the remainder is the program. Returns (actual, expected).
    */
  def runTestFile(spark: SparkSession, text: String): (String, String) = {
    val lines = text.linesIterator.toSeq
    def header(tag: String): Option[String] =
      lines.collectFirst {
        case l if l.trim.startsWith(s"# $tag:") =>
          l.trim.stripPrefix(s"# $tag:").trim
      }
    val input = header("object").getOrElse("{}")
    val expected = header("result").getOrElse("{}")
    val program = lines.filterNot(_.trim.startsWith("#")).mkString("\n")
    val actual = transform(spark, program, Seq(input)).headOption.getOrElse("{}")
    (canonical(actual), canonical(expected))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.VrlTool <program.vrl> <json-event>... | --test <file.vrl>")
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    try {
      if (args(0) == "--test") {
        var failures = 0
        args.drop(1).foreach { path =>
          val text = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path)), "UTF-8")
          val (actual, expected) = runTestFile(spark, text)
          if (actual == expected) println(s"ok   $path")
          else {
            failures += 1
            println(s"FAIL $path\n     expected: $expected\n     actual:   $actual")
          }
        }
        if (failures > 0) sys.exit(1)
      } else {
        val source = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args(0))), "UTF-8")
        transform(spark, source, args.drop(1).toSeq).foreach(println)
      }
    } finally spark.stop()
  }
}

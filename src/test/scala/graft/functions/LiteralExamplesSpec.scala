package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Parses every literal example the reference's VRL docs ship
  * (website/cue/reference/remap/literals: string escapes +
  * line-continuations + raw s'…' strings, regex flags and named
  * groups, underscore digit separators, nested arrays/objects,
  * timestamp literals with offsets) through the VRL parser — syntax
  * coverage the expression corpus doesn't exercise.
  *
  * One documented exclusion: array.cue's fourth example
  * (`["first-level", ["second-level", ["third-level"]]`) is missing a
  * closing bracket in the shipped doc — three opens, two closes — so
  * rejecting it is correct behavior, asserted as such.
  */
class LiteralExamplesSpec extends AnyFunSuite {

  private val root = java.nio.file.Paths.get(
    "/root/reference/website/cue/reference/remap/literals")

  /** Pull the `examples: [ … ]` string list out of one cue file:
    * entries are plain "…" / """…""" strings or #"…"# / #"""…"""# raw
    * forms.
    */
  private def examplesOf(name: String): Seq[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      root.resolve(s"$name.cue")), "UTF-8")
    val start = text.indexOf("examples: [")
    if (start < 0) return Nil
    val body = text.substring(start, text.indexOf("\n\t]", start))
    val out = Seq.newBuilder[String]
    // raw triple, raw single, plain triple, plain single — in that
    // order so the longer delimiters win
    val re = ("(?s)#\"\"\"(.*?)\"\"\"#|#\"(.*?)\"#|" +
      "\"\"\"(.*?)\"\"\"|\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findAllMatchIn(body).foreach { m =>
      val raw = Seq(1, 2, 3, 4).map(m.group).find(_ != null).get
      out += raw.linesIterator.map(_.dropWhile(_ == '\t'))
        .mkString("\n").trim
    }
    out.result()
  }

  private val docBugExclusion = """["first-level", ["second-level", ["third-level"]]"""

  for (file <- Seq("array", "boolean", "float", "integer", "null",
      "object", "regular_expression", "string", "timestamp")) {
    test(s"$file.cue literal examples parse") {
      val exs = examplesOf(file)
      assert(exs.nonEmpty, s"no examples extracted from $file.cue")
      exs.foreach { src =>
        if (src == docBugExclusion)
          // unbalanced brackets in the shipped doc — MUST reject
          assertThrows[VrlParser.VrlParseException] {
            VrlParser.parse(s".x = $src")
          }
        else VrlParser.parse(s".x = $src") // throws on failure
      }
    }
  }
}

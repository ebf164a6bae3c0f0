package graft.functions

import org.apache.spark.sql.Column

/** `parse_grok` / `parse_groks` — grok-pattern compiler.
  *
  * Reference: the VRL parse_grok family (surface listed under
  * /root/reference/website/cue/reference/remap/functions.cue, Parse
  * category). A grok pattern interleaves literal text with
  * `%{PATTERN:name}` references; this compiles the pattern to ONE Java
  * regex and evaluates it as a single RegexStruct pass (capturing groups
  * only for named references).
  */
object Grok {

  /** The practically-used core of the standard grok pattern library
    * (public logstash-patterns surface).
    */
  val Patterns: Map[String, String] = Map(
    "WORD" -> "\\b\\w+\\b",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s*",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE10NUM" -> "[+-]?(?:\\d+(?:\\.\\d+)?)",
    "POSINT" -> "\\b[1-9]\\d*\\b",
    "IP" -> "\\d{1,3}(?:\\.\\d{1,3}){3}",
    "IPV4" -> "\\d{1,3}(?:\\.\\d{1,3}){3}",
    "IPORHOST" -> "\\S+",
    "HOSTNAME" -> "\\b[A-Za-z0-9][A-Za-z0-9._-]*\\b",
    "HOST" -> "\\b[A-Za-z0-9][A-Za-z0-9._-]*\\b",
    "USER" -> "[A-Za-z0-9._-]+",
    "USERNAME" -> "[A-Za-z0-9._-]+",
    "EMAILADDRESS" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
    "UUID" -> "[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12}",
    "QS" -> "\"[^\"]*\"",
    "QUOTEDSTRING" -> "\"[^\"]*\"",
    "PATH" -> "(?:/[\\w.-]+)+",
    "URIPATH" -> "(?:/[\\w.-]*)+",
    "TIMESTAMP_ISO8601" ->
      "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?(?:Z|[+-]\\d{2}:?\\d{2})?",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} [ 0-9]\\d \\d{2}:\\d{2}:\\d{2}",
    "HTTPDATE" -> "\\d{2}/[A-Z][a-z]{2}/\\d{4}:\\d{2}:\\d{2}:\\d{2} [+-]\\d{4}",
    "LOGLEVEL" ->
      "(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rror|ERROR|[Ff]atal|FATAL|[Cc]ritical|CRITICAL)")

  /** Compile a grok pattern to (javaRegex, capturedFieldNames). */
  def compile(grok: String): (String, Seq[String]) = {
    val ref = "%\\{(\\w+)(?::(\\w+))?\\}".r
    val names = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var last = 0
    ref.findAllMatchIn(grok).foreach { m =>
      val literal = grok.substring(last, m.start)
      if (literal.nonEmpty) sb.append(java.util.regex.Pattern.quote(literal))
      val pat = Patterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(name) => names += name; sb.append("(").append(pat).append(")")
        case None => sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    if (last < grok.length)
      sb.append(java.util.regex.Pattern.quote(grok.substring(last)))
    (sb.toString, names.toSeq)
  }

  /** parse_grok as a Column: struct of named captures (null on no match). */
  def parse(c: Column, grokPattern: String, anchored: Boolean = true): Column = {
    val (rx, names) = compile(grokPattern)
    val full = if (anchored) "^" + rx + "$" else rx
    RegexStruct(c, full, names)
  }
}

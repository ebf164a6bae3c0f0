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

  /** Compile a grok pattern to (javaRegex, capturedFieldNames).
    *
    * `aliases` adds user-defined pattern definitions (the reference's
    * parse_groks `aliases` argument / logstash custom pattern files);
    * alias bodies are themselves grok patterns, expanded recursively
    * with cycle detection. A NAMED reference to an alias captures the
    * whole alias match while inner named refs keep their own captures.
    */
  /** Un-named `(` in grok literal text → `(?:` (keeps group numbering
    * aligned with the named %{} captures); escaped `\(` stays literal.
    */
  private def regexLiteral(s: String): String =
    s.replaceAll("(?<!\\\\)\\((?!\\?)", "(?:")

  def compile(grok: String,
              aliases: Map[String, String] = Map.empty): (String, Seq[String]) = {
    val ref = "%\\{(\\w+)(?::(\\w+))?\\}".r
    val names = scala.collection.mutable.ListBuffer[String]()

    def expand(pattern: String, inFlight: Set[String]): String = {
      val sb = new StringBuilder
      var last = 0
      ref.findAllMatchIn(pattern).foreach { m =>
        val literal = pattern.substring(last, m.start)
        // literal segments are REGEX, as in the reference's grok (the
        // pattern text outside %{} passes through to the engine) — bare
        // capturing groups become non-capturing so group numbers keep
        // mapping positionally onto the %{...:name} captures
        if (literal.nonEmpty) sb.append(regexLiteral(literal))
        val pname = m.group(1)
        // the OUTER capture name must be recorded before the body is
        // expanded: its "(" precedes any inner alias captures, and
        // group numbers map to `names` positionally
        Option(m.group(2)).foreach(names += _)
        def body = aliases.get(pname) match {
          case Some(_) if inFlight(pname) =>
            throw new IllegalArgumentException(s"grok alias cycle through %{$pname}")
          case Some(alias) => expand(alias, inFlight + pname)
          case None => Patterns.getOrElse(pname,
            throw new IllegalArgumentException(s"unknown grok pattern %{$pname}"))
        }
        if (m.group(2) != null) sb.append("(").append(body).append(")")
        else sb.append("(?:").append(body).append(")")
        last = m.end
      }
      if (last < pattern.length)
        sb.append(regexLiteral(pattern.substring(last)))
      sb.toString
    }

    (expand(grok, Set.empty), names.toSeq)
  }

  /** parse_grok as a Column: struct of named captures (null on no match). */
  def parse(c: Column, grokPattern: String, anchored: Boolean = true,
            aliases: Map[String, String] = Map.empty): Column = {
    val (rx, names) = compile(grokPattern, aliases)
    val full = if (anchored) "^" + rx + "$" else rx
    RegexStruct(c, full, names)
  }

  /** parse_groks: try patterns in order, first match wins (reference
    * parse_groks semantics). All patterns must capture the SAME field
    * set so the result stays one struct column.
    */
  def parseFirstOf(c: Column, grokPatterns: Seq[String],
                   aliases: Map[String, String] = Map.empty): Column = {
    val compiled = grokPatterns.map(g => compile(g, aliases))
    val nameSets = compiled.map(_._2)
    require(nameSets.distinct.size == 1,
      s"parse_groks patterns must capture identical fields, got $nameSets")
    org.apache.spark.sql.functions.coalesce(
      compiled.map { case (rx, names) =>
        RegexStruct(c, "^" + rx + "$", names)
      }: _*)
  }
}

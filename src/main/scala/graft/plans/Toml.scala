package graft.plans

import scala.collection.mutable

/** Minimal TOML reader/writer for config conversion (reference:
  * src/convert_config.rs — Vector accepts toml/yaml/json interchangeably
  * for its config files; legacy Vector configs are TOML).
  *
  * Supported surface — what real Vector configs use: `[table]` /
  * `[[array-of-tables]]` headers, dotted and quoted keys, basic and
  * literal strings (single-line + multiline — VRL programs in TOML live
  * in ''' blocks), integers (with underscores), floats, booleans,
  * arrays (multiline allowed), inline tables, comments. Dates are kept
  * as strings. Not a full TOML 1.0 implementation (no exotic escapes
  * like \x; local-time offsets pass through as text).
  */
object Toml {

  def parse(text: String): Map[String, Any] = new Parser(text).parseDoc()

  private final class Parser(s: String) {
    private var i = 0
    private val root = mutable.LinkedHashMap[String, Any]()
    // table the following key-values land in
    private var current: mutable.LinkedHashMap[String, Any] = root

    def parseDoc(): Map[String, Any] = {
      skipWsNl()
      while (i < s.length) {
        if (s(i) == '[') header() else keyVal(current)
        skipWsNl()
      }
      deepImmutable(root).asInstanceOf[Map[String, Any]]
    }

    private def fail(msg: String): Nothing = {
      val line = s.substring(0, math.min(i, s.length)).count(_ == '\n') + 1
      throw new IllegalArgumentException(s"TOML parse error at line $line: $msg")
    }

    private def skipWs(): Unit =
      while (i < s.length && (s(i) == ' ' || s(i) == '\t')) i += 1
    private def skipWsNl(): Unit = {
      var go = true
      while (go) {
        skipWs()
        if (i < s.length && s(i) == '#') { while (i < s.length && s(i) != '\n') i += 1 }
        if (i < s.length && (s(i) == '\n' || s(i) == '\r')) i += 1 else go = false
      }
    }
    private def expectEol(): Unit = {
      skipWs()
      if (i < s.length && s(i) == '#') while (i < s.length && s(i) != '\n') i += 1
      if (i < s.length) {
        if (s(i) == '\n') i += 1
        else if (s(i) == '\r' && i + 1 < s.length && s(i + 1) == '\n') i += 2
        else fail(s"expected end of line, got '${s(i)}'")
      }
    }

    /** `[a.b]` or `[[a.b]]` — sets `current`. */
    private def header(): Unit = {
      val isArray = i + 1 < s.length && s(i + 1) == '['
      i += (if (isArray) 2 else 1)
      val path = keyPath()
      skipWs()
      if (isArray) {
        if (i + 1 >= s.length || s(i) != ']' || s(i + 1) != ']') fail("expected ]]")
        i += 2
      } else {
        if (i >= s.length || s(i) != ']') fail("expected ]")
        i += 1
      }
      expectEol()
      var tbl = root
      path.init.foreach { k => tbl = descend(tbl, k) }
      val last = path.last
      if (isArray) {
        val arr = tbl.getOrElseUpdate(last,
          mutable.ArrayBuffer[Any]()) match {
          case b: mutable.ArrayBuffer[Any @unchecked] => b
          case _ => fail(s"$last is not an array of tables")
        }
        val fresh = mutable.LinkedHashMap[String, Any]()
        arr += fresh
        current = fresh
      } else current = descend(tbl, last)
    }

    private def descend(tbl: mutable.LinkedHashMap[String, Any],
                        k: String): mutable.LinkedHashMap[String, Any] =
      tbl.getOrElseUpdate(k, mutable.LinkedHashMap[String, Any]()) match {
        case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
        case b: mutable.ArrayBuffer[Any @unchecked] => b.last match {
          // [[x]] then [x.y]: nested table of the LAST array element
          case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
          case _ => fail(s"$k is not a table")
        }
        case _ => fail(s"$k is not a table")
      }

    private def keyPath(): List[String] = {
      val parts = mutable.ListBuffer[String]()
      var go = true
      while (go) {
        skipWs()
        parts += bareOrQuotedKey()
        skipWs()
        if (i < s.length && s(i) == '.') i += 1 else go = false
      }
      parts.toList
    }

    private def bareOrQuotedKey(): String =
      if (i < s.length && (s(i) == '"' || s(i) == '\'')) string()
      else {
        val st = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '-')) i += 1
        if (i == st) fail("expected key")
        s.substring(st, i)
      }

    private def keyVal(into: mutable.LinkedHashMap[String, Any]): Unit = {
      val path = keyPath()
      skipWs()
      if (i >= s.length || s(i) != '=') fail("expected =")
      i += 1
      skipWs()
      val v = value()
      var tbl = into
      path.init.foreach(k => tbl = descend(tbl, k))
      tbl(path.last) = v
      expectEol()
    }

    private def value(): Any = {
      if (i >= s.length) fail("expected value")
      s(i) match {
        case '"' | '\'' => string()
        case '[' =>
          i += 1
          val items = mutable.ArrayBuffer[Any]()
          skipWsNl()
          while (i < s.length && s(i) != ']') {
            items += value()
            skipWsNl()
            if (i < s.length && s(i) == ',') { i += 1; skipWsNl() }
          }
          if (i >= s.length) fail("unterminated array")
          i += 1
          items
        case '{' =>
          i += 1
          val m = mutable.LinkedHashMap[String, Any]()
          skipWs()
          while (i < s.length && s(i) != '}') {
            val path = keyPath()
            skipWs()
            if (s(i) != '=') fail("expected = in inline table")
            i += 1; skipWs()
            val v = value()
            var tbl = m
            path.init.foreach(k => tbl = descend(tbl, k))
            tbl(path.last) = v
            skipWs()
            if (i < s.length && s(i) == ',') { i += 1; skipWs() }
          }
          if (i >= s.length) fail("unterminated inline table")
          i += 1
          m
        case 't' if s.startsWith("true", i) => i += 4; true
        case 'f' if s.startsWith("false", i) => i += 5; false
        case _ => number()
      }
    }

    private def string(): String = {
      val q = s(i)
      val triple = s.startsWith(q.toString * 3, i)
      if (triple) {
        i += 3
        // a newline right after the opener is trimmed (TOML spec)
        if (i < s.length && s(i) == '\n') i += 1
        else if (i + 1 < s.length && s(i) == '\r' && s(i + 1) == '\n') i += 2
        val end = s.indexOf(q.toString * 3, i)
        if (end < 0) fail("unterminated multiline string")
        val body = s.substring(i, end)
        i = end + 3
        if (q == '"') unescape(body) else body
      } else {
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s(i) != q) {
          if (q == '"' && s(i) == '\\' && i + 1 < s.length) {
            sb += (s(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case '"' => '"'; case '\\' => '\\'
              case 'u' =>
                val cp = Integer.parseInt(s.substring(i + 2, i + 6), 16)
                i += 4; cp.toChar
              case c => c
            })
            i += 2
          } else { sb += s(i); i += 1 }
        }
        if (i >= s.length) fail("unterminated string")
        i += 1
        sb.toString
      }
    }

    private def unescape(body: String): String = {
      val sb = new StringBuilder
      var j = 0
      while (j < body.length) {
        if (body(j) == '\\' && j + 1 < body.length) {
          body(j + 1) match {
            case 'n' => sb += '\n'; j += 2
            case 't' => sb += '\t'; j += 2
            case 'r' => sb += '\r'; j += 2
            case '"' => sb += '"'; j += 2
            case '\\' => sb += '\\'; j += 2
            case '\n' => // line-ending backslash: skip leading ws
              j += 2
              while (j < body.length && (body(j) == ' ' || body(j) == '\t' ||
                body(j) == '\n' || body(j) == '\r')) j += 1
            case c => sb += c; j += 2
          }
        } else { sb += body(j); j += 1 }
      }
      sb.toString
    }

    private def number(): Any = {
      val st = i
      while (i < s.length && (s(i).isLetterOrDigit || "+-._:".contains(s(i)))) i += 1
      if (i == st) fail("expected value")
      val raw = s.substring(st, i)
      val t = raw.replace("_", "")
      if (t.matches("[+-]?[0-9]+")) t.toLong
      else if (t.matches("[+-]?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?")) t.toDouble
      else raw // datetime or other literal: keep as string
    }

    private def deepImmutable(v: Any): Any = v match {
      case m: mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
        // insertion-ordered immutable view
        scala.collection.immutable.VectorMap.from(
          m.map { case (k, x) => k -> deepImmutable(x) })
      case b: mutable.ArrayBuffer[Any @unchecked] => b.map(deepImmutable).toList
      case other => other
    }
  }

  /** TOML text → equivalent YAML text (the config loader's native
    * input — config/format.rs treats toml/yaml/json as interchangeable
    * config formats).
    */
  def toYaml(text: String): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    opts.setIndent(2)
    new org.yaml.snakeyaml.Yaml(opts).dump(toJava(parse(text)))
  }

  /** Deep scala→java conversion (snakeyaml dumps java collections). */
  def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, x) => jm.put(k.toString, toJava(x)) }
      jm
    case l: Seq[_] =>
      val jl = new java.util.ArrayList[Any]()
      l.foreach(x => jl.add(toJava(x)))
      jl
    case other => other
  }

  /** Render a config tree back to TOML (tables for nested maps,
    * [[array-of-tables]] for lists of maps, inline syntax otherwise).
    */
  def render(conf: Map[String, Any]): String = {
    val sb = new StringBuilder
    def isMap(v: Any) = v.isInstanceOf[Map[_, _]]
    def isTableArray(v: Any) = v match {
      case l: Seq[_] => l.nonEmpty && l.forall(isMap)
      case _ => false
    }
    def scalar(v: Any): String = v match {
      case s: String if s.contains("\n") =>
        "'''\n" + s + (if (s.endsWith("\n")) "" else "\n") + "'''"
      case s: String =>
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case b: Boolean => b.toString
      // TOML has no null: null-valued KEYS are omitted entirely (below,
      // matching the reference's omission of unset defaults); a null
      // inside an array/inline-map is likewise dropped
      case l: Seq[_] =>
        l.filter(_ != null).map(scalar).mkString("[", ", ", "]")
      case m: Map[_, _] => m.collect { case (k, x) if x != null =>
        s"$k = ${scalar(x)}" }.mkString("{ ", ", ", " }")
      case other => other.toString
    }
    // emit one table's body: scalars first, then nested tables /
    // arrays-of-tables, each recursing with its dotted path. `header` is
    // the line that opens this table ([path] or [[path]]), emitted only
    // when the table has scalar keys or is empty — a purely structural
    // intermediate map ({sources: {...}}) needs no header of its own.
    def table(path: List[String], m: Map[String, Any],
              header: Option[String]): Unit = {
      val (plain, nested) = m.partition { case (_, v) =>
        !isMap(v) && !isTableArray(v) }
      // [[...]] headers always print — an element with only nested
      // content would otherwise merge into the previous element on
      // re-parse; plain [path] headers print only when needed
      if (header.nonEmpty &&
          (plain.nonEmpty || m.isEmpty || header.get.startsWith("[[")))
        sb ++= header.get + "\n"
      plain.foreach { case (k, v) =>
        if (v != null) sb ++= s"$k = ${scalar(v)}\n" }
      if (plain.nonEmpty || (header.nonEmpty && m.isEmpty)) sb ++= "\n"
      nested.foreach {
        case (k, v: Map[String @unchecked, Any @unchecked]) =>
          val p = path :+ k
          table(p, v, Some(s"[${p.mkString(".")}]"))
        case (k, l: Seq[_]) =>
          val p = path :+ k
          l.foreach { e =>
            table(p, e.asInstanceOf[Map[String, Any]],
              Some(s"[[${p.mkString(".")}]]"))
          }
        case _ => ()
      }
    }
    table(Nil, conf, None)
    sb.toString.replaceAll("\n{3,}", "\n\n").stripTrailing() + "\n"
  }
}

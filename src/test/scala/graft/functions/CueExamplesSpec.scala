package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runs the reference's VRL *language* documentation examples verbatim —
  * every runnable `source:`/`return:`/`output:` pair under
  * website/cue/reference/remap/expressions (arithmetic,
  * assignment, block, coalesce, comparison, function_call, if, index,
  * logical, path, variable, abort). The function library is covered by
  * the behavior YAMLs; this corpus pins the EXPRESSION semantics the
  * docs promise (value of a block, chained assignment, condition
  * side-effect ordering, timestamp literals, named arguments, …).
  *
  * Extraction: the cue format is line-regular — a small cursor parser
  * reads each example's `title`, optional `input: log:`, the
  * `source: #"""…"""#` raw block, and the expected `return:` value or
  * `output: log:` event (CUE values: numbers, strings, raw `#"…"#`
  * strings, bools, null, arrays, objects incl. `key: value` shorthand
  * chains, and `input.log…` references resolved against the input).
  *
  * Evaluation: `output:` examples run the program as-is and compare the
  * whole resulting event. `return:` examples wrap the program as
  * `.cue_result = { <source> }` (a block's value IS the program's
  * value) and compare the result field. Programs that `abort` run
  * unwrapped; the original event must come back (the docs' abort
  * semantics).
  */
class CueExamplesSpec extends SparkSpec {
  import spark.implicits._

  private val root = java.nio.file.Paths.get(
    "/root/reference/website/cue/reference/remap/expressions")

  // ---- CUE example extraction ----------------------------------------

  private final case class CueRef(segs: List[Either[String, Int]])
  private final case class Example(file: String, title: String,
                                   input: Option[Any], source: String,
                                   hasReturn: Boolean, expected: Any)

  /** Cursor parser over one cue file's `examples: [ … ]` region. */
  private def parseExamples(path: java.nio.file.Path): Seq[Example] = {
    val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val start = text.indexOf("\texamples: [")
    if (start < 0) return Nil
    var i = text.indexOf('[', start) + 1
    val n = text.length

    def skipWs(): Unit = {
      var going = true
      while (going && i < n) {
        val c = text(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',') i += 1
        else if (c == '/' && i + 1 < n && text(i + 1) == '/') {
          while (i < n && text(i) != '\n') i += 1
        } else going = false
      }
    }

    def parseQuoted(): String = {
      // plain "…" CUE string with escapes
      require(text(i) == '"'); i += 1
      val sb = new StringBuilder
      while (text(i) != '"') {
        if (text(i) == '\\') {
          text(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(text(i)); i += 1 }
      }
      i += 1
      sb.toString
    }

    def parseRaw(): String = {
      // #"…"# raw string (no escapes)
      require(text.startsWith("#\"", i)); i += 2
      val end = text.indexOf("\"#", i)
      val s = text.substring(i, end)
      i = end + 2
      s
    }

    def parseIdent(): String = {
      val s = i
      while (i < n && (text(i).isLetterOrDigit || text(i) == '_')) i += 1
      text.substring(s, i)
    }

    def parseValue(): Any = {
      skipWs()
      text(i) match {
        case '{' =>
          i += 1
          val m = new java.util.LinkedHashMap[String, Any]()
          skipWs()
          while (text(i) != '}') {
            val key = if (text(i) == '"') parseQuoted() else parseIdent()
            skipWs(); require(text(i) == ':'); i += 1
            m.put(key, parseValue())
            skipWs()
          }
          i += 1
          m
        case '[' =>
          i += 1
          val l = new java.util.ArrayList[Any]()
          skipWs()
          while (text(i) != ']') { l.add(parseValue()); skipWs() }
          i += 1
          l
        case '"' =>
          val s = parseQuoted()
          // `key: value` shorthand: a string key directly holding a value
          val save = i; skipWs()
          if (i < n && text(i) == ':') {
            i += 1
            val m = new java.util.LinkedHashMap[String, Any]()
            m.put(s, parseValue())
            m
          } else { i = save; s }
        case '#' => parseRaw()
        case c if c.isDigit || c == '-' =>
          val s = i
          if (text(i) == '-') i += 1
          while (i < n && (text(i).isDigit || text(i) == '.')) i += 1
          val tok = text.substring(s, i)
          if (tok.contains('.')) java.lang.Double.valueOf(tok)
          else java.lang.Long.valueOf(tok)
        case _ =>
          val id = parseIdent()
          val save = i; skipWs()
          if (i < n && text(i) == ':') {
            // ident shorthand object: `log: message: "x"`
            i += 1
            val m = new java.util.LinkedHashMap[String, Any]()
            m.put(id, parseValue())
            m
          } else {
            i = save
            id match {
              case "true" => java.lang.Boolean.TRUE
              case "false" => java.lang.Boolean.FALSE
              case "null" => null
              case "input" =>
                // `input.log.array[0]`-style reference
                val segs = List.newBuilder[Either[String, Int]]
                while (i < n && (text(i) == '.' || text(i) == '[')) {
                  if (text(i) == '.') {
                    i += 1
                    segs += Left(parseIdent())
                  } else {
                    i += 1
                    val s2 = i
                    while (text(i) != ']') i += 1
                    segs += Right(text.substring(s2, i).trim.toInt)
                    i += 1
                  }
                }
                CueRef(segs.result())
              case other => other // bare word — treat as string
            }
          }
      }
    }

    def parseSource(): String = {
      // source: #""" … """#   (dedent by stripping leading tabs)
      require(text.startsWith("#\"\"\"", i)); i += 4
      val end = text.indexOf("\"\"\"#", i)
      val body = text.substring(i, end)
      i = end + 4
      body.linesIterator.map(_.dropWhile(_ == '\t'))
        .mkString("\n").stripPrefix("\n").stripSuffix("\n")
    }

    val out = Seq.newBuilder[Example]
    skipWs()
    while (i < n && text(i) == '{') {
      i += 1
      var title = ""
      var input: Option[Any] = None
      var source = ""
      var hasReturn = false
      var expected: Any = null
      skipWs()
      while (text(i) != '}') {
        val key = parseIdent()
        skipWs(); require(text(i) == ':', s"expected : after $key"); i += 1
        skipWs()
        key match {
          case "title" => title = parseQuoted()
          case "source" => source = parseSource()
          case "input" =>
            // `input: log: <value>` — keep the log payload
            val v = parseValue()
            input = Option(v.asInstanceOf[java.util.Map[String, Any]]
              .get("log"))
          case "output" =>
            val v = parseValue()
            expected = v.asInstanceOf[java.util.Map[String, Any]].get("log")
          case "return" =>
            hasReturn = true
            expected = parseValue()
          case _ => parseValue() // notes etc. — skip
        }
        skipWs()
      }
      i += 1
      out += Example(path.getFileName.toString, title, input, source,
        hasReturn, expected)
      skipWs()
    }
    out.result()
  }

  // ---- expected-value resolution & comparison ------------------------

  private def resolveRefs(v: Any, input: Any): Any = v match {
    case CueRef(segs) =>
      segs.drop(1).foldLeft(input) { // drop the `log` seg (input IS log)
        case (m: java.util.Map[_, _], Left(k)) =>
          m.asInstanceOf[java.util.Map[String, Any]].get(k)
        case (l: java.util.List[_], Right(ix)) => l.get(ix)
        case (other, _) => other
      }
    case m: java.util.Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.asInstanceOf[java.util.Map[String, Any]]
        .forEach((k, x) => out.put(k, resolveRefs(x, input)))
      out
    case l: java.util.List[_] =>
      val out = new java.util.ArrayList[Any]()
      l.forEach(x => out.add(resolveRefs(x, input)))
      out
    case other => other
  }

  /** Deep equality with int/float unification (CUE `2` vs a column that
    * legitimately carries 2.0 after numeric promotion is NOT unified —
    * types must match; only Long-vs-Long, Double-vs-Double compare).
    */
  private def deepEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: java.util.Map[_, _], y: java.util.Map[_, _]) =>
      val xm = x.asInstanceOf[java.util.Map[String, Any]]
      val ym = y.asInstanceOf[java.util.Map[String, Any]]
      xm.keySet == ym.keySet &&
        xm.keySet.stream.allMatch(k => deepEq(xm.get(k), ym.get(k)))
    case (x: java.util.List[_], y: java.util.List[_]) =>
      x.size == y.size &&
        (0 until x.size).forall(ix => deepEq(x.get(ix), y.get(ix)))
    case (x, y) => x == y
  }

  private def render(v: Any): String = JsonLite.render(v)

  // ---- execution ------------------------------------------------------

  private def eventTree(df: org.apache.spark.sql.DataFrame): Any = {
    val cols = df.columns.filterNot(_.startsWith("__")).toSeq
    val json = df.select(to_json(struct(cols.map(col): _*),
        new java.util.HashMap[String, String] {
          put("ignoreNullFields", "false") })
      .as("j")).head().getString(0)
    JsonLite.parse(json)
  }

  private def runExample(ex: Example): Unit = {
    val inputJson = ex.input.map(render).getOrElse("""{"__seq": 0}""")
    val df = spark.read.json(Seq(inputJson).toDS)
    val expected = resolveRefs(ex.expected, ex.input.orNull)

    if (!ex.hasReturn) {
      // output: log: — run as-is, compare the whole resulting event
      val outDf = VrlCompiler.run(df, ex.source).primary
      val actual = eventTree(outDf)
      assert(deepEq(actual, expected),
        s"${ex.file} / ${ex.title}\n  expected: ${render(expected)}\n" +
          s"  actual:   ${render(actual)}")
    } else if (ex.source.contains("abort")) {
      // abort semantics: the event is dropped from the primary output
      // and the ORIGINAL event is what the docs show as the return
      val outs = VrlCompiler.run(df, ex.source)
      assert(outs.primary.isEmpty, s"${ex.file} / ${ex.title}: not aborted")
      val actual = eventTree(outs.dropped)
      assert(deepEq(actual, expected),
        s"${ex.file} / ${ex.title}\n  expected: ${render(expected)}\n" +
          s"  actual:   ${render(actual)}")
    } else {
      // return: — a block's value is the program's value
      val wrapped = s".cue_result = {\n${ex.source}\n}"
      val outDf = VrlCompiler.run(df, wrapped).primary
      val json = outDf.select(to_json(struct(col("cue_result")),
          new java.util.HashMap[String, String] {
            put("ignoreNullFields", "false") })
        .as("j")).head().getString(0)
      val actual = JsonLite.parse(json)
        .asInstanceOf[java.util.Map[String, Any]].get("cue_result")
      assert(deepEq(actual, expected),
        s"${ex.file} / ${ex.title}\n  expected: ${render(expected)}\n" +
          s"  actual:   ${render(actual)}")
    }
  }

  private val corpus: Seq[Example] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(root).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".cue")).sortBy(_.toString)
      .flatMap(parseExamples)
  }

  test("corpus extraction finds the full example set") {
    // 12 files, 60 examples as of the pinned reference tree
    assert(corpus.size >= 60, s"only ${corpus.size} examples extracted")
    assert(corpus.map(_.file).distinct.size == 12)
  }

  for (ex <- corpus)
    test(s"${ex.file}: ${ex.title}") { runExample(ex) }
}

package graft.functions

/** VRL source-text parser: tokenizer + recursive-descent parser producing
  * the AST that [[VrlCompiler]] lowers onto Catalyst `Column`s.
  *
  * Reference semantics: the VRL expression grammar published under
  * /root/reference/website/cue/reference/remap/expressions/
  * (assignment.cue, path.cue, if.cue, coalesce.cue, abort.cue,
  * arithmetic.cue, block.cue) and the program shape of
  * /root/reference/lib/vector-vrl/tests/tests/example.vrl. The parser is
  * an original recursive-descent implementation of that published
  * grammar subset:
  *
  *   - literals: strings (escapes), integers, floats, booleans, null,
  *     arrays, objects
  *   - paths: `.a.b[0]`, `."quoted key"`, bare `.` (whole event)
  *   - variables, path/variable assignment, error-coalescing assignment
  *     (`v, err = expr`)
  *   - `if` / `else if` / `else` (statement and expression position)
  *   - operators: `??`, `||`, `&&`, `==`, `!=`, `<`, `<=`, `>`, `>=`,
  *     `+`, `-`, `*`, `/`, `%`, unary `!`/`-`
  *   - function calls incl. fallible `f!(...)` form and named arguments
  *   - `abort`, `#` comments
  *
  * Newlines terminate statements (swallowed inside parens/brackets, as
  * in the reference grammar).
  */
object VrlAst {
  sealed trait Seg
  final case class FieldSeg(name: String) extends Seg
  final case class IndexSeg(i: Int) extends Seg

  sealed trait Expr
  final case class LitS(v: String) extends Expr
  /** `r'..'` regex literal — behaves as a string pattern everywhere
    * except where regex-ness is observable (tag_types_externally, split).
    */
  final case class LitR(v: String) extends Expr
  /** `t'2024-04-04T22:22:22+01:00'` timestamp literal (literals.cue
    * timestamp.cue): compares as an INSTANT, not a string
    * (comparison.cue "Less than timestamps").
    */
  final case class LitT(v: String) extends Expr
  final case class LitI(v: Long) extends Expr
  final case class LitF(v: Double) extends Expr
  final case class LitB(v: Boolean) extends Expr
  case object LitNull extends Expr
  final case class PathE(segs: List[Seg]) extends Expr
  final case class VarE(name: String) extends Expr
  final case class ArrayE(items: List[Expr]) extends Expr
  final case class ObjectE(fields: List[(String, Expr)]) extends Expr
  final case class CallE(name: String, bang: Boolean, args: List[Expr],
                         named: List[(String, Expr)],
                         closure: Option[ClosureE] = None,
                         span: (Int, Int) = (0, 0)) extends Expr
  /** `-> |params| { body }` attached to a call (closure.cue). */
  final case class ClosureE(params: List[String], body: Block)
  final case class UnE(op: String, e: Expr) extends Expr
  final case class BinE(op: String, l: Expr, r: Expr) extends Expr
  /** `expr.field[0]` — path access applied to a non-path expression. */
  final case class AccessE(e: Expr, segs: List[Seg]) extends Expr
  final case class IfE(branches: List[(Expr, Block)],
                       elseB: Option[Block]) extends Expr

  /** `%` — the event-metadata root (metadata.cue); bare form only. */
  case object MetaE extends Expr

  sealed trait Stmt
  sealed trait Target
  final case class PathT(segs: List[Seg]) extends Target
  final case class VarT(name: String) extends Target
  case object MetaT extends Target
  /** `target |= expr` — shallow object merge into the target
    * (assignment.cue's merge-assignment operator).
    */
  final case class MergeAssign(target: Target, errTarget: Option[Target],
                               value: Expr) extends Stmt
  /** Compiler-internal desugar of a non-root `|=`: merge(lhs, rhs) with
    * the lhs already expressed as a readable expression. Never produced
    * by the parser.
    */
  final case class MergeWrapE(lhs: Expr, rhs: Expr) extends Expr
  final case class Assign(target: Target, errTarget: Option[Target],
                          value: Expr) extends Stmt
  final case class ExprStmt(e: Expr) extends Stmt
  final case class AbortS(msg: Option[Expr]) extends Stmt
  /** Desugared statement sequence (chained assignment `.a = .b = v`). */
  final case class SeqS(stmts: List[Stmt]) extends Stmt
  /** Block in EXPRESSION position (`x = { stmt; expr }`, expressions.cue
    * block.cue) and parenthesized statement groups
    * (`(x = x + 1; x == 5)`, if.cue "Multiline expression"): evaluates
    * its statements, value = the final expression's value.
    */
  final case class BlockE(b: Block) extends Expr

  final case class Block(stmts: List[Stmt])
  final case class Program(stmts: List[Stmt])
}

object VrlParser {
  import VrlAst._

  final case class VrlParseException(msg: String, pos: Int)
      extends RuntimeException(s"$msg (at offset $pos)")

  // ---------------- tokenizer ----------------

  private sealed trait Tok { def pos: Int }
  private case class TStr(v: String, pos: Int) extends Tok
  private case class TRegex(v: String, pos: Int) extends Tok
  private case class TTsL(v: String, pos: Int) extends Tok
  private case class TInt(v: Long, pos: Int) extends Tok
  private case class TFloat(v: Double, pos: Int) extends Tok
  private case class TIdent(v: String, pos: Int) extends Tok
  private case class TPath(segs: List[Seg], pos: Int) extends Tok
  private case class TOp(v: String, pos: Int) extends Tok
  private case class TNl(pos: Int) extends Tok
  private case class TEof(pos: Int) extends Tok

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var depth = 0 // ( and [ nesting: newlines inside are insignificant
    val n = src.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_'

    def scanString(quote: Char, raw: Boolean = false): String = {
      val sb = new StringBuilder
      i += 1
      while (i < n && src(i) != quote) {
        if (raw && src(i) == '\\' && i + 1 < n) {
          // raw/regex/timestamp literal (r'..' etc.): backslashes stay
          // verbatim — only \' escapes the closing quote (literals.cue)
          if (src(i + 1) == quote) { sb.append(quote); i += 2 }
          else { sb.append('\\'); i += 1 }
        } else if (src(i) == '\\' && i + 1 < n) {
          src(i + 1) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case '\\' => sb.append('\\')
            case '\'' => sb.append('\''); case '"' => sb.append('"')
            case '0' => sb.append('\u0000')
            case '{' => sb.append("\\{") // template braces: keep verbatim
            case other => sb.append(other)
          }
          i += 2
        } else { sb.append(src(i)); i += 1 }
      }
      if (i >= n) throw VrlParseException("unterminated string", i)
      i += 1
      sb.toString
    }

    while (i < n) {
      val c = src(i)
      c match {
        case ' ' | '\t' | '\r' => i += 1
        case '#' => while (i < n && src(i) != '\n') i += 1
        case '\n' =>
          if (depth == 0) out += TNl(i)
          i += 1
        case '"' => val p = i; out += TStr(scanString('"'), p)
        case '\'' => val p = i; out += TStr(scanString('\''), p)
        case 's' | 'r' | 't' if i + 1 < n && src(i + 1) == '\'' =>
          // s'..' raw string / r'..' regex / t'..' timestamp literal:
          // surface the raw text as a string-ish token, escapes intact;
          // regexes keep a distinct token so regex-ness stays observable
          // (tag_types_externally, split literal-vs-regex)
          val p = i; i += 1
          val body = scanString('\'', raw = true)
          out += (c match {
            case 'r' => TRegex(body, p)
            case 't' => TTsL(body, p)
            case _ => TStr(body, p)
          })
        case d if d.isDigit =>
          val p = i
          while (i < n && (src(i).isDigit || src(i) == '_')) i += 1
          if (i < n && src(i) == '.' && i + 1 < n && src(i + 1).isDigit) {
            i += 1
            while (i < n && src(i).isDigit) i += 1
            out += TFloat(src.substring(p, i).replace("_", "").toDouble, p)
          } else out += TInt(src.substring(p, i).replace("_", "").toLong, p)
        case '.' =>
          // path: `.seg`, `."quoted"`, `.[idx]`, or bare `.`
          val p = i
          i += 1
          val segs = List.newBuilder[Seg]
          var more = true
          var first = true
          while (more) {
            if (i < n && (isIdentStart(src(i)) || src(i) == '"')) {
              if (src(i) == '"') segs += FieldSeg(scanString('"'))
              else {
                val s = i
                while (i < n && isIdentPart(src(i))) i += 1
                segs += FieldSeg(src.substring(s, i))
              }
              first = false
              // continue on `.` or `[`
              if (i < n && src(i) == '.' && i + 1 < n &&
                  (isIdentStart(src(i + 1)) || src(i + 1) == '"')) i += 1
              else if (i < n && src(i) == '[') {
                i += 1
                val s = i
                while (i < n && src(i) != ']') i += 1
                segs += IndexSeg(src.substring(s, i).trim.toInt)
                i += 1
                if (i < n && src(i) == '.' && i + 1 < n &&
                    (isIdentStart(src(i + 1)) || src(i + 1) == '"')) i += 1
                else more = false
              } else more = false
            } else if (first && i < n && src(i) == '[') {
              i += 1
              val s = i
              while (i < n && src(i) != ']') i += 1
              segs += IndexSeg(src.substring(s, i).trim.toInt)
              i += 1
              first = false
              if (i < n && src(i) == '.') i += 1 else more = false
            } else more = false
          }
          out += TPath(segs.result(), p)
        case _ if isIdentStart(c) =>
          val p = i
          while (i < n && isIdentPart(src(i))) i += 1
          out += TIdent(src.substring(p, i), p)
        case '(' | '[' =>
          depth += 1; out += TOp(c.toString, i); i += 1
        case ')' | ']' =>
          depth -= 1; out += TOp(c.toString, i); i += 1
        case '{' | '}' | ',' | ':' | ';' =>
          out += TOp(c.toString, i); i += 1
        case _ =>
          val two = if (i + 1 < n) src.substring(i, i + 2) else ""
          two match {
            case "==" | "!=" | "<=" | ">=" | "&&" | "||" | "??" | "->" | "|=" =>
              out += TOp(two, i); i += 2
            case _ =>
              c match {
                case '=' | '<' | '>' | '+' | '-' | '*' | '/' | '%' | '!' | '|' =>
                  out += TOp(c.toString, i); i += 1
                case other =>
                  throw VrlParseException(s"unexpected character '$other'", i)
              }
          }
      }
    }
    out += TEof(n)
    out.result()
  }

  // ---------------- parser ----------------

  def parse(src: String): Program = new P(tokenize(src)).program()

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def isOp(v: String): Boolean =
      cur.isInstanceOf[TOp] && cur.asInstanceOf[TOp].v == v
    private def eatOp(v: String): Unit =
      if (isOp(v)) pos += 1
      else throw VrlParseException(s"expected '$v' got $cur", cur.pos)
    private def skipNl(): Unit =
      while (cur.isInstanceOf[TNl] || isOp(";")) pos += 1
    private def isIdent(v: String): Boolean =
      cur.isInstanceOf[TIdent] && cur.asInstanceOf[TIdent].v == v

    def program(): Program = {
      val stmts = List.newBuilder[Stmt]
      skipNl()
      while (!cur.isInstanceOf[TEof]) {
        stmts += statement()
        skipNl()
      }
      Program(stmts.result())
    }

    private def block(): Block = {
      eatOp("{")
      skipNl()
      val stmts = List.newBuilder[Stmt]
      while (!isOp("}")) {
        stmts += statement()
        skipNl()
      }
      eatOp("}")
      Block(stmts.result())
    }

    private def statement(): Stmt = {
      if (isIdent("abort")) {
        advance()
        // optional same-line message expression
        if (cur.isInstanceOf[TNl] || cur.isInstanceOf[TEof] || isOp("}"))
          AbortS(None)
        else AbortS(Some(expr()))
      } else if (isIdent("if")) {
        ExprStmt(ifExpr())
      } else {
        // assignment lookahead: target [, target] =
        val mark = pos
        parseTargetOpt() match {
          case Some(t1) =>
            if (isOp(",")) {
              advance()
              parseTargetOpt() match {
                case Some(t2) if isOp("=") =>
                  advance(); skipNlInExpr()
                  return Assign(t1, Some(t2), expr())
                case Some(t2) if isOp("|=") =>
                  advance(); skipNlInExpr()
                  return MergeAssign(t1, Some(t2), expr())
                case _ => pos = mark
              }
            } else if (isOp("=")) {
              advance(); skipNlInExpr()
              // chained assignment `.first = .second = v`
              // (assignment.cue "Double assignment"): collect targets,
              // assign the innermost first, earlier targets read it back
              val targets = List.newBuilder[Target]
              targets += t1
              var chaining = true
              while (chaining) {
                val mark2 = pos
                parseTargetOpt() match {
                  case Some(tn) if isOp("=") =>
                    advance(); skipNlInExpr(); targets += tn
                  case _ => pos = mark2; chaining = false
                }
              }
              val ts = targets.result()
              if (ts.length == 1) return Assign(t1, None, expr())
              val value = expr()
              def asExpr(t: Target): Expr = t match {
                case PathT(segs) => PathE(segs)
                case VarT(n0) => VarE(n0)
                case MetaT => MetaE
              }
              return SeqS(Assign(ts.last, None, value) ::
                ts.init.reverse.map(t => Assign(t, None, asExpr(ts.last))))
            } else if (isOp("|=")) {
              advance(); skipNlInExpr()
              return MergeAssign(t1, None, expr())
            } else pos = mark
          case None => pos = mark
        }
        ExprStmt(expr())
      }
    }

    // newline after `=` or an operator is permitted (expression continues)
    private def skipNlInExpr(): Unit =
      while (cur.isInstanceOf[TNl]) pos += 1

    private def parseTargetOpt(): Option[Target] = cur match {
      case TOp("%", _) => advance(); Some(MetaT)
      case TPath(segs, _) => advance(); Some(PathT(segs))
      case TIdent(name, _)
          if !Set("if", "else", "true", "false", "null", "abort")(name) =>
        // only a bare ident (not a call) can be an assignment target
        toks(pos + 1) match {
          case TOp("(", _) => None
          case _ => advance(); Some(VarT(name))
        }
      case _ => None
    }

    private def ifExpr(): IfE = {
      // `if` already current
      advance()
      val branches = List.newBuilder[(Expr, Block)]
      val c = expr()
      branches += ((c, block()))
      var elseB: Option[Block] = None
      var done = false
      while (!done) {
        val mark = pos
        skipNl()
        if (isIdent("else")) {
          advance()
          if (isIdent("if")) {
            advance()
            val c2 = expr()
            branches += ((c2, block()))
          } else {
            elseB = Some(block())
            done = true
          }
        } else { pos = mark; done = true }
      }
      IfE(branches.result(), elseB)
    }

    private def expr(): Expr = coalesceE()

    private def binChain(next: () => Expr, ops: Set[String]): Expr = {
      var l = next()
      while (cur.isInstanceOf[TOp] && ops(cur.asInstanceOf[TOp].v)) {
        val op = advance().asInstanceOf[TOp].v
        skipNlInExpr()
        l = BinE(op, l, next())
      }
      l
    }

    private def coalesceE(): Expr = binChain(() => orE(), Set("??"))
    private def orE(): Expr = binChain(() => andE(), Set("||"))
    private def andE(): Expr = binChain(() => eqE(), Set("&&"))
    private def eqE(): Expr = binChain(() => cmpE(), Set("==", "!="))
    private def cmpE(): Expr = binChain(() => addE(), Set("<", "<=", ">", ">="))
    private def addE(): Expr = binChain(() => mulE(), Set("+", "-"))
    private def mulE(): Expr = binChain(() => unE(), Set("*", "/", "%"))

    private def unE(): Expr =
      if (isOp("!")) { advance(); UnE("!", unE()) }
      else if (isOp("-")) { advance(); UnE("-", unE()) }
      else postfix()

    private def postfix(): Expr = {
      var e = primary()
      var more = true
      while (more) {
        cur match {
          case TPath(segs, _) =>
            // `expr.field` — the tokenizer lexes the trailing `.field`
            // as a path token
            advance(); e = AccessE(e, segs)
          case TOp("[", _) =>
            // `expr[0]` — static integer index only (VRL paths are
            // static; dynamic indexing goes through get()). Anything
            // else after `[` means a fresh array literal, not an index,
            // so leave the token stream untouched
            (toks(pos + 1), toks(pos + 2)) match {
              case (TInt(i, _), TOp("]", _)) =>
                advance(); advance(); advance()
                e = AccessE(e, List(IndexSeg(i.toInt)))
              case _ => more = false
            }
          case _ => more = false
        }
      }
      e
    }

    private def primary(): Expr = cur match {
      case TStr(v, _) => advance(); LitS(v)
      case TRegex(v, _) => advance(); LitR(v)
      case TTsL(v, _) => advance(); LitT(v)
      case TInt(v, _) => advance(); LitI(v)
      case TFloat(v, _) => advance(); LitF(v)
      case TPath(segs, _) => advance(); PathE(segs)
      case TIdent("true", _) => advance(); LitB(true)
      case TIdent("false", _) => advance(); LitB(false)
      case TIdent("null", _) => advance(); LitNull
      case TIdent("if", _) => ifExpr()
      case TIdent(name, p) =>
        toks(pos + 1) match {
          case TOp("(", _) => advance(); call(name, bang = false, p)
          case TOp("!", _) =>
            toks(pos + 2) match {
              case TOp("(", _) => advance(); advance(); call(name, bang = true, p)
              case _ => advance(); VarE(name)
            }
          case _ => advance(); VarE(name)
        }
      case TOp("%", _) => advance(); MetaE
      case TOp("(", _) =>
        // parenthesized group: one expression, or a `;`/newline-separated
        // statement sequence whose value is the last expression
        // (if.cue "Multiline expression"). The tokenizer suppresses
        // newlines inside parens, so statements self-delimit or use `;`.
        advance(); skipNlInExpr()
        val stmts = List.newBuilder[Stmt]
        while (!isOp(")")) {
          stmts += statement()
          skipNlInExpr()
          if (isOp(";")) { advance(); skipNlInExpr() }
        }
        eatOp(")")
        stmts.result() match {
          case List(ExprStmt(e)) => e
          case Nil => throw VrlParseException("empty parentheses", cur.pos)
          case ss => BlockE(Block(ss))
        }
      case TOp("[", _) =>
        advance(); skipNlInExpr()
        val items = List.newBuilder[Expr]
        while (!isOp("]")) {
          items += expr()
          skipNlInExpr()
          if (isOp(",")) { advance(); skipNlInExpr() }
        }
        eatOp("]")
        ArrayE(items.result())
      case TOp("{", _) =>
        // `{` in expression position: an object literal iff the first
        // token pair is `key:` (string or ident key); otherwise a BLOCK
        // expression (block.cue — `x = { stmt; expr }`)
        val isObject = {
          var j = pos + 1
          while (toks(j).isInstanceOf[TNl]) j += 1
          toks(j) match {
            case TOp("}", _) => true // empty {} = empty object
            case TStr(_, _) | TIdent(_, _) => toks(j + 1) match {
              case TOp(":", _) => true
              case _ => false
            }
            case _ => false
          }
        }
        if (!isObject) BlockE(block())
        else {
          advance(); skipNl()
          val fields = List.newBuilder[(String, Expr)]
          while (!isOp("}")) {
            val key = cur match {
              case TStr(v, _) => advance(); v
              case TIdent(v, _) => advance(); v
              case t => throw VrlParseException(s"expected object key, got $t", t.pos)
            }
            eatOp(":"); skipNlInExpr()
            fields += ((key, expr()))
            skipNl()
            if (isOp(",")) { advance(); skipNl() }
          }
          eatOp("}")
          ObjectE(fields.result())
        }
      case t => throw VrlParseException(s"unexpected token $t", t.pos)
    }

    private def call(name: String, bang: Boolean, startPos: Int): Expr = {
      // current token is "("
      eatOp("(")
      skipNlInExpr()
      val args = List.newBuilder[Expr]
      val named = List.newBuilder[(String, Expr)]
      while (!isOp(")")) {
        cur match {
          case TIdent(argName, _) if toks(pos + 1) == TOp(":", toks(pos + 1).pos) =>
            advance(); advance(); skipNlInExpr()
            named += ((argName, expr()))
          case _ => args += expr()
        }
        skipNlInExpr()
        if (isOp(",")) { advance(); skipNlInExpr() }
      }
      // the span covers name..close-paren — VRL error messages cite it
      // as byte offsets `(start:end)` (remap_infallible_assignment)
      val endPos = cur.pos + 1
      eatOp(")")
      // optional closure: `-> |a, b| { ... }`
      val closure = if (isOp("->")) {
        advance()
        skipNlInExpr()
        eatOp("|")
        val params = List.newBuilder[String]
        while (!isOp("|")) {
          cur match {
            case TIdent(p, _) => advance(); params += p
            case t => throw VrlParseException(s"expected closure param, got $t", t.pos)
          }
          if (isOp(",")) advance()
        }
        eatOp("|")
        skipNlInExpr()
        Some(ClosureE(params.result(), block()))
      } else None
      CallE(name, bang, args.result(), named.result(), closure,
        (startPos, endPos))
    }
  }
}

package graft.functions

import scala.collection.mutable

/** A micro-Lua interpreter for the `lua` transform (reference
  * src/transforms/lua/, behavior files tests/behavior/transforms/
  * lua_v1.yaml + lua_v2.yaml). The reference embeds a full Lua VM
  * (mlua); transform scripts in practice use a small imperative core,
  * which this interpreter covers:
  *
  *  - multiple assignment (`a, b = nil, a` — RHS evaluated first, then
  *    assigned left-to-right; assigning nil to a table key REMOVES it,
  *    Lua table semantics)
  *  - dot / bracket table access and table constructors
  *    (`{name = "x", counter = {value = 1.0}}`)
  *  - function definitions (named `function f(a, b) ... end` and
  *    anonymous `function (event, emit) ... end`) and calls — v2 hooks
  *    take (event, emit) with emit collecting 0..N output events
  *  - arithmetic (+ - * / %), string concat (..), comparisons,
  *    and/or/not, if/elseif/else, local declarations, return
  *
  * Out of scope (throws a clear error): loops, metatables, stdlib
  * beyond tostring/tonumber/type/pairs-free code — the behavior suite
  * and typical transform hooks don't use them.
  *
  * Value model: null | Boolean | Long | Double | String |
  * mutable.LinkedHashMap[String, Any] (tables) | LuaFunction. All AST
  * nodes are serializable case classes so compiled programs ship to
  * executors inside a flatMap closure.
  */
object MicroLua {

  // ---------------- AST ----------------
  sealed trait Expr extends Serializable
  final case class Lit(v: Any) extends Expr
  final case class Name(n: String) extends Expr
  final case class Index(target: Expr, key: Expr) extends Expr
  final case class TableCons(fields: List[(String, Expr)]) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Un(op: String, e: Expr) extends Expr
  final case class Call(fn: Expr, args: List[Expr]) extends Expr
  final case class FuncLit(params: List[String], body: List[Stat]) extends Expr

  sealed trait Stat extends Serializable
  final case class Assign(targets: List[Expr], values: List[Expr],
                          local: Boolean) extends Stat
  final case class ExprStat(e: Expr) extends Stat
  final case class FuncDef(name: String, fn: FuncLit) extends Stat
  final case class If(arms: List[(Expr, List[Stat])],
                      orElse: List[Stat]) extends Stat
  final case class Return(e: Option[Expr]) extends Stat

  final case class LuaFunction(params: List[String], body: List[Stat])
    extends Serializable

  final class LuaError(msg: String) extends RuntimeException(msg)

  // ---------------- parser ----------------
  def parse(src: String): List[Stat] = new Parser(src).block(Set.empty)

  /** Parse a chunk that is a single anonymous function literal
    * (`function (event, emit) ... end` — the v2 inline hook form).
    */
  def parseFunction(src: String): LuaFunction = {
    val p = new Parser(src)
    p.skip()
    val e = p.expr()
    e match {
      case FuncLit(ps, b) => LuaFunction(ps, b)
      case _ => throw new LuaError("expected a function literal hook")
    }
  }

  private final class Parser(s: String) {
    private var i = 0
    def skip(): Unit = {
      var go = true
      while (go) {
        go = false
        while (i < s.length && s(i).isWhitespace) { i += 1; go = true }
        if (i + 1 < s.length && s(i) == '-' && s(i + 1) == '-') {
          while (i < s.length && s(i) != '\n') i += 1
          go = true
        }
      }
    }
    private def fail(msg: String): Nothing = {
      val line = s.substring(0, math.min(i, s.length)).count(_ == '\n') + 1
      throw new LuaError(s"lua parse error at line $line: $msg")
    }
    private def peekWord(): String = {
      val st = i
      if (st < s.length && (s(st).isLetter || s(st) == '_')) {
        var j = st
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        s.substring(st, j)
      } else ""
    }
    private def eatWord(w: String): Boolean = {
      skip()
      if (peekWord() == w) { i += w.length; true } else false
    }
    private def expectWord(w: String): Unit =
      if (!eatWord(w)) fail(s"expected '$w'")
    private def eat(c: Char): Boolean = {
      skip()
      if (i < s.length && s(i) == c) { i += 1; true } else false
    }
    private def expect(c: Char): Unit = if (!eat(c)) fail(s"expected '$c'")

    private val stoppers = Set("end", "else", "elseif")

    def block(extraStop: Set[String]): List[Stat] = {
      val out = mutable.ListBuffer[Stat]()
      var go = true
      while (go) {
        skip()
        if (i >= s.length || stoppers(peekWord()) ||
          extraStop(peekWord())) go = false
        else out += stat()
      }
      out.toList
    }

    private def stat(): Stat = {
      skip()
      if (eat(';')) return stat()
      peekWord() match {
        case "function" =>
          i += "function".length; skip()
          val name = ident()
          FuncDef(name, funcTail())
        case "local" =>
          i += "local".length
          assignStat(local = true)
        case "if" =>
          i += "if".length
          val arms = mutable.ListBuffer[(Expr, List[Stat])]()
          var cond = expr()
          expectWord("then")
          arms += ((cond, block(Set.empty)))
          var orElse: List[Stat] = Nil
          var closed = false
          while (!closed) {
            skip()
            peekWord() match {
              case "elseif" =>
                i += "elseif".length
                cond = expr(); expectWord("then")
                arms += ((cond, block(Set.empty)))
              case "else" =>
                i += "else".length
                orElse = block(Set.empty)
                expectWord("end"); closed = true
              case "end" => i += "end".length; closed = true
              case w => fail(s"expected elseif/else/end, got '$w'")
            }
          }
          If(arms.toList, orElse)
        case "return" =>
          i += "return".length
          skip()
          if (i >= s.length || stoppers(peekWord())) Return(None)
          else Return(Some(expr()))
        case _ => assignStat(local = false)
      }
    }

    private def assignStat(local: Boolean): Stat = {
      val first = expr()
      skip()
      if (i < s.length && (s(i) == ',' || s(i) == '=') &&
        !(i + 1 < s.length && s(i) == '=' && s(i + 1) == '=')) {
        val targets = mutable.ListBuffer[Expr](first)
        while (eat(',')) targets += expr()
        expect('=')
        val values = mutable.ListBuffer[Expr](expr())
        while (eat(',')) values += expr()
        Assign(targets.toList, values.toList, local)
      } else first match {
        case c: Call => ExprStat(c)
        case _ if local => Assign(List(first), List(Lit(null)), local)
        case _ => fail("expected assignment or call")
      }
    }

    private def ident(): String = {
      skip()
      val w = peekWord()
      if (w.isEmpty || Set("nil", "true", "false", "function", "end", "then",
        "if", "else", "elseif", "return", "local", "and", "or", "not")(w))
        fail("expected identifier")
      i += w.length
      w
    }

    private def funcTail(): FuncLit = {
      expect('(')
      val params = mutable.ListBuffer[String]()
      skip()
      if (!eat(')')) {
        params += ident()
        while (eat(',')) params += ident()
        expect(')')
      }
      val body = block(Set.empty)
      expectWord("end")
      FuncLit(params.toList, body)
    }

    def expr(): Expr = orExpr()
    private def orExpr(): Expr = {
      var l = andExpr()
      while (eatWord("or")) l = Bin("or", l, andExpr())
      l
    }
    private def andExpr(): Expr = {
      var l = cmpExpr()
      while (eatWord("and")) l = Bin("and", l, cmpExpr())
      l
    }
    private def cmpExpr(): Expr = {
      var l = concatExpr()
      var go = true
      while (go) {
        skip()
        val op =
          if (s.startsWith("==", i)) "=="
          else if (s.startsWith("~=", i)) "~="
          else if (s.startsWith("<=", i)) "<="
          else if (s.startsWith(">=", i)) ">="
          else if (i < s.length && s(i) == '<') "<"
          else if (i < s.length && s(i) == '>') ">"
          else ""
        if (op.isEmpty) go = false
        else { i += op.length; l = Bin(op, l, concatExpr()) }
      }
      l
    }
    private def concatExpr(): Expr = {
      val l = addExpr()
      skip()
      if (s.startsWith("..", i) && !(i + 2 < s.length && s(i + 2) == '.')) {
        i += 2
        Bin("..", l, concatExpr()) // right-assoc like Lua
      } else l
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      var go = true
      while (go) {
        skip()
        if (i < s.length && (s(i) == '+' ||
          (s(i) == '-' && !s.startsWith("--", i)))) {
          val op = s(i).toString; i += 1
          l = Bin(op, l, mulExpr())
        } else go = false
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = unary()
      var go = true
      while (go) {
        skip()
        if (i < s.length && (s(i) == '*' || s(i) == '/' || s(i) == '%')) {
          val op = s(i).toString; i += 1
          l = Bin(op, l, unary())
        } else go = false
      }
      l
    }
    private def unary(): Expr = {
      skip()
      if (eatWord("not")) Un("not", unary())
      else if (i < s.length && s(i) == '-' && !s.startsWith("--", i)) {
        i += 1; Un("-", unary())
      } else postfix()
    }

    private def postfix(): Expr = {
      var e = atom()
      var go = true
      while (go) {
        skip()
        if (i < s.length && s(i) == '.' && !s.startsWith("..", i)) {
          i += 1; e = Index(e, Lit(ident()))
        }
        else if (i < s.length && s(i) == '[') {
          i += 1; val k = expr(); expect(']'); e = Index(e, k)
        } else if (i < s.length && s(i) == '(') {
          i += 1
          val args = mutable.ListBuffer[Expr]()
          skip()
          if (!eat(')')) {
            args += expr()
            while (eat(',')) args += expr()
            expect(')')
          }
          e = Call(e, args.toList)
        } else go = false
      }
      e
    }

    private def atom(): Expr = {
      skip()
      if (i >= s.length) fail("unexpected end of input")
      s(i) match {
        case '(' => i += 1; val e = expr(); expect(')'); e
        case '"' | '\'' => Lit(stringLit())
        case '{' =>
          i += 1
          val fields = mutable.ListBuffer[(String, Expr)]()
          skip()
          while (i < s.length && s(i) != '}') {
            skip()
            val key =
              if (s(i) == '[') { i += 1; val k = expr(); expect(']'); expect('=')
                k match {
                  case Lit(sk: String) => sk
                  case _ => fail("table keys must be constant strings")
                }
              } else { val n = ident(); expect('='); n }
            fields += ((key, expr()))
            skip()
            if (i < s.length && (s(i) == ',' || s(i) == ';')) { i += 1; skip() }
          }
          expect('}')
          TableCons(fields.toList)
        case c if c.isDigit => Lit(numberLit())
        case _ =>
          peekWord() match {
            case "nil" => i += 3; Lit(null)
            case "true" => i += 4; Lit(true)
            case "false" => i += 5; Lit(false)
            case "function" => i += "function".length; funcTail()
            case w if w.nonEmpty => i += w.length; Name(w)
            case _ => fail(s"unexpected character '${s(i)}'")
          }
      }
    }

    private def stringLit(): String = {
      val q = s(i); i += 1
      val sb = new StringBuilder
      while (i < s.length && s(i) != q) {
        if (s(i) == '\\' && i + 1 < s.length) {
          sb += (s(i + 1) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case c => c
          })
          i += 2
        } else { sb += s(i); i += 1 }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }

    private def numberLit(): Any = {
      val st = i
      while (i < s.length && (s(i).isDigit || s(i) == '.' ||
        s(i) == 'e' || s(i) == 'E' ||
        ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E'))))
        i += 1
      val t = s.substring(st, i)
      if (t.contains('.') || t.toLowerCase.contains('e')) t.toDouble else t.toLong
    }
  }

  // ---------------- interpreter ----------------
  type Table = mutable.LinkedHashMap[String, Any]
  def table(): Table = mutable.LinkedHashMap[String, Any]()

  private final case class ReturnSignal(v: Any) extends RuntimeException

  final class Env(parent: Option[Env]) {
    private val vars = mutable.HashMap[String, Any]()
    def declare(n: String, v: Any): Unit = vars(n) = v
    def set(n: String, v: Any): Unit =
      if (vars.contains(n)) vars(n) = v
      else parent match {
        case Some(p) if p.has(n) => p.set(n, v)
        case _ => vars(n) = v // Lua globals: assignment creates
      }
    def has(n: String): Boolean =
      vars.contains(n) || parent.exists(_.has(n))
    def get(n: String): Any =
      vars.getOrElse(n, parent.map(_.get(n)).orNull)
  }

  def exec(body: List[Stat], env: Env): Unit = body.foreach(st(_, env))

  private def st(s0: Stat, env: Env): Unit = s0 match {
    case Assign(targets, values, local) =>
      val vs = values.map(eval(_, env))
      targets.zipWithIndex.foreach { case (t, k) =>
        val v = if (k < vs.length) vs(k) else null
        t match {
          case Name(n) => if (local) env.declare(n, v) else env.set(n, v)
          case Index(tgt, key) =>
            val tbl = eval(tgt, env) match {
              case t: Table @unchecked => t
              case null => throw new LuaError("attempt to index a nil value")
              case other => throw new LuaError(s"cannot index $other")
            }
            val k2 = eval(key, env) match {
              case s: String => s
              case n: Long => n.toString
              case n: Double => n.toString
              case other => throw new LuaError(s"bad table key: $other")
            }
            if (v == null) tbl.remove(k2) else tbl(k2) = v
          case other => throw new LuaError(s"bad assignment target: $other")
        }
      }
    case ExprStat(e) => eval(e, env)
    case FuncDef(name, FuncLit(ps, b)) => env.set(name, LuaFunction(ps, b))
    case If(arms, orElse) =>
      arms.find { case (c, _) => truthy(eval(c, env)) } match {
        case Some((_, body)) => exec(body, new Env(Some(env)))
        case None => exec(orElse, new Env(Some(env)))
      }
    case Return(e) => throw ReturnSignal(e.map(eval(_, env)).orNull)
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case false => false
    case _ => true
  }

  private def num(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case i: Int => i.toDouble
    case s: String => s.toDouble
    case other => throw new LuaError(s"arithmetic on non-number: $other")
  }
  private def bothLong(a: Any, b: Any): Boolean =
    (a.isInstanceOf[Long] || a.isInstanceOf[Int]) &&
      (b.isInstanceOf[Long] || b.isInstanceOf[Int])

  def eval(e: Expr, env: Env): Any = e match {
    case Lit(v) => v
    case Name(n) => env.get(n)
    case FuncLit(ps, b) => LuaFunction(ps, b)
    case Index(t, k) => eval(t, env) match {
      case tbl: Table @unchecked => eval(k, env) match {
        case s: String => tbl.getOrElse(s, null)
        case n: Long => tbl.getOrElse(n.toString, null)
        case n: Double => tbl.getOrElse(n.toString, null)
        case _ => null
      }
      case null => null // indexing nil reads as nil in event paths
      case _ => null
    }
    case TableCons(fields) =>
      val t = table()
      fields.foreach { case (k, v) => t(k) = eval(v, env) }
      t
    case Un("not", x) => !truthy(eval(x, env))
    case Un("-", x) => eval(x, env) match {
      case l: Long => -l
      case d: Double => -d
      case v => -num(v)
    }
    case Un(op, _) => throw new LuaError(s"unknown unary $op")
    case Bin("and", l, r) =>
      val lv = eval(l, env); if (!truthy(lv)) lv else eval(r, env)
    case Bin("or", l, r) =>
      val lv = eval(l, env); if (truthy(lv)) lv else eval(r, env)
    case Bin("..", l, r) =>
      luaToString(eval(l, env)) + luaToString(eval(r, env))
    case Bin(op, l, r) =>
      val (a, b) = (eval(l, env), eval(r, env))
      op match {
        case "+" => if (bothLong(a, b)) num(a).toLong + num(b).toLong
          else num(a) + num(b)
        case "-" => if (bothLong(a, b)) num(a).toLong - num(b).toLong
          else num(a) - num(b)
        case "*" => if (bothLong(a, b)) num(a).toLong * num(b).toLong
          else num(a) * num(b)
        case "/" => num(a) / num(b)
        case "%" => if (bothLong(a, b)) num(a).toLong % num(b).toLong
          else num(a) % num(b)
        case "==" => luaEq(a, b)
        case "~=" => !luaEq(a, b)
        case "<" => num(a) < num(b)
        case "<=" => num(a) <= num(b)
        case ">" => num(a) > num(b)
        case ">=" => num(a) >= num(b)
        case other => throw new LuaError(s"unknown operator $other")
      }
    case Call(fe, args) =>
      val vs = args.map(eval(_, env))
      eval(fe, env) match {
        case LuaFunction(ps, body) =>
          val local = new Env(Some(env))
          ps.zipWithIndex.foreach { case (p, k) =>
            local.declare(p, if (k < vs.length) vs(k) else null)
          }
          try { exec(body, local); null }
          catch { case ReturnSignal(v) => v }
        case f: Function1[Any, Any] @unchecked => f(vs.headOption.orNull)
        case null => fe match {
          case Name("tostring") => luaToString(vs.headOption.orNull)
          case Name("tonumber") => try num(vs.headOption.orNull)
            catch { case _: Exception => null }
          case Name("type") => vs.headOption.orNull match {
            case null => "nil"
            case _: Boolean => "boolean"
            case _: Long | _: Double | _: Int => "number"
            case _: String => "string"
            case _: Table @unchecked => "table"
            case _: LuaFunction => "function"
            case _ => "userdata"
          }
          case Name(n) => throw new LuaError(s"call of undefined function '$n'")
          case _ => throw new LuaError("call of a non-function value")
        }
        case other => throw new LuaError(s"cannot call $other")
      }
  }

  private def luaEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Long, y: Double) => x.toDouble == y
    case (x: Double, y: Long) => x == y.toDouble
    case _ => a == b
  }

  def luaToString(v: Any): String = v match {
    case null => "nil"
    case d: Double if d == d.floor && !d.isInfinite =>
      if (d == d.longValue.toDouble) f"$d%.1f" else d.toString
    case other => other.toString
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class MicroLuaSpec extends AnyFunSuite {
  import MicroLua._

  private def run(src: String, bind: (String, Any)*): Env = {
    val env = new Env(None)
    bind.foreach { case (k, v) => env.declare(k, v) }
    exec(parse(src), env)
    env
  }

  test("multiple assignment evaluates RHS first; nil removes table keys") {
    val t = table(); t("a") = "example value"
    val env = run("""event["a"], event["b"] = nil, event["a"]""",
      "event" -> t)
    val out = env.get("event").asInstanceOf[Table]
    assert(!out.contains("a"))
    assert(out("b") == "example value")
  }

  test("table constructors, nesting, dot assignment, arithmetic") {
    val env = run(
      """x = { name = "m", counter = { value = 1.0 } }
        |x.counter.value = x.counter.value + 1
        |n = 7 % 3
        |s = "a" .. "-" .. 2
        |""".stripMargin)
    val x = env.get("x").asInstanceOf[Table]
    assert(x("name") == "m")
    assert(x("counter").asInstanceOf[Table]("value") == 2.0)
    assert(env.get("n") == 1L)
    assert(env.get("s") == "a-2")
  }

  test("functions, emit callbacks, if/elseif/else, locals, return") {
    val emitted = List.newBuilder[Any]
    val emit: Function1[Any, Any] = { v => emitted += v; null }
    val env = run(
      """function classify(n)
        |  if n > 10 then return "big"
        |  elseif n > 1 then return "mid"
        |  else return "small" end
        |end
        |function process(event, emit)
        |  local label = classify(event.n)
        |  event.label = label
        |  emit(event)
        |  if event.n > 1 then emit(event) end
        |end
        |""".stripMargin)
    val t = table(); t("n") = 5L
    val local = new Env(Some(env))
    local.declare("e", t); local.declare("emitfn", emit)
    exec(parse("process(e, emitfn)"), local)
    assert(t("label") == "mid")
    assert(emitted.result().size == 2)
  }

  test("comparison, and/or/not, tostring/tonumber/type builtins") {
    val env = run(
      """a = 1 < 2 and "yes" or "no"
        |b = not (3 == 3.0)
        |c = tostring(nil) .. "/" .. type({})
        |d = tonumber("4") + 1
        |""".stripMargin)
    assert(env.get("a") == "yes")
    assert(env.get("b") == false)
    assert(env.get("c") == "nil/table")
    assert(env.get("d") == 5.0)
  }

  test("unsupported syntax fails with a clear error, not silence") {
    val e = intercept[LuaError](parse("for i = 1, 10 do end"))
    assert(e.getMessage.contains("lua parse error"))
  }
}

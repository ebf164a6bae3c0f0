package graft

/** `vector test`-style CLI (reference src/unit_test.rs entry point):
  * run behavior/unit-test YAML files against the config loader and
  * report per-test pass/fail. Exit 1 on any failure.
  *
  * Usage: graft.VectorTest <behavior1.yaml> [behavior2.yaml ...]
  */
object VectorTest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.VectorTest <behavior.yaml>...")
    sys.env.get("SPARK_GRAFT_BEHAVIOR_ROOT").foreach(
      graft.plans.ConfigLoader.behaviorRoot = _)
    val spark = Graft.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    var failures = 0
    args.foreach { path =>
      val yaml = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      // self-reporting coverage: behavior files whose transforms are lua
      // programs (tests/behavior/transforms/lua_v*.yaml) are out of
      // scope BY DESIGN (a Scala lambda stands in for the Lua runtime,
      // operators/Misc.scala) — list them as explicit skips, not silence
      val conf = graft.plans.ConfigLoader.parseYaml(yaml)
      val usesLua = conf.get("transforms").exists {
        case m: java.util.Map[_, _] =>
          m.values().toArray.exists {
            case t: java.util.Map[_, _] => t.get("type") == "lua"
            case _ => false
          }
        case _ => false
      }
      if (usesLua) println(s"skip $path :: unsupported: lua")
      else {
        val results = graft.plans.ConfigLoader.runBehavior(spark, yaml)
        results.foreach { r =>
          if (r.passed) println(s"ok   $path :: ${r.name}")
          else {
            failures += 1
            println(s"FAIL $path :: ${r.name}")
            r.failures.foreach(f => println(s"     $f"))
          }
        }
      }
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

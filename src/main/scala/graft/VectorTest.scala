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
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

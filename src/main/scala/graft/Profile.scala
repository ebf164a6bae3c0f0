package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: time named queries (3 runs each) at a given SF dir.
  * Usage: runMain graft.Profile <sfDir> <query...>   (not part of the
  * driver contract — local iteration tool only).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CLEARCACHE: drop all cached relations before each rep —
    // matches the bench's honest best-of-2 (persist-family queries would
    // otherwise read live caches on reps 2-3). Optional rep count via
    // SPARK_GRAFT_PROFILE_REPS (default 3).
    val clear = sys.env.contains("SPARK_GRAFT_CLEARCACHE")
    val reps = sys.env.get("SPARK_GRAFT_PROFILE_REPS").map(_.toInt).getOrElse(3)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        if (clear) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-24s ${ts.map(t => f"$t%6.2f").mkString(" ")}  min=${ts.min}%6.2f")
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 400L).map(i =>
    (i, if (i % 2 == 0) "web" else "books")).toDF("id", "src")

  test("stratified: fractions land near target per stratum, others drop") {
    val out = Sample.stratified(df, $"src", $"id",
      Map("web" -> 0.5, "books" -> 1.0))
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("books") == 200L) // fraction 1.0 keeps everything
    // 200 candidates at f=0.5 — md5 buckets are uniform, expect 100±35
    assert(bySrc("web") > 65 && bySrc("web") < 135)
    assert(out.filter(!$"src".isin("web", "books")).count() == 0)
    val rates = out.select("src", "sample_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates == Map("web" -> 0.5, "books" -> 1.0))
  }

  test("stratified: raising a fraction only adds rows (monotone subsets)") {
    def kept(f: Double): Set[Long] =
      Sample.stratified(df, $"src", $"id", Map("web" -> f, "books" -> f))
        .select("id").as[Long].collect().toSet
    val k25 = kept(0.25); val k50 = kept(0.5); val k100 = kept(1.0)
    assert(k25.subsetOf(k50) && k50.subsetOf(k100))
    assert(k100.size == 400)
    assert(k25.nonEmpty && k25.size < k50.size)
  }

  private def tokDf = (1L to 100L).map(i =>
    (i, if (i % 2 == 0) "web" else "books", 10L + (i % 7)))
    .toDF("id", "src", "n_tokens")

  test("tokenBudget: strict prefix fit per stratum, others drop") {
    val out = Sample.tokenBudget(tokDf, $"src", $"id", $"n_tokens",
      Map("web" -> 100L, "books" -> 1000000L))
    val bySrc = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(bySrc("books") == 50L) // huge budget keeps the stratum
    // web: ~13 tokens/doc, 100-token budget -> 7-8 docs, never over
    val webCum = out.filter($"src" === "web")
      .agg(max($"cum_tokens")).as[Long].head()
    assert(webCum <= 100L && bySrc("web") >= 6L && bySrc("web") <= 9L)
    assert(out.filter(!$"src".isin("web", "books")).count() == 0)
  }

  test("tokenBudget: raising a budget only appends docs (monotone prefix)") {
    def kept(b: Long): Set[Long] =
      Sample.tokenBudget(tokDf, $"src", $"id", $"n_tokens",
        Map("web" -> b, "books" -> b)).select("id").as[Long].collect().toSet
    val k100 = kept(100L); val k200 = kept(200L); val kAll = kept(100000L)
    assert(k100.subsetOf(k200) && k200.subsetOf(kAll))
    assert(k100.nonEmpty && k100.size < k200.size && kAll.size == 100)
  }

  test("dynamic: per-event ratio/rate with string sample_rate label") {
    // transform.rs DynamicSampleFields: ratio wins over rate; invalid
    // values fall back to the static rate; the stamped label is the
    // effective rate AS A STRING (sample_rate_label)
    val df = spark.range(2000).toDF("id")
      .withColumn("r", when($"id" < 1000, 1.0).otherwise(0.0)) // 0.0 invalid
      .withColumn("n", when($"id" % 2 === 0, 1L).otherwise(0L)) // 0 invalid
    // ratio=1.0 keeps everything in the first half regardless of rate
    val out = Sample.dynamic(df, $"id", Some("r"), Some("n"), staticRate = 1)
      .select($"id", $"sample_rate").as[(Long, String)].collect()
    val byId = out.toMap
    assert((0L until 1000L).forall(byId.get(_).contains("1.0")))
    // second half: invalid ratio -> rate field (1 keeps, 0 invalid ->
    // static rate 1 keeps); labels reflect which applied
    assert(byId.view.filterKeys(_ >= 1000L).values.toSet == Set("1"))
    assert(out.length == 2000)
    // empty sample_rate_key disables the stamp
    val noKey = Sample.dynamic(df, $"id", Some("r"), None, 1,
      sampleRateKey = None)
    assert(!noKey.columns.contains("sample_rate"))
  }

  test("dynamic: rate_field draws ~1/rate deterministically") {
    val df = spark.range(10000).toDF("id").withColumn("rt", lit(10L))
    val kept = Sample.dynamic(df, $"id", None, Some("rt"), staticRate = 2)
      .count()
    assert(kept > 700 && kept < 1300, kept) // ~1000 expected
    // deterministic: same inputs, same kept set
    val again = Sample.dynamic(df, $"id", None, Some("rt"), staticRate = 2)
      .count()
    assert(kept == again)
  }
}

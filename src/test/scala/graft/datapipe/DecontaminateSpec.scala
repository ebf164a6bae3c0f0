package graft.datapipe

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely unrelated text with no overlap whatsoever in any gram here"),
    (3L, "short doc"),
    (4L, "the quick brown fox jumps over the lazy dog but diverges at the end"))
    .toDF("doc_id", "text")
  // benchmark shares doc 1/4's 8-gram prefix; doc 3 is sub-n and only
  // matches if its WHOLE text appears (it doesn't)
  private val bench = Seq(
    "the quick brown fox jumps over the lazy dog",
    "some eval question about physics").toDF("text")

  test("overlap counts distinct benchmark-gram hits per doc") {
    val out = Decontaminate.overlap(corpus, "doc_id", col("text"),
        bench, col("text"), n = 8)
      .orderBy("doc").collect()
    val byDoc = out.map(r => r.getLong(0) -> r).toMap
    assert(byDoc(1L).getAs[Long]("n_hit") == 2) // grams at offsets 0 and 1
    assert(byDoc(1L).getAs[Int]("contaminated") == 1)
    assert(byDoc(2L).getAs[Long]("n_hit") == 0)
    assert(byDoc(3L).getAs[Long]("n_hit") == 0) // whole-doc shingle, no match
    assert(byDoc(4L).getAs[Long]("n_hit") == 2) // shared prefix grams
    // 14 tokens, n=8 -> 7 shingles, all distinct
    assert(byDoc(4L).getAs[Long]("n_grams") == 7)
  }

  test("clean drops contaminated docs and keeps audit stats") {
    val out = Decontaminate.clean(corpus, "doc_id", col("text"),
      bench, col("text"), n = 8)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(out.columns.contains("n_grams") && out.columns.contains("n_hit"))
  }

  test("a sub-n benchmark doc matches whole-doc shingles exactly") {
    val b2 = Seq("short doc").toDF("text")
    val out = Decontaminate.overlap(corpus, "doc_id", col("text"),
        b2, col("text"), n = 8)
      .filter(col("doc") === 3L).collect()
    assert(out.head.getAs[Long]("n_hit") == 1)
  }
}

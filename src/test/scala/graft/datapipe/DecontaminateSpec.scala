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

  test("exactConfirm rescues docs flagged only by hash collisions") {
    // force the worst case: a constant gram hash collides EVERY corpus
    // gram with every benchmark gram, so the hash-only pass flags all
    // four docs; the exact string pass must clear docs 2 and 3 while
    // keeping the true overlaps (1 and 4) flagged with exact counts
    val collideAll: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _ => lit(0L)
    val hashedOnly = Decontaminate.overlapImpl(corpus, "doc_id",
      col("text"), bench, col("text"), n = 8, maxHitRatio = 0.0,
      exactConfirm = false, gramHash = collideAll)
    assert(hashedOnly.filter(col("contaminated") === 1).count() == 4)
    val confirmed = Decontaminate.overlapImpl(corpus, "doc_id",
      col("text"), bench, col("text"), n = 8, maxHitRatio = 0.0,
      exactConfirm = true, gramHash = collideAll)
      .orderBy("doc").collect()
    val byDoc = confirmed.map(r => r.getLong(0) -> r).toMap
    assert(byDoc(1L).getAs[Int]("contaminated") == 1)
    assert(byDoc(1L).getAs[Long]("n_hit") == 2) // exact recount, not n_grams
    assert(byDoc(2L).getAs[Int]("contaminated") == 0)
    assert(byDoc(2L).getAs[Long]("n_hit") == 0)
    assert(byDoc(3L).getAs[Int]("contaminated") == 0)
    assert(byDoc(4L).getAs[Int]("contaminated") == 1)
    assert(byDoc(4L).getAs[Long]("n_hit") == 2)
    // the DENOMINATOR is recounted from distinct gram STRINGS too: the
    // hash-pass n_grams collapsed to 1 under the forced collision, and
    // dividing the exact n_hit by it read hit_ratio = 2.0 (> 1). Doc 1
    // has 12 tokens -> 5 distinct 8-gram strings, doc 4 has 14 -> 7.
    assert(byDoc(1L).getAs[Long]("n_grams") == 5)
    assert(byDoc(1L).getAs[Double]("hit_ratio") == 0.4)
    assert(byDoc(4L).getAs[Long]("n_grams") == 7)
    assert(byDoc(4L).getAs[Double]("hit_ratio") == 0.2857)
  }

  test("exactConfirm with the real hash changes nothing at this scale") {
    val base = Decontaminate.overlap(corpus, "doc_id", col("text"),
      bench, col("text"), n = 8).orderBy("doc").collect().toSeq
    val conf = Decontaminate.overlap(corpus, "doc_id", col("text"),
      bench, col("text"), n = 8, exactConfirm = true)
      .select("doc", "n_grams", "n_hit", "hit_ratio", "contaminated")
      .orderBy("doc").collect().toSeq
    assert(base.map(_.toString) == conf.map(_.toString))
  }

  test("a sub-n benchmark doc matches whole-doc shingles exactly") {
    val b2 = Seq("short doc").toDF("text")
    val out = Decontaminate.overlap(corpus, "doc_id", col("text"),
        b2, col("text"), n = 8)
      .filter(col("doc") === 3L).collect()
    assert(out.head.getAs[Long]("n_hit") == 1)
  }
}

package graft.datapipe

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gopher Table-A1 rules + C4 cleaning (published heuristics) on
  * hand-built edge cases — the oracle queries cover the distributional
  * behavior, this covers the boundary semantics.
  */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopher: a clean English paragraph passes, word soup fails") {
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "runs off to the woods with a bone that it found to have " +
      "buried there of late and be glad about it every day since " +
      "morning while the sun rises over the quiet field and the " +
      "birds sing softly in the trees near the old wooden fence") // 57 words
    val bad = "x y z" // 3 words, no stopword pair, too short
    val df = QualityRules.gopherMetrics(
      Seq((1, good), (2, bad)).toDF("id", "text"), col("text"))
    val rows = df.collect().map(r =>
      r.getAs[Int]("id") -> r.getAs[Boolean]("gopher_pass")).toMap
    assert(rows(1))
    assert(!rows(2))
    val m = df.filter(col("id") === 1).head()
    assert(m.getAs[Int]("n_words") == 57)
    assert(m.getAs[Int]("stopword_hits") >= 5)
    assert(m.getAs[Double]("alpha_ratio") == 1.0)
  }

  test("gopher: bullet and ellipsis line ratios catch listicle pages") {
    val listicle = (1 to 10).map(i => s"- item number $i here").mkString("\n")
    val m = QualityRules.gopherMetrics(
      Seq((1, listicle)).toDF("id", "text"), col("text")).head()
    assert(m.getAs[Double]("bullet_ratio") == 1.0)
    assert(!m.getAs[Boolean]("gopher_pass"))
    val trailing = "looking good so far...\nand then it just...\nok."
    val m2 = QualityRules.gopherMetrics(
      Seq((1, trailing)).toDF("id", "text"), col("text")).head()
    assert(m2.getAs[Double]("ellipsis_ratio") == 0.666667)
  }

  test("gopher: symbol ratio counts hashes and ellipses per word") {
    val m = QualityRules.gopherMetrics(
      Seq((1, "alpha # beta ... gamma #### delta")).toDF("id", "text"),
      col("text")).head()
    // 7 tokens ('#', '...', '####' count as tokens); 5 hashes + 1 ellipsis
    assert(m.getAs[Int]("n_words") == 7)
    assert(m.getAs[Double]("symbol_ratio") == 0.857143)
  }

  test("c4: keeps punctuated >=5-word lines, drops the rest") {
    val text = Seq(
      "This line has enough words and ends well.",
      "Too short.",
      "this one has plenty of words but no terminal punctuation",
      "Another good line with five words.").mkString("\n")
    val out = QualityRules.c4Metrics(
      Seq((1, text)).toDF("id", "text"), col("text")).head()
    assert(out.getAs[String]("clean_text") == Seq(
      "This line has enough words and ends well.",
      "Another good line with five words.").mkString("\n"))
    assert(out.getAs[Int]("n_sentences") == 2)
    assert(!out.getAs[Boolean]("c4_pass")) // < 3 sentences
  }

  test("c4: brace pages and lorem ipsum are dropped at doc level") {
    val brace = "A perfectly fine sentence with many words { code }.\n" +
      "Another fine sentence right here today.\n" +
      "And one more to clear the bar."
    val lorem = "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n" +
      "Sed do eiusmod tempor incididunt ut labore et.\n" +
      "Ut enim ad minim veniam quis nostrud."
    val df = QualityRules.c4Metrics(
      Seq((1, brace), (2, lorem)).toDF("id", "text"), col("text"))
    val rows = df.collect().map(r =>
      r.getAs[Int]("id") -> r.getAs[Boolean]("c4_pass")).toMap
    assert(!rows(1)) // brace
    assert(!rows(2)) // lorem ipsum marker
  }

  test("c4: empty cleaned text fails without NULL poisoning") {
    val out = QualityRules.c4Metrics(
      Seq((1, "no punctuation anywhere at all")).toDF("id", "text"),
      col("text")).head()
    assert(out.getAs[String]("clean_text") == "")
    assert(out.getAs[Int]("n_sentences") == 0)
    assert(!out.getAs[Boolean]("c4_pass"))
  }
}

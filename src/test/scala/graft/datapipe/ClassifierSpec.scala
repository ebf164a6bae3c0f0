package graft.datapipe

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable two-class corpus: "fish" vocabulary vs "bird" vocabulary,
  // with one shared filler token
  private lazy val train = Seq(
    (1L, "trout salmon gill fin the", "fish"),
    (2L, "salmon fin scale trout the", "fish"),
    (3L, "gill scale salmon fin the", "fish"),
    (4L, "wing beak feather sparrow the", "bird"),
    (5L, "sparrow feather wing beak the", "bird"),
    (6L, "beak wing sparrow feather the", "bird")
  ).toDF("doc_id", "text", "lang")

  test("naive bayes separates held-out docs by vocabulary") {
    val test = Seq(
      (10L, "trout gill fin"),
      (11L, "feather beak wing"),
      (12L, "salmon salmon the")
    ).toDF("doc_id", "text")
    val pred = Classifier.naiveBayes(train, test, "doc_id",
        $"text", $"lang", vocabSize = 100)
      .select($"doc_id", $"pred").as[(Long, String)].collect().toMap
    assert(pred == Map(10L -> "fish", 11L -> "bird", 12L -> "fish"))
  }

  test("unknown-only docs drop out; scores are finite and negative") {
    val test = Seq(
      (20L, "quantum flux capacitor"), // fully out-of-vocabulary
      (21L, "trout beak the")          // mixed -> still scored
    ).toDF("doc_id", "text")
    val out = Classifier.naiveBayes(train, test, "doc_id",
        $"text", $"lang", vocabSize = 100)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    assert(!out.contains(20L))
    assert(out(21L) < 0.0 && !out(21L).isNaN)
  }

  test("bigram perplexity: in-distribution text scores lower than scrambled") {
    // train: a tiny corpus with STRONG bigram structure (a->b always)
    val lmTrain = Seq.tabulate(8)(i =>
      (i.toLong, "the cat sat on the mat and the cat ran"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val lmTest = Seq(
      (100L, "the cat sat on the mat"),  // in-distribution bigrams
      (101L, "mat the on sat cat the")   // same tokens, broken bigrams
    ).toDF("doc_id", "text")
    val out = Classifier.bigramPerplexity(lmTrain, lmTest, "doc_id",
        $"text", vocabSize = 100)
      .select($"doc_id", $"ppl").as[(Long, Double)].collect().toMap
    assert(out(100L) < out(101L),
      s"natural ${out(100L)} should beat scrambled ${out(101L)}")
  }

  test("bigram perplexity is deterministic and bounded") {
    val lmTrain = Seq((1L, "a b a b a b"), (2L, "a b c a b c"))
      .toDF("doc_id", "text")
    val lmTest = Seq((10L, "a b c"), (11L, "c b a")).toDF("doc_id", "text")
    val a = Classifier.bigramPerplexity(lmTrain, lmTest, "doc_id", $"text", 10)
      .orderBy($"doc_id").collect().toSeq
    val b = Classifier.bigramPerplexity(lmTrain.repartition(3),
        lmTest.repartition(2), "doc_id", $"text", 10)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    a.foreach { r =>
      val ppl = r.getAs[Double]("ppl")
      assert(ppl > 1.0 && ppl.isFinite)
    }
  }

  test("DSIR weights rank target-like docs above off-domain docs") {
    val raw = Seq(
      (1L, "trout salmon gill fin trout salmon"),
      (2L, "wing beak feather sparrow wing beak"),
      (3L, "trout salmon gill fin gill fin")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "trout salmon gill fin scale trout salmon gill"))
      .toDF("doc_id", "text")
    val w = Classifier.importanceWeights(raw, target, "doc_id",
        $"text", buckets = 256)
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().toMap
    assert(w(1L) > w(2L) && w(3L) > w(2L),
      s"fish docs should outrank the bird doc: $w")
    // deterministic across partitionings (decimal-sum associativity)
    val w2 = Classifier.importanceWeights(raw.repartition(5), target,
        "doc_id", $"text", buckets = 256)
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().toMap
    assert(w == w2)
  }

  test("deterministic across input partitionings") {
    val test = Seq((10L, "trout gill fin"), (11L, "feather beak wing"))
      .toDF("doc_id", "text")
    val a = Classifier.naiveBayes(train, test, "doc_id", $"text", $"lang", 100)
      .orderBy($"doc_id").collect().toSeq
    val b = Classifier.naiveBayes(train.repartition(5), test.repartition(3),
        "doc_id", $"text", $"lang", 100)
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
  }
}

package graft.datapipe

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact duplicated-span removal (Lee et al. 2021 style) and GPT-style
  * sequence packing — boundary semantics on hand-built corpora.
  */
class SpanPackSpec extends SparkSpec {
  import spark.implicits._

  test("span removal: canonical first occurrence survives, copies cut") {
    // doc 1 holds the canonical 8-token run; doc 2 repeats it verbatim
    // inside other text; doc 3 is untouched
    val run = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$run and then something else entirely here now"),
      (2L, s"prefix words go here $run suffix words trail after this"),
      (3L, "totally unrelated content with no duplicate windows at all")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", col("text"), 8)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text"))).toMap
    assert(out(1L)._1 == 0L)
    assert(out(1L)._2.startsWith(run))
    assert(out(2L)._1 == 8L)
    assert(out(2L)._2 == "prefix words go here suffix words trail after this")
    assert(out(3L)._1 == 0L)
  }

  test("span removal: overlapping duplicate windows merge to one span") {
    // doc 2 repeats a 10-token run -> three overlapping 8-token dup
    // windows (stride 1) that must merge into ONE 10-token excision
    val run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      (1L, s"$run filler other tokens beyond"),
      (2L, s"lead $run tail")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", col("text"), 8)
      .filter(col("doc") === 2L).head()
    assert(out.getAs[Long]("n_spans_removed") == 1L)
    assert(out.getAs[Long]("n_removed") == 10L)
    assert(out.getAs[String]("cleaned_text") == "lead tail")
  }

  test("span removal: within-doc repetition also dedups (keep first)") {
    val run = "x1 x2 x3 x4 x5 x6 x7 x8"
    val docs = Seq((1L, s"$run middle bit $run")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", col("text"), 8).head()
    assert(out.getAs[Long]("n_removed") == 8L)
    assert(out.getAs[String]("cleaned_text") == s"$run middle bit")
  }

  test("packing: offsets are a gapless cover of the token stream") {
    val docs = (1L to 100L).map(i => (i, (i % 17 + 1).toInt))
      .toDF("doc_id", "n_toks")
    val packed = Packing.pack(docs, col("doc_id"), col("n_toks"),
      seqLen = 32, buckets = 8).cache()
    // exclusive prefix property: sorting by offset, each doc starts
    // exactly where the previous one (plus separator) ended
    val rows = packed.orderBy("offset")
      .select("offset", "n_toks").collect()
    var expect = 0L
    rows.foreach { r =>
      assert(r.getLong(0) == expect, s"gap at offset ${r.getLong(0)}")
      expect = r.getLong(0) + r.getInt(1) + 1
    }
    // spanning docs: last_seq/first_seq consistent with offset math
    packed.collect().foreach { r =>
      val off = r.getAs[Long]("offset")
      val n = r.getAs[Int]("n_toks")
      assert(r.getAs[Long]("first_seq") == off / 32)
      assert(r.getAs[Long]("last_seq") == (off + n - 1) / 32)
      assert(r.getAs[Long]("offset_in_seq") == off % 32)
    }
    // and the epoch size matches the stream length
    assert(Packing.sequenceCount(docs, col("n_toks"), 32) ==
      (expect + 31) / 32)
  }

  test("temperatureMix: alpha<1 up-weights small sources; budget holds") {
    import graft.operators.Sample
    // heavily skewed: 9000 web docs vs 100 code docs
    val docs = ((1L to 9000L).map(i => (i, "web")) ++
      (9001L to 9100L).map(i => (i, "code"))).toDF("doc_id", "source")
    val kept = Sample.temperatureMix(docs, col("source"), col("doc_id"),
      budgetFraction = 0.1, alpha = 0.5)
    val rates = kept.groupBy("source")
      .agg(first(col("sample_rate")).as("r"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    // proportional sampling would keep 10% of each; sqrt weighting must
    // sample code at ~10x the rate of web
    assert(rates("code")._1 > rates("web")._1 * 5,
      s"no up-weighting: $rates")
    // realized totals near the budget (910 docs), hash noise aside
    val total = rates.values.map(_._2).sum
    assert(total > 700 && total < 1100, s"budget off: $total")
    // determinism: same fractions on a different partitioning
    val again = Sample.temperatureMix(docs.repartition(7), col("source"),
      col("doc_id"), 0.1, 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("packing: deterministic across input partitionings") {
    val docs = (1L to 200L).map(i => (i, (i % 13 + 1).toInt))
      .toDF("doc_id", "n_toks")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.pack(df, col("doc_id"), col("n_toks"), 64, buckets = 4)
        .select("doc_id", "offset").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }
}

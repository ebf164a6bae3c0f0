package graft.datapipe

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a completely different sentence with other words entirely"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "short doc"),
    (6L, "short doc")
  ).toDF("doc_id", "text")

  test("prefix-filtered ngram join produces the same pairs as the direct join") {
    val direct = Dedup.ngramJaccard(docs, "doc_id", $"text",
        shingleN = 3, threshold = 0.3)
      .orderBy($"id_a", $"id_b")
      .collect().toSeq
    val prefixed = Dedup.ngramJaccardPrefix(docs, "doc_id", $"text",
        shingleN = 3, threshold = 0.3)
      .orderBy($"id_a", $"id_b")
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(direct == prefixed)
  }

  test("exact dedupe reports later duplicates with their first id") {
    val dups = Dedup.exact(docs, "doc_id", $"text")
      .select($"doc_id", $"dup_of").as[(Long, Long)]
      .collect().toMap
    assert(dups == Map(4L -> 1L, 6L -> 5L))
  }

  test("minhash signatures are identical for identical docs") {
    val sigs = Dedup.minhashSignatures(
        docs.select($"doc_id".as("doc"),
          Dedup.shingles($"text", 3).as("sh")), 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
  }
}

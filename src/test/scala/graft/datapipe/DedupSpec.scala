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
    // the auto switch: direct pair-count below the size threshold,
    // prefix-filtered above it (statistics-only decision — range(N)
    // carries an exact rowCount estimate), identical pairs either way
    assert(!Dedup.usePrefixNgram(docs))
    // 8x the threshold: without CBO the projected-range estimate is
    // sizeInBytes-derived (approximate), so give it margin — the knob
    // protects order-of-magnitude regimes, not an exact row count
    assert(Dedup.usePrefixNgram(
      spark.range(Dedup.DefaultNgramPrefixRows * 8)
        .select(col("id").as("doc_id"), lit("a b c").as("text"))))
    val auto = Dedup.ngramJaccardAuto(docs, "doc_id", $"text",
        shingleN = 3, threshold = 0.3)
      .orderBy($"id_a", $"id_b")
      .collect().toSeq
    assert(auto == direct)
    // forced-prefix leg at a tiny switch threshold: the flip changes the
    // plan, never the rows
    val forcedPrefix = Dedup.ngramJaccardAuto(docs, "doc_id", $"text",
        shingleN = 3, threshold = 0.3, switchRows = 1L)
      .orderBy($"id_a", $"id_b")
      .collect().toSeq
    assert(forcedPrefix == direct)
  }

  test("exact dedupe reports later duplicates with their first id") {
    val dups = Dedup.exact(docs, "doc_id", $"text")
      .select($"doc_id", $"dup_of").as[(Long, Long)]
      .collect().toMap
    assert(dups == Map(4L -> 1L, 6L -> 5L))
  }

  test("exactDups is narrow: the window never sees the text column") {
    val narrow = Dedup.exactDups(docs, "doc_id", $"text")
    assert(narrow.as[(Long, Long)].collect().toMap == Map(4L -> 1L, 6L -> 5L))
    assert(narrow.columns.toSeq == Seq("doc_id", "dup_of"))
    // the md5-partitioned window (the stage's one shuffle) must operate
    // over (id, digest) only — document text entering that exchange was
    // the r15 form's per-stage corpus-text shuffle
    val windows = narrow.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val names = w.child.output.map(_.name).toSet
      assert(!names.contains("text"), s"window input carries text: $names")
    }
    // dropAnti: strategy-only helper, same rows as a plain left_anti
    val kept = Dedup.dropAnti(docs, narrow.select($"doc_id"), "doc_id")
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L))
  }

  test("connected components: chains collapse, singletons survive") {
    // 1-2-3-4-5-6-7-8 chain (worst case for plain propagation: forces
    // the pointer-jump path), a 10-11 pair, and 20/21 singletons
    val nodes = (1L to 8L).toSeq ++ Seq(10L, 11L, 20L, 21L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L))
    val comp = Dedup.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 8L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 21L)
  }

  test("connected components: reliable-checkpoint path (chain graph)") {
    // same chain graph through sparkContext checkpointing — the mode a
    // real cluster runs (survives executor loss, unlike localCheckpoint).
    // driverEdges = 0 forces the DISTRIBUTED loop: with the small-graph
    // fast path on (the default) every test-sized graph would short-
    // circuit to the driver union-find and the loop would lose coverage.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    val nodes = (1L to 8L).toSeq ++ Seq(10L, 11L)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L))
    val comp = Dedup.connectedComponents(
        nodes.toDF("id"), edges.toDF("id_a", "id_b"),
        checkpointDir = Some(dir), driverEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert((1L to 8L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("connected components: fast path == distributed loop") {
    // chain + clique + singletons, fast path (default cap) vs the loop
    // (driverEdges = 0) — identical labels row for row
    val nodes = ((1L to 8L) ++ Seq(10L, 11L, 20L, 30L, 31L, 32L)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L), (30L, 31L), (31L, 32L), (30L, 32L))
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().sorted.toSeq
    val loop = Dedup.connectedComponents(nodes, edges, driverEdges = 0)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(fast == loop)
    // the cap boundary: a graph just OVER driverEdges still routes to
    // the loop (probe length = cap + 1)
    val overCap = Dedup.connectedComponents(nodes, edges, driverEdges = 2)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(overCap == loop)
  }

  test("nearDupDrops == cc(touched).filter(id =!= comp), both paths") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L), (7L, 7L))
      .toDF("id_a", "id_b")
    val expect = Seq(2L, 3L, 11L)
    val fast = Dedup.nearDupDrops(pairs, "doc_id")
    assert(fast.columns.toSeq == Seq("doc_id"))
    assert(fast.as[Long].collect().sorted.toSeq == expect)
    // over-cap fallback: distributed formulation, same set
    val loop = Dedup.nearDupDrops(pairs, "doc_id", driverEdges = 2)
    assert(loop.as[Long].collect().sorted.toSeq == expect)
  }

  test("connected components: reversed/duplicated edges are harmless") {
    val comp = Dedup.connectedComponents(
        Seq(1L, 2L, 3L).toDF("id"),
        Seq((3L, 2L), (2L, 3L), (2L, 1L)).toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("minhash signatures are identical for identical docs") {
    val sigs = Dedup.minhashSignatures(
        docs.select($"doc_id".as("doc"),
          Dedup.shingles($"text", 3).as("sh")), 12)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhashLshSliced == minhashLsh (identical pairs, any slice count)") {
    val one = Dedup.minhashLsh(docs, "doc_id", $"text",
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3)
      .collect().map(_.toString).sorted.toSeq
    val dir = java.nio.file.Files.createTempDirectory("lsh-slices").toString
    val sliced = Dedup.minhashLshSliced(docs, "doc_id", $"text",
        sliceDir = dir, slices = 3,
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3)
      .collect().map(_.toString).sorted.toSeq
    assert(sliced == one)
    assert(sliced.nonEmpty) // the fixture has near-dups; prove non-vacuous
  }

  test("minhashLsh maxBucket: hot buckets bounded, cool pairs intact, " +
      "default unchanged") {
    // 30 identical docs form one hot bucket in EVERY band; docs 101/102
    // are near-dups of each other in their own (cool) buckets
    val hot = (1L to 30L).map(i => (i, "same boilerplate text repeated " +
      "for every page of the crawl exactly alike"))
    val cool = Seq(
      (101L, "the quick brown fox jumps over the lazy dog tonight"),
      (102L, "the quick brown fox jumps over the lazy dog today"))
    val corpus = (hot ++ cool).toDF("doc_id", "text")
    val unbounded = Dedup.minhashLsh(corpus, "doc_id", $"text",
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 30*29/2 hot pairs + the cool pair
    assert(unbounded.contains((101L, 102L)))
    assert(unbounded.count(p => p._1 <= 30 && p._2 <= 30) == 30 * 29 / 2)

    val capped = Dedup.minhashLsh(corpus, "doc_id", $"text",
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3,
        maxBucket = 5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cool pair survives the cap untouched
    assert(capped.contains((101L, 102L)))
    // hot-bucket fan-out bounded: only pairs among the 5 lowest ids
    // (the same 5 in every band since all bands share the signature)
    val hotPairs = capped.filter(p => p._1 <= 30 && p._2 <= 30)
    assert(hotPairs == (for { a <- 1L to 5L; b <- (a + 1) to 5L }
      yield (a, b)).toSet)

    // maxBucket = 0 (default) is byte-for-byte the unbounded output
    val default = Dedup.minhashLsh(corpus, "doc_id", $"text",
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == unbounded)

    // maxBucket = -1 (auto): cap = max(50, ceil(sqrt(32))) = 50 — above
    // every bucket here, so the output equals the unbounded run (the
    // auto mode only bites once a bucket outgrows √N-scale)
    val auto = Dedup.minhashLsh(corpus, "doc_id", $"text",
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.3,
        maxBucket = -1)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == unbounded)
  }

  test("minhashLsh fatIndex knob: strategy only, identical pairs, " +
      "no job at construction") {
    // fatIndex decides the verify-join hint WITHOUT the auto count —
    // both settings must emit exactly the default's pairs
    def pairs(fat: Option[Boolean]) =
      Dedup.minhashLsh(docs, "doc_id", $"text", shingleN = 3,
          numHashes = 12, bands = 3, threshold = 0.3, fatIndex = fat)
        .select($"id_a", $"id_b", $"jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val auto = pairs(None)
    assert(pairs(Some(false)) == auto)
    assert(pairs(Some(true)) == auto)
    // with the knob set, merely constructing the DataFrame must not
    // run a Spark job (the auto mode's count was measured as one full
    // extra pass per call); jobs are observable via the status tracker
    spark.sparkContext.setJobGroup("fatidx-probe", "construction probe")
    val before = spark.sparkContext.statusTracker
      .getJobIdsForGroup("fatidx-probe").length
    Dedup.minhashLsh(docs, "doc_id", $"text", fatIndex = Some(false))
    // r16: auto mode reads plan statistics instead of counting, so the
    // UNSET knob must be job-free at construction too
    Dedup.minhashLsh(docs, "doc_id", $"text", fatIndex = None)
    val after = spark.sparkContext.statusTracker
      .getJobIdsForGroup("fatidx-probe").length
    spark.sparkContext.clearJobGroup()
    assert(after == before, "construction with fatIndex set ran a job")
  }

  test("estimatedRows tracks the planner's statistics without a job") {
    // small literal frame: the optimizer knows the exact row count (or
    // a size-derived estimate); either way the call runs zero jobs and
    // returns a positive figure in the right ballpark
    spark.sparkContext.setJobGroup("est-probe", "stats probe")
    val before = spark.sparkContext.statusTracker
      .getJobIdsForGroup("est-probe").length
    val est = Dedup.estimatedRows(docs.toDF())
    val after = spark.sparkContext.statusTracker
      .getJobIdsForGroup("est-probe").length
    spark.sparkContext.clearJobGroup()
    assert(after == before, "estimatedRows ran a job")
    assert(est > 0)
  }
}

package graft.datapipe

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + one outlier pair:
  // ids 1-3 near e1, ids 4-6 near e2, ids 7-8 identical near e3
  private def v(xs: Double*): Seq[Double] = xs
  private lazy val emb = Seq(
    (1L, v(1.0, 0.1, 0.0, 0.0)),
    (2L, v(0.9, 0.2, 0.0, 0.0)),
    (3L, v(1.1, 0.0, 0.1, 0.0)),
    (4L, v(0.0, 1.0, 0.1, 0.0)),
    (5L, v(0.1, 0.9, 0.0, 0.0)),
    (6L, v(0.0, 1.1, 0.2, 0.0)),
    (7L, v(0.0, 0.0, 1.0, 0.0)),
    (8L, v(0.0, 0.0, 1.0, 0.0))
  ).toDF("vec_id", "embedding")

  test("kmeans: clusters separate, centroids are member means, determinism") {
    val cents = Ann.kmeans(emb, "vec_id", "embedding", k = 3, iters = 3)
    assert(cents.map(_._1) == cents.map(_._1).sorted)
    val assign = emb.select($"vec_id",
        Ann.ivfAssign(Ann.asDouble($"embedding"), cents).as("cell"))
      .as[(Long, Long)].collect().toMap
    // each natural cluster lands in one cell, clusters in distinct cells
    assert(Set(assign(1L), assign(2L), assign(3L)).size == 1)
    assert(Set(assign(4L), assign(5L), assign(6L)).size == 1)
    assert(Set(assign(7L), assign(8L)).size == 1)
    assert(Set(assign(1L), assign(4L), assign(7L)).size == 3)
    // centroid of the identical pair is the vector itself (6-dp rounded)
    val c7 = cents.find(_._1 == assign(7L)).get._2
    assert(c7 == Seq(0.0, 0.0, 1.0, 0.0))
    // deterministic across input partitionings
    val cents2 = Ann.kmeans(emb.repartition(7), "vec_id", "embedding", 3, 3)
    assert(cents == cents2)
  }

  test("semanticDedup keeps the min-id member of each near-identical group") {
    val cents = Ann.kmeans(emb, "vec_id", "embedding", k = 3, iters = 3)
    val kept = Ann.semanticDedup(emb, "vec_id", "embedding", cents,
        threshold = 0.995)
      .select($"doc").as[Long].collect().toSet
    // 7/8 identical -> 8 dropped; cos(4,6) ≈ 0.9968 >= 0.995 -> 6 dropped
    // via its lower-id mate 4; every other pair sits below the threshold
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 7L))
  }

  test("semanticDedupBounded: superset of unbounded, cells obey the bound") {
    // a fat synthetic corpus: 200 vectors in ONE tight region (the
    // skew case that makes the within-cell self-join quadratic) plus
    // the small fixture
    val fat = (100L to 299L).map(i =>
      (i, v(1.0 + (i % 7) / 1000.0, (i % 11) / 1000.0,
        (i % 13) / 1000.0, 0.0)))
    val corpus = emb.unionByName(fat.toDF("vec_id", "embedding"))
    val cents = Ann.kmeans(corpus, "vec_id", "embedding", k = 3, iters = 2)
    val keptUnbounded = Ann.semanticDedup(corpus, "vec_id", "embedding",
        cents, threshold = 0.995)
      .select($"doc").as[Long].collect().toSet
    val bounded = Ann.semanticDedupBounded(corpus, "vec_id", "embedding",
      k = 3, iters = 2, threshold = 0.995, maxCell = 40, maxDepth = 2)
    val keptBounded = bounded.select($"doc").as[Long].collect().toSet
    // sub-splitting only removes candidate pairs -> keeps a superset
    assert(keptUnbounded.subsetOf(keptBounded))
    // and with a huge bound the two are identical
    val keptLoose = Ann.semanticDedupBounded(corpus, "vec_id", "embedding",
        k = 3, iters = 2, threshold = 0.995, maxCell = 100000)
      .select($"doc").as[Long].collect().toSet
    assert(keptLoose == keptUnbounded)
    // the identical pair 7/8 still dedups in the bounded run
    assert(!keptBounded.contains(8L) && keptBounded.contains(7L))
  }

  test("semanticDedupBounded: salting hard-bounds a cell kmeans can't split") {
    // 120 IDENTICAL vectors: sub-kmeans cannot separate them, so the
    // salting fallback must cap the final cell width
    val dup = (0L until 120L).map(i => (i, v(0.5, 0.5, 0.0, 0.0)))
    val corpus = dup.toDF("vec_id", "embedding")
    val out = Ann.semanticDedupBounded(corpus, "vec_id", "embedding",
      k = 2, iters = 1, threshold = 0.99, maxCell = 30, maxDepth = 1)
    // each salted slice keeps exactly its min-id member
    val kept = out.select($"doc").as[Long].collect().toSet
    assert(kept.size == 4) // ceil(120/30) deterministic hash slices
    assert(kept.contains(0L))
  }

  test("semanticDedupBounded: maxCell <= 0 auto-scales the cap with sqrt(N)") {
    // small corpora hit the 1024 floor, so the auto run must match a
    // huge explicit bound exactly (nothing gets split)
    val fat = (100L to 299L).map(i =>
      (i, v(1.0 + (i % 7) / 1000.0, (i % 11) / 1000.0,
        (i % 13) / 1000.0, 0.0)))
    val corpus = emb.unionByName(fat.toDF("vec_id", "embedding"))
    val auto = Ann.semanticDedupBounded(corpus, "vec_id", "embedding",
        k = 3, iters = 2, threshold = 0.995, maxCell = 0)
      .select($"doc").as[Long].collect().toSet
    val explicit = Ann.semanticDedupBounded(corpus, "vec_id", "embedding",
        k = 3, iters = 2, threshold = 0.995, maxCell = 100000)
      .select($"doc").as[Long].collect().toSet
    assert(auto == explicit)
  }

  test("semanticDedup threshold sweep is monotone (lower keeps fewer)") {
    val cents = Ann.kmeans(emb, "vec_id", "embedding", k = 3, iters = 2)
    def keptAt(t: Double): Set[Long] =
      Ann.semanticDedup(emb, "vec_id", "embedding", cents, t)
        .select($"doc").as[Long].collect().toSet
    val loose = keptAt(0.999)
    val tight = keptAt(0.9)
    assert(tight.subsetOf(loose))
    assert(loose.size >= tight.size)
  }

  test("product quantization: codes bounded, identical vectors co-rank") {
    val cbs = Ann.pqCodebooks(emb, "vec_id", "embedding",
      m = 2, k = 3, iters = 2)
    assert(cbs.size == 2)
    assert(cbs.forall(_.forall(_._2.size == 2))) // 4-dim → two 2-dim subs
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", cbs)
    assert(codes.columns.toSeq == Seq("doc", "code_0", "code_1"))
    val cells = cbs.map(_.map(_._1).toSet)
    codes.collect().foreach { r =>
      assert(cells(0).contains(r.getLong(1)))
      assert(cells(1).contains(r.getLong(2)))
    }
    // identical docs 7/8 share codes, so each ranks in the other's list
    // with the SAME reconstructed score
    val top = Ann.pqTopK(emb, emb.filter($"vec_id".isin(7L, 8L)),
      "vec_id", "embedding", k = 7, cbs)
    val m78 = top.filter($"query_id" === 7L && $"nn_id" === 8L)
      .head().getAs[Double]("pq_cos")
    val m87 = top.filter($"query_id" === 8L && $"nn_id" === 7L)
      .head().getAs[Double]("pq_cos")
    assert(m78 == m87)
    // determinism across partitionings (codebooks + ranking)
    val cbs2 = Ann.pqCodebooks(emb.repartition(5), "vec_id", "embedding",
      m = 2, k = 3, iters = 2)
    assert(cbs == cbs2)
  }

  test("ivf nprobe: full-probe equals brute force; recall grows with nprobe") {
    val cents = Ann.kmeans(emb, "vec_id", "embedding", k = 3, iters = 2)
    val brute = Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "nn_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // probing EVERY cell makes IVF exact
    val full = Ann.ivfTopK(emb, emb, "vec_id", "embedding", k = 3, cents,
        nprobe = cents.size)
      .select("query_id", "rank", "nn_id", "cos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(full == brute)
    // candidate sets grow with nprobe: per query, the best cos at
    // nprobe=2 is >= the best at nprobe=1
    def best(np: Int): Map[Long, Double] =
      Ann.ivfTopK(emb, emb, "vec_id", "embedding", k = 1, cents, np)
        .collect().map(r =>
          r.getAs[Long]("query_id") -> r.getAs[Double]("cos")).toMap
    val b1 = best(1)
    val b2 = best(2)
    b1.keys.foreach(q => assert(b2(q) >= b1(q), s"recall shrank for $q"))
  }

  // deterministic pseudo-vectors (no RNG — resumability contract):
  // component c of vector j = a fixed mixed-congruential pattern
  private def pseudoVec(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(c => (((j * 37 + c * 17) % 101) - 50) / 50.0)

  test("ivfAssign: broadcast path matches the literal path at large k") {
    val dim = 8
    val k = Ann.LiteralCodebookMax + 36 // forces the broadcast path
    val codebook: Seq[(Long, Seq[Double])] =
      (0 until k).map(j => (j.toLong, pseudoVec(j + 1000, dim)))
    val probes = (1 to 200).map(j => (j.toLong, pseudoVec(j, dim)))
      .toDF("vec_id", "embedding")
    val both = probes.select($"vec_id",
        Ann.ivfAssignLiteral(Ann.asDouble($"embedding"), codebook)
          .as("lit_cell"),
        Ann.ivfAssignBroadcast(Ann.asDouble($"embedding"), codebook)
          .as("bc_cell"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: literal=${r.getLong(1)} broadcast=${r.getLong(2)}")
    }
    // assignments hit many distinct cells (the parity isn't vacuous)
    assert(both.map(_.getLong(1)).distinct.length > 10)
    // and the dispatching entry point picks the O(1)-plan path: no
    // inlined per-centroid cosine subtrees in the analyzed plan
    val bigPlan = probes.select(
        Ann.ivfAssign(Ann.asDouble($"embedding"), codebook))
      .queryExecution.analyzed.toString
    assert(!bigPlan.contains("array_dot_product"))
    val smallPlan = probes.select(
        Ann.ivfAssign(Ann.asDouble($"embedding"), codebook.take(8)))
      .queryExecution.analyzed.toString
    // small k keeps the inlined-codebook codegen path (cosine is now
    // the VecMath dot expression, not the zip_with HOF)
    assert(smallPlan.contains("array_dot_product"))
  }

  test("kmeans and semanticDedup stay correct above the literal ceiling") {
    // k > LiteralCodebookMax drives every Lloyd iteration and the dedup
    // assignment through the broadcast path; with 80 probes and k=70
    // most cells hold ≤2 members and the identical pair still collapses
    val dim = 6
    val rows = ((1 to 78).map(j => (j.toLong, pseudoVec(j * 3, dim))) ++
      Seq((79L, pseudoVec(7, dim)), (80L, pseudoVec(7, dim))))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Ann.kmeans(df, "vec_id", "embedding",
      k = Ann.LiteralCodebookMax + 6, iters = 2)
    assert(cents.nonEmpty && cents.map(_._1) == cents.map(_._1).sorted)
    val kept = Ann.semanticDedup(df, "vec_id", "embedding", cents,
        threshold = 0.9999)
      .select($"doc").as[Long].collect().toSet
    // 80 is identical to 79 (same pseudoVec(7)), so it always has a
    // lower-id near-identical cluster-mate and must be dropped; the
    // bulk of the lattice survives
    assert(!kept.contains(80L))
    assert(kept.size >= 60 && kept.size < 80)
    // determinism across partitionings with the broadcast path
    val cents2 = Ann.kmeans(df.repartition(13), "vec_id", "embedding",
      k = Ann.LiteralCodebookMax + 6, iters = 2)
    assert(cents == cents2)
  }
}

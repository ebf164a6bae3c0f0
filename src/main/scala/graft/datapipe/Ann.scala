package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * - [[cosine]] — codegen'd zero-allocation dot-product expression
  *   (functions/VecMath.scala; sequential left-to-right sum, so the
  *   result is deterministic and bit-identical to the zip_with +
  *   aggregate HOF form it replaced), no UDF.
  * - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *   against the full corpus; one pass, no shuffle of the corpus side.
  * - [[signLshTopK]] — scale path: bucket vectors by a d-bit sign
  *   hyperplane sketch and search only within the probe's bucket. At
  *   100 TB the bucket column is also the physical partition key, so a
  *   probe touches one partition instead of the corpus.
  * - [[nearDupPairs]] — embedding near-dup: all pairs above a cosine
  *   threshold, blocked by the same sign sketch.
  */
object Ann {

  /** Cosine similarity of two double arrays (deterministic fold).
    * Zero-norm inputs yield NaN — the same value DuckDB's 0/0 produces
    * and what ANSI mode would otherwise throw on (PQ subvectors can be
    * all-zero even when full vectors never are).
    */
  def cosine(a: Column, b: Column): Column = {
    // codegen'd zero-allocation dot (functions/VecMath.scala) — the
    // HOF zip_with+aggregate form allocated 3 intermediate arrays per
    // pair, the dominant cost of the within-cell dedup joins
    def dot(x: Column, y: Column): Column = graft.functions.VecMath.dot(x, y)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, lit(Double.NaN))
      .otherwise(dot(a, b) / sqrt(na) / sqrt(nb))
  }

  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** d-bit sign sketch: bit j = (v[j] > 0) — axis-aligned hyperplane LSH. */
  def signSketch(v: Column, bits: Int = 8): Column =
    (0 until bits).map(j =>
      when(element_at(v, j + 1) > 0.0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
                     vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos"))
  }

  /** LSH-bucketed top-k: only candidates in the probe's sign bucket. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame, id: String,
                  vec: String, k: Int, bits: Int = 8): DataFrame = {
    val q = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
      .withColumn("bucket", signSketch(col("qv"), bits))
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
      .withColumn("bucket", signSketch(col("cv"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("nn_id"), col("cos"))
  }

  /** Above this codebook size, [[ivfAssign]] switches from inlined
    * literals to the broadcast-closure UDF: the literal plan carries
    * O(k·dim) literals and k cosine subtrees, which blows past codegen's
    * 64 KB method limit and plan-serialization budgets at the k ≈ √N a
    * 100 TB corpus needs (10⁴-10⁶ centroids). Small codebooks keep the
    * codegen'd literal path — it fuses into whole-stage codegen with the
    * surrounding projection.
    */
  val LiteralCodebookMax = 64

  /** Nearest-centroid cell id for one vector. The codebook is
    * driver-collected (an IVF coarse quantizer is small relative to the
    * corpus), so assignment is a pure projection either way: a 100 TB
    * corpus pass is scan+project with NO shuffle, and the cell id
    * doubles as the physical partition key of the index. Ties break to
    * the smallest cell id (cos rounded to 6 for engine parity). Both
    * paths compute identical doubles (sequential left-to-right dot
    * product, HALF_UP rounding) — [[graft.datapipe]]'s AnnSpec asserts
    * path equality on the same codebook.
    */
  def ivfAssign(v: Column, codebook: Seq[(Long, Seq[Double])]): Column =
    if (codebook.size <= LiteralCodebookMax) ivfAssignLiteral(v, codebook)
    else ivfAssignBroadcast(v, codebook)

  private[datapipe] def ivfAssignLiteral(
      v: Column, codebook: Seq[(Long, Seq[Double])]): Column = {
    val scored = array(codebook.sortBy(_._1).map { case (cid, cv) =>
      struct(
        round(cosine(v, typedlit(cv)), 6).as("cos"),
        lit(-cid).as("neg_cell"))
    }: _*)
    // struct max = lexicographic: highest cos, then highest -cell id
    (-array_max(scored).getField("neg_cell")).as("cell")
  }

  /** Large-k assignment: the codebook ships ONCE per executor inside the
    * task closure (Spark torrent-broadcasts task binaries), and the scan
    * stays a single projection whose plan size is O(1) in k. The scoring
    * loop mirrors the literal path exactly: left-to-right dot product,
    * cos rounded HALF_UP to 6 decimals, ties to the smallest cell id.
    */
  private[datapipe] def ivfAssignBroadcast(
      v: Column, codebook: Seq[(Long, Seq[Double])]): Column = {
    val cells: Array[(Long, Array[Double])] =
      codebook.sortBy(_._1).map { case (cid, cv) => (cid, cv.toArray) }
        .toArray
    val assign = udf { (vec: Seq[Double]) =>
      if (vec == null) null.asInstanceOf[java.lang.Long]
      else {
        val x = vec.toArray
        var nx = 0.0
        var i = 0
        while (i < x.length) { nx += x(i) * x(i); i += 1 }
        var bestCos = Double.NegativeInfinity
        var bestCell = -1L
        var c = 0
        while (c < cells.length) {
          val (cid, y) = cells(c)
          var dot = 0.0
          var ny = 0.0
          var j = 0
          while (j < y.length) {
            dot += x(j) * y(j); ny += y(j) * y(j); j += 1
          }
          val cos = BigDecimal(dot / math.sqrt(nx) / math.sqrt(ny))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          // strict > + ascending cid order = smallest cell wins ties,
          // identical to the literal path's (cos, -cid) struct max;
          // NaN ranks greatest like Spark's ordering (zero-norm vectors)
          if (cos > bestCos || (cos.isNaN && !bestCos.isNaN)) {
            bestCos = cos; bestCell = cid
          }
          c += 1
        }
        java.lang.Long.valueOf(bestCell)
      }
    }
    assign(v).as("cell")
  }

  /** IVF (inverted-file) top-k: coarse-quantize corpus and probes to
    * centroid cells, search only the probe's `nprobe` NEAREST cells
    * (nprobe=1 = classic single-cell; higher values trade candidate
    * volume for recall — the standard IVF knob). The corpus side stays
    * shuffle-free because [[ivfAssign]] is a projection; probes are
    * broadcast-sized, so their per-cell ranking explodes only the probe
    * set, never the corpus.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
              k: Int, codebook: Seq[(Long, Seq[Double])],
              nprobe: Int = 1): DataFrame = {
    val c = corpus.select(col(id).as("nn_id"), asDouble(col(vec)).as("cv"))
      .withColumn("cell", ivfAssign(col("cv"), codebook))
    val q0 = queries.select(col(id).as("query_id"), asDouble(col(vec)).as("qv"))
    val q =
      if (nprobe <= 1) q0.withColumn("cell", ivfAssign(col("qv"), codebook))
      else {
        // probe-side: rank ALL cells by cosine, keep the top nprobe —
        // probes are few, so the |probes| × k explode is broadcast-sized
        val cellScores = array(codebook.sortBy(_._1).map { case (cid, cv) =>
          struct(round(cosine(col("qv"), typedlit(cv)), 6).as("cos"),
            lit(-cid).as("neg_cell"))
        }: _*)
        q0.withColumn("cell",
            explode(slice(reverse(array_sort(cellScores)), 1, nprobe)
              .getField("neg_cell")))
          .withColumn("cell", -col("cell"))
      }
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    // a candidate can appear through several probed cells — dedup by
    // (query, neighbor) keeping its best cell before ranking
    val dedup =
      if (nprobe <= 1) scored
      else {
        val wd = Window.partitionBy(col("query_id"), col("nn_id"))
          .orderBy(col("cos").desc, col("cell"))
        scored.withColumn("__rn", row_number().over(wd))
          .filter(col("__rn") === 1).drop("__rn")
      }
    dedup.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("rank"), col("nn_id"), col("cos"))
  }

  /** Spherical k-means (Lloyd's) over the embedding column — the coarse
    * quantizer behind a real IVF index and the clustering stage of
    * SemDeDup-style semantic dedup (Abbas et al. 2023: cluster, then
    * prune near-identical members within each cluster).
    *
    * Scale shape: centroids stay DRIVER-side (k × dim doubles — an IVF
    * coarse codebook is tiny by construction), so each Lloyd iteration is
    * one corpus scan: assignment is a pure projection against the literal
    * codebook ([[ivfAssign]] — no shuffle, no join), and the re-centering
    * is ONE map-side-combined groupBy(cell) producing `dim` column sums +
    * a count (k × (dim+1) doubles cross the wire per partition). The
    * corpus is never shuffled and never collected; total driver state per
    * iteration is k rows.
    *
    * Determinism for engine parity: init = the k lowest-`id` vectors
    * (cells numbered 0..k-1 in id order), fixed iteration count, and each
    * new centroid coordinate rounded to 6 decimals so sum-order noise in
    * the distributed mean can't leak into the next assignment. Cells left
    * empty by an iteration simply drop out (documented Lloyd behavior).
    */
  def kmeans(corpus: DataFrame, id: String, vec: String, k: Int,
             iters: Int): Seq[(Long, Seq[Double])] = {
    // persisted for the loop: the dim probe, the init collect and every
    // Lloyd iteration scan the SAME narrow (id, vector) projection —
    // uncached, each action re-reads and re-converts the corpus
    val c = corpus.select(col(id).as("_kid"), asDouble(col(vec)).as("_kv"))
      .persist()
    val dim = c.select(size(col("_kv"))).head().getInt(0)
    var centroids: Seq[(Long, Seq[Double])] =
      c.orderBy(col("_kid")).limit(k).collect().zipWithIndex.map {
        case (r, i) => (i.toLong, r.getSeq[Double](1))
      }.toSeq
    (1 to iters).foreach { _ =>
      val assigned = c.withColumn("_cell", ivfAssign(col("_kv"), centroids))
      val aggs = count(lit(1)).as("_n") +:
        (0 until dim).map(j => sum(element_at(col("_kv"), j + 1)).as(s"_s$j"))
      centroids = assigned.groupBy("_cell").agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          val n = r.getLong(1).toDouble
          (r.getLong(0), (0 until dim).map { j =>
            BigDecimal(r.getDouble(2 + j) / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          })
        }.sortBy(_._1).toSeq
    }
    c.unpersist()
    centroids
  }

  /** SemDeDup-style semantic dedup: k-means-cluster the corpus, then drop
    * every document that has a LOWER-id cluster-mate with cosine ≥
    * `threshold` (the kept doc is the min-id representative of each
    * near-identical group, matching the exact/minhash dedup convention).
    * Returns the kept docs with their cell.
    *
    * Scale: the candidate join is keyed by cell — the whole point of the
    * clustering stage is that the O(n²) pair space shrinks to
    * Σ|cell|², with cell sizes balanced by k-means (k scales with the
    * corpus: k ≈ √N keeps cells bounded). Assignment itself is a
    * shuffle-free projection; the one shuffle is the self-join on cell.
    */
  def semanticDedup(corpus: DataFrame, id: String, vec: String,
                    centroids: Seq[(Long, Seq[Double])],
                    threshold: Double): DataFrame = {
    // persisted: the assigned projection feeds BOTH sides of the
    // cell-keyed self-join and the survivor anti-join — uncached, the
    // per-row assignment (k cosine scores) runs three times
    val c = corpus.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
      .withColumn("cell", ivfAssign(col("v"), centroids))
      .withColumn("n2", graft.functions.VecMath.dot(col("v"), col("v")))
      .persist()
    val dropped = c.as("a").join(c.as("b"),
        col("a.cell") === col("b.cell") && col("b.doc") < col("a.doc"))
      .filter(round(cosineHoisted(col("a.v"), col("b.v"),
        col("a.n2"), col("b.n2")), 6) >= threshold)
      .select(col("a.doc").as("doc")).distinct()
    c.join(dropped, Seq("doc"), "left_anti").select(col("doc"), col("cell"))
  }

  /** [[cosine]] with the squared norms precomputed per ROW — the
    * self-join form: norms move out of the O(pairs) filter into the
    * O(n) projection feeding it (they were a third of the per-pair
    * work). Same deterministic fold and zero-norm → NaN semantics.
    */
  private def cosineHoisted(av: Column, bv: Column,
                            an2: Column, bn2: Column): Column =
    when(an2 === 0.0 || bn2 === 0.0, lit(Double.NaN))
      .otherwise(graft.functions.VecMath.dot(av, bv) /
        sqrt(an2) / sqrt(bn2))

  /** Per-sub-centroid spherical assignment against a per-cell codebook
    * — the multi-cell Lloyd kernel of [[semanticDedupBounded]]. Same
    * math as [[ivfAssignBroadcast]]: cos rounded 6-dp HALF_UP,
    * smallest sub-id wins ties.
    */
  private def bestSub(cb: Array[(Long, Array[Double])],
                      vec: Seq[Double]): Long = {
    val x = vec.toArray
    var nx = 0.0
    var i = 0
    while (i < x.length) { nx += x(i) * x(i); i += 1 }
    var bestCos = Double.NegativeInfinity
    var best = -1L
    var c = 0
    while (c < cb.length) {
      val (cid, y) = cb(c)
      var dot = 0.0
      var ny = 0.0
      var j = 0
      while (j < y.length) { dot += x(j) * y(j); ny += y(j) * y(j); j += 1 }
      val cos = BigDecimal(dot / math.sqrt(nx) / math.sqrt(ny))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos > bestCos || (cos.isNaN && !bestCos.isNaN)) {
        bestCos = cos; best = cid
      }
      c += 1
    }
    best
  }

  /** [[semanticDedup]] with a HARD per-cell width bound — the 100 TB
    * form. A skewed corpus (mass duplication, collapsed embedding
    * regions) can leave k-means cells far wider than N/k, and the
    * within-cell self-join is quadratic in cell width (a 6e9-pair cell
    * showed up in the round-11 stress run). This variant:
    *
    *  1. assigns the k coarse cells (same deterministic kmeans);
    *  2. up to `maxDepth` rounds: finds every cell wider than
    *     `maxCell` (one bounded groupBy-count, ≤ #cells driver rows)
    *     and refines ALL of them in ONE multi-cell Lloyd pass —
    *     seeds are each fat cell's `⌈width/maxCell⌉` lowest-id
    *     members (one window pass, bounded collect ≤ N/maxCell rows),
    *     each iteration is one assignment projection against the
    *     broadcast per-cell codebook plus ONE groupBy(cell, sub)
    *     re-centering. Job count is O(maxDepth × iters), independent
    *     of how many cells are fat (a per-cell driver loop measured
    *     5× SLOWER than the unbounded join on a mostly-fat corpus);
    *  3. any cell STILL over the bound after maxDepth is salted into
    *     `⌈width/maxCell⌉` deterministic hash slices — a hard runtime
    *     guarantee at the cost of missing pairs across slices.
    *
    * Sub-splitting can only shrink the candidate-pair space, so the
    * kept set is a SUPERSET of [[semanticDedup]]'s (the same
    * cluster-boundary approximation SemDeDup already makes, applied
    * one level deeper) — asserted in KmeansSpec. Pair work is bounded
    * by N × maxCell regardless of skew.
    *
    * `maxCell ≤ 0` picks `max(1024, ⌈√N⌉)` automatically: with
    * maxCell ∝ √N the pair work stays O(N^1.5) AND the refinement
    * codebook / seed collects (≤ N/maxCell rows) stay O(√N), so
    * neither side of the bound grows linearly at 10¹¹-doc corpora —
    * a fixed maxCell would instead push the driver codebook ceiling
    * toward N/const.
    */
  def semanticDedupBounded(corpus: DataFrame, id: String, vec: String,
                           k: Int, iters: Int, threshold: Double,
                           maxCell: Int, maxDepth: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val base = corpus.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
    val cellCap =
      if (maxCell > 0) maxCell
      else math.max(1024L, math.ceil(math.sqrt(
        base.count().toDouble)).toLong).toInt
    val cents0 = kmeans(corpus, id, vec, k, iters)
    var assigned = base
      .withColumn("cell", concat(lit("c"), ivfAssign(col("v"), cents0)))
      .cache()
    val dim = base.select(size(col("v"))).head().getInt(0)
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      val fat = assigned.groupBy("cell").count()
        .filter(col("count") > cellCap)
        .collect() // bounded: ≤ #cells rows
      if (fat.isEmpty) done = true
      else {
        val subKOf: Map[String, Int] = fat.map(r => r.getString(0) ->
          math.max(2, math.ceil(r.getLong(1).toDouble / cellCap).toInt))
          .toMap
        val fatNames = subKOf.keys.toSeq
        val fatRows = assigned.filter(col("cell").isin(fatNames: _*))
        // seeds: subK lowest-id members per fat cell, ONE window pass;
        // the collect is bounded by Σ subK ≤ N/cellCap + 2·#fat
        val kLit = typedLit(subKOf)
        val wnd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell")).orderBy(col("doc"))
        var codebook: Map[String, Array[(Long, Array[Double])]] =
          fatRows.withColumn("__rn", row_number().over(wnd))
            .filter(col("__rn") <= element_at(kLit, col("cell")))
            .select(col("cell"), (col("__rn") - 1).cast("long").as("s"),
              col("v"))
            .collect()
            .groupBy(_.getString(0))
            .map { case (c, rows) => c -> rows.map(r =>
              (r.getLong(1), r.getSeq[Double](2).toArray)).sortBy(_._1) }
        def assignU = {
          val cb = codebook // stable capture for the closure
          udf { (cell: String, vec: Seq[Double]) =>
            java.lang.Long.valueOf(bestSub(cb(cell), vec))
          }
        }
        (1 to iters).foreach { _ =>
          // ONE re-centering groupBy over all fat cells together
          val a = fatRows.withColumn("__sub",
            assignU(col("cell"), col("v")))
          val aggs = count(lit(1)).as("_n") +: (0 until dim).map(j =>
            sum(element_at(col("v"), j + 1)).as(s"_s$j"))
          codebook = a.groupBy("cell", "__sub")
            .agg(aggs.head, aggs.tail: _*)
            .collect() // bounded: ≤ Σ subK rows
            .groupBy(_.getString(0))
            .map { case (c, rows) => c -> rows.map { r =>
              val n = r.getLong(2).toDouble
              (r.getLong(1), (0 until dim).map { j =>
                BigDecimal(r.getDouble(3 + j) / n)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              }.toArray)
            }.sortBy(_._1) }
        }
        val refined = assigned.filter(!col("cell").isin(fatNames: _*))
          .unionByName(fatRows.withColumn("cell", concat(col("cell"),
            lit("."), assignU(col("cell"), col("v")).cast("string"))))
        val prev = assigned
        assigned = refined.cache()
        assigned.count() // materialize before dropping the parent cache
        prev.unpersist()
        depth += 1
      }
    }
    // hard bound: salt anything still fat into deterministic slices
    val widths = assigned.groupBy("cell")
      .agg(count(lit(1)).as("__w"))
    val salted = assigned.join(broadcast(widths), Seq("cell"))
      .withColumn("cell", when(col("__w") <= cellCap, col("cell"))
        .otherwise(concat(col("cell"), lit("#"),
          pmod(col("doc"), ceil(col("__w") / cellCap)).cast("string"))))
      .drop("__w")
    val withN2 = salted
      .withColumn("n2", graft.functions.VecMath.dot(col("v"), col("v")))
    val dropped = withN2.as("a").join(withN2.as("b"),
        col("a.cell") === col("b.cell") && col("b.doc") < col("a.doc"))
      .filter(round(cosineHoisted(col("a.v"), col("b.v"),
        col("a.n2"), col("b.n2")), 6) >= threshold)
      .select(col("a.doc").as("doc")).distinct()
    salted.join(dropped, Seq("doc"), "left_anti")
      .select(col("doc"), col("cell"))
  }

  /** Product quantization (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search"): split the vector into `m` contiguous
    * subspaces, k-means each subspace independently (the sub-codebooks),
    * and encode every vector as m small codes. At 100 TB this is THE
    * memory story for ANN — a 64-dim float vector becomes m bytes, and
    * scoring reads codebook entries instead of raw vectors. Scoring here
    * is reconstruction-based (concat the chosen sub-centroids, exact
    * cosine against the probe) — semantically identical to ADC lookup
    * tables, which are the constant-factor fast path.
    *
    * Sub-codebooks come from [[kmeans]] on sliced vectors, so they
    * inherit its determinism (lowest-id init, fixed iterations, 6-dp
    * centroid rounding) and its broadcast path above
    * [[LiteralCodebookMax]] entries.
    */
  def pqCodebooks(corpus: DataFrame, id: String, vec: String, m: Int,
                  k: Int, iters: Int): Seq[Seq[(Long, Seq[Double])]] = {
    val dim = corpus.select(size(col(vec))).head().getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val sub = dim / m
    // All m sub-codebooks train TOGETHER: one corpus scan per Lloyd
    // iteration instead of m independent [[kmeans]] runs (m scans per
    // iteration plus m init jobs — at corpus scale the train cost is
    // the scans, and they differed only in which slice they aggregated).
    // Per-subspace math is unchanged: same lowest-id init, the same
    // [[ivfAssign]] assignment against that subspace's codebook, the
    // same 6-dp-rounded per-cell means; empty cells drop out per
    // subspace exactly as in the sequential form.
    val c = corpus.select(col(id).as("_kid"), asDouble(col(vec)).as("_kv"))
    val initRows = c.orderBy(col("_kid")).limit(k).collect()
    var books: Seq[Seq[(Long, Seq[Double])]] = (0 until m).map { j =>
      initRows.zipWithIndex.map { case (r, i) =>
        (i.toLong, r.getSeq[Double](1).slice(j * sub, j * sub + sub))
      }.toSeq
    }
    (1 to iters).foreach { _ =>
      // one row per (subspace, cell, subvector); explode fans each
      // corpus row to m narrow rows, the groupBy map-side combines to
      // m × k partial sums per partition
      val fanned = c.select(explode(array((0 until m).map { j =>
        val sv = slice(col("_kv"), j * sub + 1, sub)
        struct(lit(j).as("_j"), ivfAssign(sv, books(j)).as("_cell"),
          sv.as("_sv"))
      }: _*)).as("_x"))
        .select(col("_x._j").as("_j"), col("_x._cell").as("_cell"),
          col("_x._sv").as("_sv"))
      val aggs = count(lit(1)).as("_n") +:
        (0 until sub).map(jj => sum(element_at(col("_sv"), jj + 1)).as(s"_s$jj"))
      val updated = fanned.groupBy(col("_j"), col("_cell"))
        .agg(aggs.head, aggs.tail: _*).collect()
      books = (0 until m).map { j =>
        updated.filter(_.getInt(0) == j).map { r =>
          val n = r.getLong(2).toDouble
          (r.getLong(1), (0 until sub).map { jj =>
            BigDecimal(r.getDouble(3 + jj) / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          }: Seq[Double])
        }.sortBy(_._1).toSeq
      }
    }
    books
  }

  /** Encode every vector as its per-subspace nearest-centroid codes. */
  def pqEncode(corpus: DataFrame, id: String, vec: String,
               codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val m = codebooks.size
    val sub = codebooks.head.head._2.size
    val codes = (0 until m).map(j =>
      ivfAssign(slice(asDouble(col(vec)), j * sub + 1, sub),
        codebooks(j)).as(s"code_$j"))
    corpus.select(col(id).as("doc") +: codes: _*)
  }

  /** PQ top-k: rank the whole corpus for each probe by cosine between
    * the probe's EXACT vector and each doc's RECONSTRUCTED (quantized)
    * vector. Probes broadcast; the corpus side is a pure projection over
    * its codes — no raw-vector reads in the scoring loop.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, id: String,
             vec: String, k: Int,
             codebooks: Seq[Seq[(Long, Seq[Double])]]): DataFrame = {
    val m = codebooks.size
    val encoded = pqEncode(corpus, id, vec, codebooks)
    val rec = concat((0 until m).map { j =>
      val lut = typedlit(codebooks(j).toMap)
      element_at(lut, col(s"code_$j"))
    }: _*)
    val recd = encoded.withColumn("rv", rec)
    val q = queries.select(col(id).as("query_id"),
      asDouble(col(vec)).as("qv"))
    val scored = recd.join(broadcast(q), col("doc") =!= col("query_id"))
      .withColumn("pq_cos", round(cosine(col("qv"), col("rv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_cos").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc").as("nn_id"),
        col("pq_cos"))
  }

  /** Near-duplicate pairs by cosine, blocked by sign sketch (a near-dup
    * pair almost always shares the sketch; exact within-bucket scoring).
    */
  def nearDupPairs(corpus: DataFrame, id: String, vec: String,
                   threshold: Double, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(id).as("doc"), asDouble(col(vec)).as("v"))
      .withColumn("bucket", signSketch(col("v"), bits))
    c.as("a").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .withColumn("cos", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"), col("cos"))
  }
}

package graft

import org.apache.spark.sql.functions._

/** One-off scaling sanity for the session's new ops at 40× sf0.1
  * (~200k docs, text-mutated so dedup/caches can't collapse the
  * replicas) — the same harness BENCH_NOTES_r09.md's round-9 op stress
  * used. Prints one line per op; not part of the driver contract.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val rep = sys.env.getOrElse("SPARK_GRAFT_STRESS_REP", "40").toInt
    // The source parquet is a handful of input splits; exploding rep
    // copies IN PLACE multiplies each split's row count by rep, so
    // every downstream narrow block (the cached corpus AND the
    // persisted shingle index, which inherits this partitioning) grows
    // linearly with rep — at rep=4000 single blocks unrolled >1 GiB
    // × 16 concurrent tasks and OOM'd a 44g executor. Partition count
    // must scale with TOTAL ROWS, not cores: spread the source so each
    // generated slice stays ~40k docs (no post-explode shuffle needed),
    // and size the shuffle partitions to match (fixed-32 partitions
    // made the LSH verify hash-builds grow with rep the same way).
    val baseN = Graft.table(spark, sfDir, "documents").count()
    val parts = math.max(spark.sparkContext.defaultParallelism * 4,
      (baseN * rep / 40000L).toInt)
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(spark.sparkContext.defaultParallelism, parts / 2))
    val docs = Graft.table(spark, sfDir, "documents")
      .repartition(parts)
      .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("doc_id", col("doc_id") * rep + col("__r"))
      .withColumn("text",
        concat(col("text"), lit(" v"), pmod(col("__r"), lit(97))))
      .drop("__r")
      .cache()
    val n = docs.count()
    println(s"corpus: $n docs")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.1f s  ($out rows)")
    }

    // SPARK_GRAFT_STRESS_SKIP_LIGHT: dev-loop aid — jump straight to
    // the heavy chains (a heavy iteration otherwise pays ~10 min of
    // light probes first)
    if (!sys.env.get("SPARK_GRAFT_STRESS_SKIP_LIGHT").exists(_.toBoolean)) {
    timed("bpe_train_200") {
      graft.datapipe.Bpe.train(docs, col("text"), numMerges = 200)
        .merges.length.toLong
    }
    val model = graft.datapipe.Bpe.train(docs, col("text"), numMerges = 200)
    timed("bpe_encode") {
      docs.select(size(graft.datapipe.Bpe.encodeCol(model, col("text")))
        .as("n")).agg(sum("n")).head().getLong(0)
    }
    timed("chunk_500_100") {
      docs.select(posexplode(graft.datapipe.TextAnalysis.chunks(
        col("text"), 500, 100))).count()
    }
    timed("json_schema_validate") {
      val schema = """{"type":"object","required":["k"],
        |"properties":{"k":{"type":"integer"}}}""".stripMargin
      val j = concat(lit("{\"k\": "), pmod(col("doc_id"), lit(100)), lit("}"))
      docs.select(graft.functions.Vrl.validateJsonSchema(j, schema, false)
        .as("ok")).filter(col("ok")).count()
    }

    // ---- round-10 ops ----

    timed("bloom_build_64k") {
      // distributed build: one explode+distinct pass bounded by m bits
      graft.enrich.MemoryFilters.bloomTable(
        docs.select(pmod(col("doc_id"), lit(60000L)).cast("string").as("k")),
        col("k"), maxEntries = 65536).words.length.toLong
    }
    val bloom = graft.enrich.MemoryFilters.bloomTable(
      docs.select(pmod(col("doc_id"), lit(60000L)).cast("string").as("k")),
      col("k"), maxEntries = 65536)
    timed("bloom_probe") {
      // shuffle-free projection over the whole corpus
      docs.select(graft.enrich.MemoryFilters.bloomMember(
          col("doc_id").cast("string"), bloom).as("m"))
        .filter(col("m")).count()
    }
    val cuckoo = graft.enrich.MemoryFilters.cuckooTable(
      docs.select(pmod(col("doc_id"), lit(3000L)).cast("string").as("k"),
        col("doc_id")),
      col("k"), col("doc_id"), maxEntries = 4096)
    timed("cuckoo_probe") {
      // broadcast (bucket, fp) join over the whole corpus
      graft.enrich.MemoryFilters.cuckooMember(
          docs, col("doc_id").cast("string"), cuckoo)
        .filter(col("member")).count()
    }
    timed("sample_dynamic") {
      // per-event rate draw — pure filter
      graft.operators.Sample.dynamic(
        docs.withColumn("rt", pmod(col("doc_id"), lit(20L)) + 1),
        col("doc_id"), None, Some("rt"), staticRate = 10).count()
    }
    } // !SKIP_LIGHT

    // ---- the LSH killer corpus, capped (SPARK_GRAFT_STRESS_HOTLSH) --
    // The light corpus's suffix-only mutation leaves every replica of a
    // doc sharing band signatures — the exact shape that filled 78 GB
    // of shuffle spill at rep=400 in round 11 (O(rep²) candidate pairs
    // per doc) and had to be decorrelated to proceed. With
    // minhashLsh(maxBucket=...) the SAME corpus must now complete with
    // bounded per-bucket work. `docs` above IS that corpus.
    if (sys.env.get("SPARK_GRAFT_STRESS_HOTLSH").exists(_.toBoolean)) {
      import graft.datapipe.Dedup
      timed("minhash_pairs_hotcap50") {
        Dedup.minhashLsh(docs, "doc_id", col("text"), shingleN = 3,
          numHashes = 12, bands = 3, threshold = 0.5, maxBucket = 50)
          .count()
      }
    }

    // ---- heavy chains, one order up (round-11: 1-2M docs at rep=400)
    // SPARK_GRAFT_STRESS_HEAVY=true SPARK_GRAFT_STRESS_REP=400
    if (sys.env.get("SPARK_GRAFT_STRESS_HEAVY").exists(_.toBoolean)) {
      import graft.datapipe.{Ann, Dedup, TextAnalysis}
      val ckpt = java.nio.file.Files
        .createTempDirectory("stress_ckpt").toString

      // The light corpus's suffix mutation keeps replicas near-identical
      // — fine for projections, but an LSH run over it puts ~rep copies
      // of every doc in the same buckets and the candidate-pair space
      // goes O(rep²) per doc (first attempt filled 78 GB of shuffle
      // spill at rep=400). Real corpora don't carry 400 clones of
      // everything; decorrelate replicas by stamping the replica id
      // into EVERY word, which keeps the true near-dup structure
      // within each replica class and makes the heavy run ~rep
      // independent sf0.1 corpora (linear, the honest scale shape).
      // the light corpus's cached blocks would otherwise sit under the
      // heavy corpus's (both are N×rep rows — at rep=4000 that is two
      // 20M-doc caches in the same executor pools)
      docs.unpersist(blocking = true)
      val heavyDocs = Graft.table(spark, sfDir, "documents")
        .repartition(parts)
        .withColumn("__r", explode(sequence(lit(0), lit(rep - 1))))
        .withColumn("doc_id", col("doc_id") * rep + col("__r"))
        .withColumn("text", regexp_replace(col("text"), lit("(\\w+)"),
          concat(lit("$1"), pmod(col("__r"), lit(9973)))))
        .drop("__r")
        .cache()
      // SPARK_GRAFT_STRESS_ONLY=emb skips the doc chains; =cc runs
      // ONLY the clustering chain (dev loops)
      val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      val onlyEmb = only.contains("emb")
      val onlyCc = only.contains("cc")
      val onlyCuration = only.contains("curation")
      if (!onlyEmb) {
      if (!onlyCuration) {
      println(s"heavy corpus: ${heavyDocs.count()} docs")

      // Materialize the near-dup pair list ONCE (parquet, same as a
      // real pipeline handing its candidate stage downstream) — the
      // minhash_pairs stage measures LSH; the cc probe then times
      // ONLY clustering instead of re-running ~274 s of LSH inside
      // its own clock (the r12 probe double-counted exactly that).
      // SPARK_GRAFT_STRESS_PAIRS=<path> reuses a previous run's pair
      // list (dev loops on the clustering step without re-paying LSH)
      val pairsPath = sys.env.getOrElse("SPARK_GRAFT_STRESS_PAIRS",
        s"$ckpt/lsh_pairs")
      if (!sys.env.contains("SPARK_GRAFT_STRESS_PAIRS"))
      timed("minhash_pairs") {
        Dedup.minhashLsh(heavyDocs, "doc_id", col("text"),
          shingleN = 3, numHashes = 12, bands = 3, threshold = 0.5)
          .select(col("id_a"), col("id_b"))
          .write.mode("overwrite").parquet(pairsPath)
        spark.read.parquet(pairsPath).count()
      }
      // the pairs are on parquet — release the LSH operator's internal
      // persists (shingle index ≈ 200×corpus rows + banded signatures)
      // before the next chain; at 20M docs they filled both executors'
      // unified pools and the CC round-1 hash builds couldn't acquire
      // even one 32 MB page (eviction couldn't keep up with 32
      // concurrent builders). heavyDocs re-materializes lazily, and the
      // CC below only reads its pruned doc_id column anyway. This IS
      // the real pipeline shape: stage boundary = parquet + fresh cache.
      spark.catalog.clearCache()
      timed("dedup_clusters_cc") {
        Dedup.connectedComponents(
          heavyDocs.select(col("doc_id").as("id")),
          spark.read.parquet(pairsPath),
          checkpointDir = Some(ckpt)).count()
      }
      spark.catalog.clearCache() // same boundary before the next chain
      heavyDocs.cache() // re-register: the curation chain reads it 6×
      } // !onlyCuration
      if (!onlyCc)
      timed("curation_pipeline") {
        // the full gate -> exact/near-dup -> decontaminate -> mix chain,
        // same composition as the oracle query, over the big corpus.
        // STAGED (r16): each drop-id set is its own ACTION with a
        // parquet boundary and an explicit release, so peak shuffle
        // disk is the largest stage instead of the sum — the one-action
        // form accumulated ~140 GB of zstd shuffle at 20M docs (every
        // stage's files live until the single job ends) against this
        // container's 79 GB free. This is also the real 100 TB shape:
        // a production chain lands each drop set on storage.
        val stage = s"$ckpt/curation"
        def release(): Unit = {
          spark.catalog.clearCache()
          // finished stages' ShuffleDependencies are unreachable once
          // their QueryExecutions drop; a GC cycle lets the
          // ContextCleaner delete their shuffle files NOW, between
          // stages, rather than whenever the JVM gets around to it
          System.gc()
        }
        // Stage 0: land the corpus itself. An in-memory cache looks
        // tiny to the planner whenever it is unmaterialized (explode
        // stats pass the pre-REP scan size through), and every
        // statistics-driven strategy decision downstream — dropAnti,
        // the LSH fat-index auto, AQE's own broadcast conversions —
        // then reads corpus-scale frames as broadcastable (the 8 GB
        // driver OOM reproduced exactly that way with a mid-chain
        // cache reset). Parquet gives every stage REAL file-size
        // statistics, and is the real pipeline shape anyway.
        heavyDocs.unpersist(blocking = true)
        heavyDocs.write.mode("overwrite").parquet(s"$stage/corpus")
        release()
        val corpus = spark.read.parquet(s"$stage/corpus")
        Dedup.exactDups(corpus.select("doc_id", "text"),
            "doc_id", col("text"))
          .select(col("doc_id"))
          .write.mode("overwrite").parquet(s"$stage/exact")
        release()
        locally {
          // SPARK_GRAFT_STRESS_VERIFY_SLICES=K runs the exact-Jaccard
          // verify in K disk-bounded slices (Dedup.minhashLshSliced):
          // identical pairs, peak live shuffle ~1/K — the knob that
          // takes the chain past this container's disk at 2× the
          // measured 20M trough
          val slices = sys.env.get("SPARK_GRAFT_STRESS_VERIFY_SLICES")
            .map(_.toInt).getOrElse(1)
          val nearPairs =
            if (slices > 1)
              Dedup.minhashLshSliced(corpus, "doc_id", col("text"),
                sliceDir = s"$stage/near_slices", slices = slices,
                shingleN = 3, numHashes = 12, bands = 3, threshold = 0.5)
            else Dedup.minhashLsh(corpus, "doc_id",
              col("text"), shingleN = 3, numHashes = 12, bands = 3,
              threshold = 0.5)
          Dedup.connectedComponents(
              corpus.select(col("doc_id").as("id")),
              nearPairs.select(col("id_a"), col("id_b")),
              checkpointDir = Some(ckpt))
            .filter(col("id") =!= col("comp"))
            .select(col("id").as("doc_id"))
            .write.mode("overwrite").parquet(s"$stage/near")
        }
        release()
        locally {
          val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
            .select(array_join(slice(Dedup.tokens(col("text")), 1, 12), " ")
              .as("text"))
          graft.datapipe.Decontaminate.overlap(
              corpus, "doc_id", col("text"), bench, col("text"), n = 8)
            .filter(col("contaminated") === 1)
            .select(col("doc").as("doc_id"))
            .write.mode("overwrite").parquet(s"$stage/contam")
        }
        release()
        val gated = corpus
          .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
            TextAnalysis.tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            TextAnalysis.stopwordRatioOf(col("toks")).as("stop_ratio"),
            TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityFrom(col("stop_ratio"),
              col("punct_ratio"), col("n_chars")).as("quality"))
          .filter(col("quality") >= 0.5)
        val fatCorpus = Dedup.estimatedRows(gated) > Dedup.FatCorpusRows
        Dedup.dropAnti(Dedup.dropAnti(Dedup.dropAnti(gated,
            spark.read.parquet(s"$stage/exact"), "doc_id", fatCorpus),
            spark.read.parquet(s"$stage/near"), "doc_id", fatCorpus),
            spark.read.parquet(s"$stage/contam"), "doc_id", fatCorpus)
          .count()
      }
      } // !onlyEmb

      // embeddings: k scales ≈ √N (the documented SemDeDup cell-bound
      // posture). The perturbation must differ PER DIMENSION — a
      // uniform scalar offset moves every replica along the all-ones
      // direction, leaving all replicas of a base vector at cosine ≈ 1
      // (31 mega-cells, a degenerate Σ|cell|² ≈ 6e9 self-join; first
      // attempt ran 20+ min). Per-(replica, dim) offsets decorrelate
      // directions so the √N cells stay balanced — the shape a real
      // corpus has.
      if (!onlyCc && !onlyCuration) {
      // doc chains are done — release every doc-side cache (the 20M-doc
      // corpus + whatever the curation chain's LSH persisted) before
      // the embedding corpora materialize theirs
      spark.catalog.clearCache()
      val embRep = math.max(1, rep / 4)
      val emb = Graft.table(spark, sfDir, "embeddings")
        .repartition(parts)
        .withColumn("__r", explode(sequence(lit(0), lit(embRep - 1))))
        .withColumn("vec_id", col("vec_id") * embRep + col("__r"))
        .withColumn("embedding",
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (v, i) => v + (pmod(col("__r") * 131 + i * 37, lit(61))
              .cast("float") - lit(30.0f)) / lit(40.0f)))
        .drop("__r")
        .cache()
      val nv = emb.count()
      val k = math.max(8, math.sqrt(nv.toDouble).toInt)
      println(s"embeddings: $nv vectors, k=$k")
      var cents: Seq[(Long, Seq[Double])] = Nil
      timed(s"ann_kmeans_k$k") {
        cents = Ann.kmeans(emb, "vec_id", "embedding", k = k, iters = 2)
        cents.length.toLong
      }
      timed("kmeans_assign") {
        emb.select(Ann.ivfAssign(Ann.asDouble(col("embedding")), cents)
          .as("cell")).groupBy("cell").count().count()
      }
      // the UNBOUNDED within-cell join is the known skew casualty: at
      // 10M docs / 1M vectors the k=1000 fit converged to 122 natural
      // cells (the replica offsets only span 61 phases) → Σ|cell|² ≈
      // 8e9 zip_with dot products; the r12 run was still grinding at
      // 38 min and was killed. SPARK_GRAFT_STRESS_SKIP_UNBOUNDED skips
      // it so the bounded probes (the 100 TB form) still report.
      if (!sys.env.get("SPARK_GRAFT_STRESS_SKIP_UNBOUNDED")
          .exists(_.toBoolean))
      timed("dedup_semantic") {
        Ann.semanticDedup(emb, "vec_id", "embedding", cents,
          threshold = 0.40).count()
      }
      timed("dedup_semantic_bounded") {
        // the hard-bounded form: fat cells sub-split (then salted) so
        // pair work caps at N × maxCell regardless of skew
        Ann.semanticDedupBounded(emb, "vec_id", "embedding", k = k,
          iters = 2, threshold = 0.40, maxCell = 1024).count()
      }
      // the DEGENERATE corpus: a uniform scalar offset leaves every
      // replica colinear (cosine ≈ 1) → k-means collapses to ~31
      // mega-cells and the UNBOUNDED within-cell join is Σ|cell|² ≈
      // 6e9 pairs (ran 20+ min before being killed). The bounded form
      // must stay capped at N × maxCell here — this is the probe that
      // justifies its existence.
      val skewEmb = Graft.table(spark, sfDir, "embeddings")
        .repartition(parts)
        .withColumn("__r", explode(sequence(lit(0), lit(embRep - 1))))
        .withColumn("vec_id", col("vec_id") * embRep + col("__r"))
        .withColumn("embedding", transform(col("embedding"),
          v => v + (pmod(col("__r"), lit(31)).cast("float") -
            lit(15.0f)) / lit(100.0f)))
        .drop("__r")
        .cache()
      skewEmb.count()
      timed("dedup_semantic_bounded_skew") {
        Ann.semanticDedupBounded(skewEmb, "vec_id", "embedding", k = k,
          iters = 2, threshold = 0.40, maxCell = 1024).count()
      }
      } // !onlyCc
    }
    spark.stop()
  }
}

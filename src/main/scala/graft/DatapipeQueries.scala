package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.datapipe.{Ann, Dedup, Multimodal, TextAnalysis}

/** Oracle-checked queries for the training-data pipeline operators:
  * dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard / embedding),
  * similarity search (brute-force + sign-LSH), text analysis, and the
  * multimodal plumbing. Oracles recompute the full pipelines in DuckDB
  * (portable md5-derived hashing; double-precision cosine on both sides).
  */
object DatapipeQueries {

  import Queries.Q

  private def docs(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "embeddings")

  val queries: Map[String, Q] = Map(

    // Byte-level BPE tokenization (Sennrich 2016 / GPT-2 byte variant):
    // train 200 merges on the corpus itself, tokenize every document,
    // decode back. The oracle hash-compares the DECODED text against the
    // source string (byte-exact inverse) — any defect in the byte table,
    // pre-tokenizer or merge application breaks equality; merge-order
    // semantics are pinned separately by BpeSpec's textbook corpus.
    "tokenize_bpe" -> { (s, dir) =>
      val d = docs(s, dir)
      val model = graft.datapipe.Bpe.train(d, col("text"), numMerges = 200)
      d.withColumn("ids", graft.datapipe.Bpe.encodeCol(model, col("text")))
        .select(
          col("doc_id"),
          graft.datapipe.Bpe.decodeCol(model, col("ids")).as("decoded"),
          (size(col("ids")) <= octet_length(col("text"))).as("within_bytes"),
          (size(col("ids")) > 0).as("nonempty"))
        .orderBy(col("doc_id"))
    },

    // RAG/context-window chunking: 500-char windows with 100-char
    // overlap, one row per (doc, chunk) — scan + posexplode, shuffle-free
    "chunk_documents" -> { (s, dir) =>
      val d = docs(s, dir)
      d.select(col("doc_id"),
          posexplode(graft.datapipe.TextAnalysis.chunks(
            col("text"), size = 500, overlap = 100)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          col("col").as("chunk"),
          length(col("col")).cast("long").as("chunk_chars"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // training-output sharding: deterministic global shuffle into N
    // shards — shard = 24-bit md5 bucket mod N, pos = the document's
    // 1-based position in the shard's md5 shuffle order
    "shard_assign" -> { (s, dir) =>
      graft.datapipe.Shards.assign(
          docs(s, dir).select("doc_id", "source"), col("doc_id"), 8)
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
        .orderBy("doc_id")
    },

    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(docs(s, dir).select("doc_id", "text"), "doc_id", col("text"))
        .select(col("doc_id"), col("dup_of"))
        .orderBy(col("doc_id"))
    },

    "dedup_minhash" -> { (s, dir) =>
      Dedup.minhashLsh(docs(s, dir), "doc_id", col("text"),
          shingleN = 3, numHashes = 12, bands = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    // training-mix construction: per-source target fractions via
    // deterministic monotone hash sampling (operators/Sample.stratified)
    "sample_stratified" -> { (s, dir) =>
      // sub-1% strata (0.004, 0.001) exercise the 24-bit bucket — an
      // 8-bit bucket would keep zero rows from them
      graft.operators.Sample.stratified(docs(s, dir),
          col("source"), col("doc_id"),
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.004, "src3" -> 0.001))
        .select(col("doc_id"), col("source"), col("sample_rate"))
        .orderBy(col("doc_id"))
    },

    // corpus-wide duplicated-span ratio per doc (exact-substring dedup
    // approximation: 8-token windows, stride 4)
    "dedup_spans" -> { (s, dir) =>
      Dedup.dupSpans(docs(s, dir), "doc_id", col("text"))
        .select(col("doc").as("doc_id"), col("n_windows"),
          col("n_dup_windows"), col("dup_span_ratio"))
        .orderBy(col("doc_id"))
    },

    // pairs -> components -> canonical doc: the step a real dedup
    // pipeline runs after LSH (keep one doc per near-dup cluster)
    "dedup_clusters" -> { (s, dir) =>
      val d = docs(s, dir)
      val pairs = Dedup.minhashLsh(d, "doc_id", col("text"),
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.5)
      Dedup.connectedComponents(
          d.select(col("doc_id").as("id")),
          pairs.select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("comp").as("cluster"),
          (col("id") === col("comp")).as("keep"))
        .orderBy(col("doc_id"))
    },

    // the same near-dedup driven from the YAML config surface: the
    // `dedup_lsh` transform (plans/ConfigLoader) with its scale knobs
    // spelled out — proves threshold/geometry/fat_index/hint_rows wire
    // through config and that emit=survivors (components over
    // pair-touched ids only + one left_anti join back) matches the
    // direct-API clustering's canonical set
    "dedup_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  near_dedup:
          |    type: dedup_lsh
          |    inputs: [docs]
          |    id_field: doc_id
          |    text_field: text
          |    threshold: 0.5
          |    shingle: 3
          |    num_hashes: 12
          |    bands: 3
          |    emit: survivors
          |    fat_index: false
          |    hint_rows: 300000
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [near_dedup]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // the FULL curation chain driven from YAML alone: heuristic quality
    // gate -> exact dedup -> near-dedup, each stage a config transform
    // over the previous stage's survivors (sequential semantics — the
    // dedups see only gated docs, unlike curation_pipeline's
    // full-corpus anti-join sets; the oracle mirrors the sequencing)
    "curation_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  gate:
          |    type: quality_gate
          |    inputs: [docs]
          |    rules: heuristic
          |    min_quality: 0.5
          |  exact:
          |    type: dedup_exact
          |    inputs: [gate]
          |    id_field: doc_id
          |  near:
          |    type: dedup_lsh
          |    inputs: [exact]
          |    id_field: doc_id
          |    threshold: 0.5
          |    fat_index: false
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [near]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // gopher quality rules driven from YAML: remap derives the richer
    // text (same literal replaces as quality_gopher), quality_gate
    // annotates — proves the remap -> gate chain carries VRL-derived
    // fields into the rule metrics
    "quality_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  derive:
          |    type: remap
          |    inputs: [docs]
          |    source: |
          |      .t2 = replace(replace(string!(.text), " merge ", ".\nwe have to merge with that of and the lot. "), " slow ", "...\n• slow ")
          |  gate:
          |    type: quality_gate
          |    inputs: [derive]
          |    text_field: t2
          |    rules: gopher
          |    emit: annotate
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [gate]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("bullet_ratio"), col("ellipsis_ratio"),
          col("alpha_ratio"), col("stopword_hits"), col("gopher_pass"))
        .orderBy(col("doc_id"))
    },

    // PII scrub driven from YAML: remap injects deterministic
    // identifiers, pii_redact replaces the field in place
    "pii_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  inject:
          |    type: remap
          |    inputs: [docs]
          |    source: |
          |      .t2 = replace(replace(replace(string!(.text), " data ", " mail bob.lee+x@ex-ample.org now "), " key ", " host 10.42.7.250 dial +555-867-5309 "), " row ", " ssn 123-45-6789 card 4242 4242 4242 4242 ")
          |  scrub:
          |    type: pii_redact
          |    inputs: [inject]
          |    text_field: t2
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [scrub]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("t2").as("redacted"))
        .orderBy(col("doc_id"))
    },

    // test-set decontamination driven from YAML: the benchmark side is
    // carved out of the corpus by a filter transform (every 97th doc),
    // decontaminate drops every corpus doc sharing an 8-gram with it
    // (the benchmark docs flag themselves — the point of the guard)
    "decon_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  bench:
          |    type: filter
          |    inputs: [docs]
          |    condition: mod(.doc_id, 97) == 0
          |  clean:
          |    type: decontaminate
          |    inputs: [docs, bench]
          |    id_field: doc_id
          |    ngram: 8
          |    emit: clean
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [clean]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // the audit-grade variant: exact_confirm re-checks flagged docs'
    // gram STRINGS so a 64-bit hash collision cannot drop a clean doc.
    // The oracle is the SAME string-gram SQL as decon_config — with the
    // confirm pass the match is definitional, not
    // no-collisions-at-this-scale probabilistic.
    "decon_exact" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  bench:
          |    type: filter
          |    inputs: [docs]
          |    condition: mod(.doc_id, 97) == 0
          |  clean:
          |    type: decontaminate
          |    inputs: [docs, bench]
          |    id_field: doc_id
          |    ngram: 8
          |    emit: clean
          |    exact_confirm: true
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [clean]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },

    // RAG chunking driven from YAML: 500-char windows, 100 overlap;
    // the text field becomes the chunk, chunk_id appended
    "chunk_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  chunks:
          |    type: chunk
          |    inputs: [docs]
          |    size: 500
          |    overlap: 100
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [chunks]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("chunk_id"), col("text").as("chunk"),
          length(col("text")).cast("long").as("chunk_chars"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // sequence packing driven from YAML: same conf as pack_sequences
    // (512-token sequences, 16 buckets, 1 separator), token counts
    // computed inline from the text field
    "pack_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  packed:
          |    type: pack_sequences
          |    inputs: [docs]
          |    id_field: doc_id
          |    seq_len: 512
          |    buckets: 16
          |    sep_tokens: 1
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [packed]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"),
          size(Dedup.tokens(col("text"))).cast("long").as("n_toks"),
          col("offset"), col("first_seq"), col("offset_in_seq"),
          col("last_seq"), col("n_seqs_spanned"))
        .orderBy(col("doc_id"))
    },

    // output sharding driven from YAML: 8 hash shards + deterministic
    // within-shard shuffle order
    "shard_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  docs:
          |    type: parquet
          |    table: documents
          |transforms:
          |  sharded:
          |    type: shard_assign
          |    inputs: [docs]
          |    key_field: doc_id
          |    shards: 8
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [sharded]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("doc_id"), col("source"), col("shard"), col("pos"))
        .orderBy("doc_id")
    },

    // embedding-space near-dedup driven from YAML (SemDeDup): k-means
    // cells + within-cell cosine; emit: cells labels every vector, and
    // the keep flag recovers exactly the dedup_semantic survivor set
    "semantic_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  vecs:
          |    type: parquet
          |    table: embeddings
          |transforms:
          |  deduped:
          |    type: semantic_dedup
          |    inputs: [vecs]
          |    id_field: vec_id
          |    vec_field: embedding
          |    threshold: 0.4
          |    k: 8
          |    iters: 2
          |    emit: cells
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [deduped]
          |""".stripMargin, dir)
      built.sink("out")
        .filter(col("keep"))
        .select(col("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    },

    // similarity search driven from YAML: exact top-5 over the
    // embedding corpus for the first five vectors as queries — the
    // ann_topk shape through ConfigLoader's two-input ann transform
    "ann_config" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  vecs:
          |    type: parquet
          |    table: embeddings
          |transforms:
          |  probes:
          |    type: filter
          |    inputs: [vecs]
          |    condition: .vec_id < 5
          |  nn:
          |    type: ann
          |    inputs: [vecs, probes]
          |    id_field: vec_id
          |    vec_field: embedding
          |    k: 5
          |    method: brute
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [nn]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("query_id"), col("rank"), col("nn_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    },

    // the end-to-end curation run a training-data team performs before
    // a pretraining mix — quality gate, corpus-wide exact + near-dup
    // canonical sets, stratified source mix — composed as ONE Catalyst
    // plan: the gate is a projection+filter, the two dedup legs arrive
    // as left-anti hash joins on doc_id, and the mix is the monotone
    // hash filter, so nothing materializes between stages
    "curation_pipeline" -> { (s, dir) =>
      val d = docs(s, dir)
      val gated = d
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextAnalysis.stopwordRatioOf(col("toks")).as("stop_ratio"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityFrom(col("stop_ratio"), col("punct_ratio"),
            col("n_chars")).as("quality"))
        .filter(col("quality") >= 0.5)
      val exactDup = Dedup.exactDups(d.select("doc_id", "text"), "doc_id",
        col("text")).select(col("doc_id"))
      val nearPairs = Dedup.minhashLsh(d, "doc_id", col("text"),
        shingleN = 3, numHashes = 12, bands = 3, threshold = 0.5)
      // non-canonical near-dup ids only: clustering all N ids and
      // filtering to id != comp equals clustering the pair-touched ids
      // (untouched docs are always canonical) — nearDupDrops additionally
      // short-circuits the drop set to a bounded local relation when the
      // pair graph fits the driver cap
      val nearDup = Dedup.nearDupDrops(
        nearPairs.select(col("id_a"), col("id_b")), "doc_id")
      // benchmark decontamination rides the same plan: prefix-seeded
      // eval set (as in the standalone decontaminate query), any 8-gram
      // hit drops the doc before mixing
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(array_join(slice(Dedup.tokens(col("text")), 1, 12), " ")
          .as("text"))
      val contaminated = graft.datapipe.Decontaminate.overlap(
          d, "doc_id", col("text"), bench, col("text"), n = 8)
        .filter(col("contaminated") === 1)
        .select(col("doc").as("doc_id"))
      val fat = Dedup.estimatedRows(gated) > Dedup.FatCorpusRows
      val kept = Dedup.dropAnti(Dedup.dropAnti(Dedup.dropAnti(
        gated, exactDup, "doc_id", fat), nearDup, "doc_id", fat),
        contaminated, "doc_id", fat)
      val mixed = graft.operators.Sample.stratified(kept, col("source"),
        col("doc_id"),
        Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1))
      // final budgeted cut in TOKENS per source — the last stage of a
      // real mix build (fractions get the ratios right, the budget caps
      // the absolute size)
      val withToks = mixed.join(
        d.select(col("doc_id"),
          size(Dedup.tokens(col("text"))).as("n_tokens")), Seq("doc_id"))
      graft.operators.Sample.tokenBudget(withToks, col("source"),
          col("doc_id"), col("n_tokens"),
          Map("src0" -> 600L, "src1" -> 400L,
            "src2" -> 10000L, "src3" -> 10000L))
        .select(col("doc_id"), col("source"), col("quality"),
          col("sample_rate"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    },

    "dedup_ngram" -> { (s, dir) =>
      Dedup.ngramJaccardAuto(docs(s, dir), "doc_id", col("text"),
          shingleN = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },

    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhash(docs(s, dir), "doc_id", col("text"))
        .orderBy(col("doc"))
    },

    "dedup_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairs(
          Dedup.simhash(docs(s, dir), "doc_id", col("text")), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    },

    "dedup_embedding" -> { (s, dir) =>
      Ann.nearDupPairs(emb(s, dir), "vec_id", "embedding",
          threshold = 0.3, bits = 8)
        .orderBy(col("id_a"), col("id_b"))
    },

    "ann_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    "ann_lsh" -> { (s, dir) =>
      val e = emb(s, dir)
      Ann.signLshTopK(e, e.filter(col("vec_id") < 20), "vec_id",
          "embedding", k = 3, bits = 8)
        .orderBy(col("query_id"), col("rank"))
    },

    "ann_ivf" -> { (s, dir) =>
      val e = emb(s, dir)
      // deterministic coarse codebook from a FIXED-size sample: limit(25)
      // is TakeOrderedAndProject, so the driver holds 25 rows no matter
      // the corpus size (a modulo filter would collect N/40 — linear in N)
      val codebook = e.orderBy(col("vec_id")).limit(25)
        .select(col("vec_id"), Ann.asDouble(col("embedding")).as("v"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
        .toIndexedSeq
      Ann.ivfTopK(e, e.filter(col("vec_id") >= 100 && col("vec_id") < 105),
          "vec_id", "embedding", k = 5, codebook)
        .orderBy(col("query_id"), col("rank"))
    },

    // spherical k-means over the embedding corpus (the IVF coarse
    // quantizer / SemDeDup clustering stage): k=8, 2 Lloyd iterations,
    // deterministic init = 8 lowest vec_ids. Output = surviving cells
    // with member counts and the centroid itself (6-dp, stringified for
    // the engine compare).
    "ann_kmeans" -> { (s, dir) =>
      val e = emb(s, dir)
      val cents = Ann.kmeans(e, "vec_id", "embedding", k = 8, iters = 2)
      val centStr = map(cents.flatMap { case (cell, v) =>
        Seq(lit(cell), lit(v.map(x => f"$x%.6f").mkString(","))) }: _*)
      e.select(col("vec_id"),
          Ann.ivfAssign(Ann.asDouble(col("embedding")), cents).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .withColumn("centroid", element_at(centStr, col("cell")))
        .orderBy(col("cell"))
    },

    // SemDeDup-style semantic dedup: cluster with the same k-means, then
    // within each cell drop every doc having a lower-id mate with
    // cosine >= 0.40 (kept doc = min-id representative; 0.40 sits inside
    // this corpus's upper cosine tail — max pair ≈ 0.51 — so the query
    // exercises both kept and dropped docs)
    "dedup_semantic" -> { (s, dir) =>
      val e = emb(s, dir)
      val cents = Ann.kmeans(e, "vec_id", "embedding", k = 8, iters = 2)
      Ann.semanticDedup(e, "vec_id", "embedding", cents, threshold = 0.40)
        .select(col("doc").as("vec_id"), col("cell"))
        .orderBy(col("vec_id"))
    },

    // learned language-id: multinomial Naive Bayes fitted on the 80%
    // train split (doc_id % 5 != 0), scored on the held-out 20% —
    // counting-only training, so the DuckDB oracle replays the exact fit
    "classify_lang" -> { (s, dir) =>
      val d = docs(s, dir)
      val train = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val test = d.filter(pmod(col("doc_id"), lit(5)) === 0)
      graft.datapipe.Classifier
        .naiveBayes(train, test, "doc_id", col("text"), col("lang"),
          vocabSize = 500)
        .join(test.select(col("doc_id"), col("lang").as("actual")),
          Seq("doc_id"))
        .withColumn("correct", (col("pred") === col("actual")).cast("int"))
        .orderBy(col("doc_id"))
    },

    // bigram-LM perplexity (KenLM/CCNet-style quality filter): fit on
    // the 80% split, score held-out docs by exp(mean bigram nll)
    "text_perplexity" -> { (s, dir) =>
      val d = docs(s, dir)
      val train = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val test = d.filter(pmod(col("doc_id"), lit(5)) === 0)
      graft.datapipe.Classifier.bigramPerplexity(
          train, test, "doc_id", col("text"), vocabSize = 500)
        .orderBy(col("doc_id"))
    },

    // DSIR importance weights: log p_target/p_raw over hashed bigrams,
    // target = the src0 slice (the "clean domain"), raw = everything
    "dsir_weights" -> { (s, dir) =>
      val d = docs(s, dir)
      graft.datapipe.Classifier.importanceWeights(
          d, d.filter(col("source") === "src0"), "doc_id", col("text"),
          buckets = 1024)
        .orderBy(col("doc_id"))
    },

    // benchmark decontamination: docs sharing 8-grams with the
    // "evaluation set" (stand-in: the 12-token prefixes of every 97th
    // doc, so prefix-carrying docs MUST flag) — the test-set-leakage
    // guard every training corpus runs before mixing
    "decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
        .select(array_join(slice(Dedup.tokens(col("text")), 1, 12), " ")
          .as("text"))
      graft.datapipe.Decontaminate.overlap(
          d, "doc_id", col("text"), bench, col("text"), n = 8)
        .select(col("doc").as("doc_id"), col("n_grams"), col("n_hit"),
          col("hit_ratio"), col("contaminated"))
        .orderBy(col("doc_id"))
    },

    // token-budget mixing: per-source budgets in TOKENS (how real
    // training mixes are specified), deterministic hash-order prefix —
    // src0 swallows its stratum whole, src1 cuts mid-stratum, src2
    // keeps a doc or two, every other source drops
    "sample_token_budget" -> { (s, dir) =>
      val d = docs(s, dir).withColumn("n_tokens",
        size(Dedup.tokens(col("text"))))
      graft.operators.Sample.tokenBudget(d, col("source"), col("doc_id"),
          col("n_tokens"),
          Map("src0" -> 10000L, "src1" -> 700L, "src2" -> 60L))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("doc_id"))
    },

    "text_repetition" -> { (s, dir) =>
      // tokens then bigrams bound as real columns: each HOF list is
      // produced once per doc, every statistic reads the bound column
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .withColumn("bigrams", TextAnalysis.bigramsOf(col("toks")))
        .select(
          col("doc_id"),
          TextAnalysis.dupWordRatioOf(col("toks")).as("dup_word_ratio"),
          TextAnalysis.topShareOf(col("toks")).as("top_word_share"),
          TextAnalysis.topShareOf(col("bigrams")).as("top_bigram_share"))
        .orderBy(col("doc_id"))
    },

    // Product quantization (Jégou et al. 2011): 4×16-dim sub-codebooks,
    // corpus encoded to 4 codes/vector, probes ranked against the
    // RECONSTRUCTED vectors — the memory-bounded ANN scale path
    "ann_pq" -> { (s, dir) =>
      val e = emb(s, dir)
      val cbs = Ann.pqCodebooks(e, "vec_id", "embedding",
        m = 4, k = 8, iters = 2)
      val probes = e.filter(col("vec_id") < 3)
      Ann.pqTopK(e, probes, "vec_id", "embedding", k = 5, cbs)
        .orderBy(col("query_id"), col("rank"))
    },

    // Temperature-weighted source mixing (exponentiated sampling,
    // alpha=0.5): small sources up-weight; the budgeted draw reuses the
    // deterministic monotone md5 sampler
    "sample_temperature" -> { (s, dir) =>
      graft.operators.Sample.temperatureMix(
          docs(s, dir).select("doc_id", "source"),
          col("source"), col("doc_id"), budgetFraction = 0.4)
        .select(col("doc_id"), col("source"), col("sample_rate"))
        .orderBy(col("doc_id"))
    },

    // The round-9 curation stages composed as ONE Catalyst plan:
    // Gopher quality gate → PII redaction → exact duplicated-span
    // removal → sequence packing. Every stage is individually
    // oracle-proven (quality_gopher, pii_redact, dedup_span_removal,
    // pack_sequences); this query proves they COMPOSE — filters and
    // projections flow across stage boundaries, and the whole chain is
    // two keyed shuffles (window-hash, doc) plus the packing bucket.
    "curation_pipeline2" -> { (s, dir) =>
      import graft.datapipe.{Packing, Pii, QualityRules}
      val t2 = replace(replace(replace(replace(col("text"),
        lit(" merge "),
        lit(".\nwe have to merge with that of and the lot. ")),
        lit(" slow "), lit("...\n• slow ")),
        lit(" data "), lit(" mail bob.lee+x@ex-ample.org now ")),
        lit(" row "), lit(" ssn 123-45-6789 spare "))
      val enriched = docs(s, dir).select(col("doc_id"), t2.as("t2"))
      val gated = QualityRules.gopherMetrics(enriched, col("t2"))
        .filter(col("gopher_pass"))
        .select(col("doc_id"), Pii.redact(col("t2")).as("red"))
      val cleaned = Dedup.removeDupSpans(gated, "doc_id", col("red"), 8)
        .select(col("doc").as("doc_id"), col("n_removed"),
          col("cleaned_text"))
      val sized = cleaned.withColumn("n_toks",
        size(Dedup.tokens(col("cleaned_text"))))
      Packing.pack(sized.select("doc_id", "n_toks", "n_removed"),
          col("doc_id"), col("n_toks"), seqLen = 256, buckets = 8)
        .select(col("doc_id"), col("n_toks"), col("n_removed"),
          col("offset"), col("first_seq"), col("last_seq"))
        .orderBy(col("doc_id"))
    },

    // Exact duplicated-span REMOVAL (Lee et al. 2021 exact-substring
    // dedup over stride-1 windows): repeated 8-token windows are excised
    // everywhere except their canonical first occurrence, overlaps
    // merged, text rebuilt.
    "dedup_span_removal" -> { (s, dir) =>
      Dedup.removeDupSpans(docs(s, dir), "doc_id", col("text"),
          windowTokens = 8)
        .select(col("doc").as("doc_id"), col("n_tokens"),
          col("n_removed"), col("n_spans_removed"), col("cleaned_text"))
        .orderBy(col("doc_id"))
    },

    // GPT-style sequence packing: md5-order concat + fixed 512-token
    // windows; per-doc placement via a two-phase distributed prefix sum
    "pack_sequences" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        size(Dedup.tokens(col("text"))).as("n_toks"))
      graft.datapipe.Packing.pack(d, col("doc_id"), col("n_toks"),
          seqLen = 512, buckets = 16, sepTokens = 1)
        .select(col("doc_id"), col("n_toks"), col("offset"),
          col("first_seq"), col("offset_in_seq"), col("last_seq"),
          col("n_seqs_spanned"))
        .orderBy(col("doc_id"))
    },

    // PII redaction (regex scrub): deterministic identifiers injected
    // into the word soup, counted + redacted — both engines run the
    // same RE2-compatible patterns
    "pii_redact" -> { (s, dir) =>
      import graft.datapipe.Pii
      val t2 = replace(replace(replace(col("text"),
        lit(" data "), lit(" mail bob.lee+x@ex-ample.org now ")),
        lit(" key "), lit(" host 10.42.7.250 dial +555-867-5309 ")),
        lit(" row "), lit(" ssn 123-45-6789 card 4242 4242 4242 4242 "))
      Pii.stats(docs(s, dir).select(col("doc_id"), t2.as("t2")),
          col("t2"))
        .select(col("doc_id"), col("n_email"), col("n_ipv4"),
          col("n_ssn"), col("n_phone"), col("n_card"), col("n_pii"),
          col("redacted"))
        .orderBy(col("doc_id"))
    },

    // Published rule-based quality filters (datapipe/QualityRules):
    // the synthetic docs are single-line word soup, so both queries
    // first derive a richer text deterministically (punctuation,
    // newlines, bullets, stop-words injected via literal replaces the
    // oracle mirrors exactly) — the rules then see a pass/fail MIX.
    "quality_gopher" -> { (s, dir) =>
      import graft.datapipe.QualityRules
      val t2 = replace(
        replace(col("text"), lit(" merge "),
          lit(".\nwe have to merge with that of and the lot. ")),
        lit(" slow "), lit("...\n• slow "))
      QualityRules.gopherMetrics(
          docs(s, dir).select(col("doc_id"), t2.as("t2")), col("t2"))
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("bullet_ratio"), col("ellipsis_ratio"),
          col("alpha_ratio"), col("stopword_hits"), col("gopher_pass"))
        .orderBy(col("doc_id"))
    },

    "quality_c4" -> { (s, dir) =>
      import graft.datapipe.QualityRules
      val t2 = replace(
        replace(col("text"), lit(" merge "),
          lit(".\nwe have to merge with that of and the lot. ")),
        lit(" slow "), lit("...\n• slow "))
      QualityRules.c4Metrics(
          docs(s, dir).select(col("doc_id"), t2.as("t2")), col("t2"))
        .select(col("doc_id"), col("clean_text"), col("n_sentences"),
          col("c4_pass"))
        .orderBy(col("doc_id"))
    },

    "text_stats" -> { (s, dir) =>
      // staged projections: tokenize once, derive each ratio once, then
      // fan out — the split/filter lambda is evaluated once per doc
      // instead of once per dependent statistic
      docs(s, dir)
        .select(col("doc_id"), col("text"), col("n_chars"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("n_chars"), col("toks"),
          TextAnalysis.stopwordRatioOf(col("toks")).as("stop_ratio"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
        .select(
          col("doc_id"),
          TextAnalysis.tokenCountOf(col("toks")).as("n_tokens"),
          TextAnalysis.subwordCountOf(col("toks")).as("n_subwords"),
          col("stop_ratio"),
          col("punct_ratio"),
          TextAnalysis.meanTokenLenOf(col("toks")).as("mean_tok_len"),
          TextAnalysis.langIdFrom(col("stop_ratio")).as("lang_pred"),
          TextAnalysis.qualityFrom(col("stop_ratio"), col("punct_ratio"),
            col("n_chars")).as("quality"),
          TextAnalysis.fingerprintOf(col("toks")).as("fp"))
        .orderBy(col("doc_id"))
    },

    "multimodal_meta" -> { (s, dir) =>
      Multimodal.decodeAll(s, Multimodal.asMedia(docs(s, dir)))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"))
        .orderBy(col("doc_id"))
    },

    // full decoded output incl. stubbed feature vector — rows-only check;
    // feature stringified (driver's pandas compare can't sort array cells)
    "multimodal_features" -> { (s, dir) =>
      Multimodal.decodeAll(s, Multimodal.asMedia(docs(s, dir)))
        .toDF()
        .withColumn("feature",
          array_join(transform(col("feature"), v => format_string("%.1f", v)), ","))
        .orderBy(col("doc_id"))
    }
  )

  // shared SQL fragments
  private val toksCte =
    """toks AS (SELECT doc_id, list_filter(string_split(text,' '), x -> len(x)>0) t
      |         FROM documents)""".stripMargin

  private val chunkSql =
    """WITH p AS (SELECT doc_id, text, length(text) AS len,
      |  CASE WHEN length(text) <= 500 THEN 1
      |       ELSE CAST(ceil((length(text) - 500) / 400.0) AS BIGINT) + 1
      |  END AS n
      |  FROM documents)
      |SELECT doc_id, i AS chunk_id,
      |  substr(text, CAST(i*400 + 1 AS INT), 500) AS chunk,
      |  length(substr(text, CAST(i*400 + 1 AS INT), 500)) AS chunk_chars
      |FROM p, unnest(generate_series(0, n-1)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  private val gopherSql =
      """WITH t AS (
        |  SELECT doc_id,
        |    replace(replace(text,
        |      ' merge ', '.' || chr(10) || 'we have to merge with that of and the lot. '),
        |      ' slow ', '...' || chr(10) || '• slow ') AS t2
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, t2,
        |    len(regexp_split_to_array(trim(t2), '\s+')) AS n_words,
        |    length(regexp_replace(t2, '\s+', '', 'g')) AS nw_chars,
        |    (length(t2) - length(replace(t2, '#', ''))) +
        |      (length(t2) - length(replace(t2, '...', ''))) / 3 AS n_sym,
        |    string_split(t2, chr(10)) AS ls,
        |    regexp_split_to_array(trim(t2), '\s+') AS ws
        |  FROM t)
        |SELECT doc_id, CAST(n_words AS INT) AS n_words,
        |  round(nw_chars * 1.0 / n_words, 6) AS mean_word_len,
        |  round(n_sym * 1.0 / n_words, 6) AS symbol_ratio,
        |  round(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]')))
        |    * 1.0 / len(ls), 6) AS bullet_ratio,
        |  round(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
        |    * 1.0 / len(ls), 6) AS ellipsis_ratio,
        |  round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
        |    * 1.0 / n_words, 6) AS alpha_ratio,
        |  CAST((CASE WHEN regexp_matches(lower(t2), '\bthe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bbe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bto\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bof\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\band\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bthat\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bhave\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bwith\b') THEN 1 ELSE 0 END)
        |    AS INT) AS stopword_hits,
        |  (n_words BETWEEN 50 AND 100000
        |    AND round(nw_chars * 1.0 / n_words, 6) BETWEEN 3.0 AND 10.0
        |    AND round(n_sym * 1.0 / n_words, 6) <= 0.1
        |    AND round(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]')))
        |      * 1.0 / len(ls), 6) <= 0.9
        |    AND round(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
        |      * 1.0 / len(ls), 6) <= 0.3
        |    AND round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
        |      * 1.0 / n_words, 6) >= 0.8
        |    AND ((CASE WHEN regexp_matches(lower(t2), '\bthe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bbe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bto\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bof\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\band\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bthat\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bhave\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bwith\b') THEN 1 ELSE 0 END)) >= 2
        |  ) AS gopher_pass
        |FROM m ORDER BY doc_id""".stripMargin
  private val shCte =
    """sh AS (SELECT doc_id,
      |  CASE WHEN len(t) >= 3
      |    THEN [array_to_string(t[i:i+2],' ') for i in range(1, len(t)-1)]
      |    ELSE [array_to_string(t,' ')] END s
      |  FROM toks)""".stripMargin
  // 64-bit simhash in DuckDB with exact integer math: the 16 md5 hex
  // chars are decoded as two 32-bit halves (the power(16,8-i) digit sum
  // stays under 2^53 so double arithmetic is exact), bit votes read from
  // the halves, and the fingerprint reassembled as a HUGEINT sum whose
  // bit-63 term is ±2^63 — negative for the signed (Spark long) view,
  // positive for the unsigned view the band split divides against.
  private val simhash64Cte =
    """h AS (SELECT doc_id,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(md5(tk), i, 1)) - 1)
      |    * power(16, 8-i) for i in range(1, 9)]) AS BIGINT) AS hhi,
      |  CAST(list_sum([(strpos('0123456789abcdef', substr(md5(tk), 8+i, 1)) - 1)
      |    * power(16, 8-i) for i in range(1, 9)]) AS BIGINT) AS hlo
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, j, sum(CASE WHEN
      |    (CASE WHEN j < 32 THEN (hlo >> j) ELSE (hhi >> (j-32)) END) & 1 = 1
      |    THEN 1 ELSE -1 END) AS sgn
      |  FROM h, (SELECT unnest(range(0, 64)) AS j) GROUP BY 1, 2),
      |fp AS (SELECT doc_id AS doc,
      |  CAST(sum(CASE WHEN sgn > 0 THEN (CASE WHEN j = 63
      |    THEN -9223372036854775808 ELSE (1::BIGINT << j)::HUGEINT END)
      |    ELSE 0 END) AS BIGINT) AS simhash,
      |  sum(CASE WHEN sgn > 0 THEN (CASE WHEN j = 63
      |    THEN 9223372036854775808 ELSE (1::BIGINT << j)::HUGEINT END)
      |    ELSE 0 END) AS fpu
      |  FROM bits GROUP BY 1)""".stripMargin

  /** MinHash LSH candidate pipeline (lanes → 12-hash signature → 3 bands
    * → band-bucket self-join), shared by the pair and cluster oracles.
    */
  private val minhashCandCtes =
    """lanes AS (SELECT doc_id,
      |  [[CAST(list_sum([(strpos('0123456789abcdef', substr(md5(x), i, 1)) - 1)
      |        * power(16, 8-i) for i in range(1, 9)]) AS BIGINT),
      |    CAST(list_sum([(strpos('0123456789abcdef', substr(md5(x), 8+i, 1)) - 1)
      |        * power(16, 8-i) for i in range(1, 9)]) AS BIGINT) | 1]
      |   for x in s] AS ls
      |  FROM sh),
      |sig AS (SELECT doc_id,
      |  [list_min([(l[1] + h*l[2]) % 4294967296 for l in ls])
      |   for h in range(0, 12)] AS g
      |  FROM lanes),
      |bands AS (
      |  SELECT doc_id, b, array_to_string(g[b*4+1 : b*4+4], ',') AS bh
      |  FROM sig, (SELECT unnest(range(0,3)) AS b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin

  private val jaccardTail =
    """inv AS (SELECT doc_id, unnest(list_distinct(s)) shv FROM sh),
      |sz AS (SELECT doc_id, len(list_distinct(s)) n FROM sh),
      |common AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_common
      |  FROM cand c
      |  JOIN inv sa ON sa.doc_id = c.id_a
      |  JOIN inv sb ON sb.doc_id = c.id_b AND sb.shv = sa.shv
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(n_common * 1.0 / (za.n + zb.n - n_common), 6) AS jaccard
      |FROM common JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
      |WHERE round(n_common * 1.0 / (za.n + zb.n - n_common), 6) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** LSH candidates -> verified pairs -> connected components: the
    * canonical-doc CTE chain, shared by the cluster and curation
    * oracles.
    */
  private val clusterCtes =
    """inv AS (SELECT doc_id, unnest(list_distinct(s)) shv FROM sh),
      |sz AS (SELECT doc_id, len(list_distinct(s)) n FROM sh),
      |common AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_common
      |  FROM cand c
      |  JOIN inv sa ON sa.doc_id = c.id_a
      |  JOIN inv sb ON sb.doc_id = c.id_b AND sb.shv = sa.shv
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM common JOIN sz za ON za.doc_id = id_a
      |    JOIN sz zb ON zb.doc_id = id_b
      |  WHERE round(n_common * 1.0 / (za.n + zb.n - n_common), 6) >= 0.5),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT a AS src, b AS dst FROM edges
      |  UNION
      |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
      |comp AS (
      |  SELECT d.doc_id,
      |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster
      |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      |  GROUP BY d.doc_id)""".stripMargin

  private val dotExpr =
    "list_sum([CAST(qv[i] AS DOUBLE)*CAST(cv[i] AS DOUBLE) for i in range(1, len(qv)+1)])"
  private def normExpr(v: String) =
    s"sqrt(list_sum([CAST($v[i] AS DOUBLE)*CAST($v[i] AS DOUBLE) for i in range(1, len($v)+1)]))"
  private val cosExpr = s"round($dotExpr / ${normExpr("qv")} / ${normExpr("cv")}, 6)"
  // CAST to BIGINT: DuckDB list_sum/sum over BIGINT yields HUGEINT, which
  // pandas renders differently from int64 — the driver's exact-hash compare
  // then mismatches even though values are numerically equal.
  private def sketchExpr(v: String) =
    s"CAST(list_sum([CASE WHEN CAST($v[j+1] AS DOUBLE) > 0 THEN (1::BIGINT << j) ELSE 0 END for j in range(0,8)]) AS BIGINT)"

  // -- k-means oracle (ann_kmeans / dedup_semantic): the same 2 Lloyd
  // iterations as Ann.kmeans, as a CTE chain — deterministic init (8
  // lowest ids), cosine assignment with lowest-cell tie-break, centroid
  // coordinates rounded to 6 dp each iteration (+0.0 folds -0.0 so both
  // engines print "0.000000").
  private def kmPairCos(x: String, y: String) =
    s"""round(list_sum([$x[i]*$y[i] for i in range(1,len($x)+1)])
       |    / sqrt(list_sum([$x[i]*$x[i] for i in range(1,len($x)+1)]))
       |    / sqrt(list_sum([$y[i]*$y[i] for i in range(1,len($y)+1)])), 6)""".stripMargin
  /** [[kmAssign]] generalized over the source table (the PQ subspace
    * chains run one k-means per sliced-vector table).
    */
  private def kmAssignOn(src: String, name: String, cents: String) =
    s"""$name AS (SELECT id, v, cell FROM (
       |  SELECT s.id, s.v, k.cell, ${kmPairCos("s.v", "k.cv")} AS cos
       |  FROM $src s, $cents k)
       |QUALIFY row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) = 1)""".stripMargin

  /** One PQ subspace chain: slice, init from the k lowest ids, two
    * Lloyd iterations, final assign, reconstruct (the same conventions
    * as Ann.kmeans — proven by the ann_kmeans oracle).
    */
  private def pqSubCtes(j: Int, sub: Int, k: Int): String = {
    val s0 = j * sub + 1
    val e0 = s0 + sub - 1
    s"""c$j AS (SELECT vec_id AS id,
       |  [CAST(x AS DOUBLE) for x in embedding[$s0:$e0]] AS v
       |  FROM embeddings),
       |cent${j}_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1
       |    AS BIGINT) AS cell, v AS cv
       |  FROM (SELECT id, v FROM c$j ORDER BY id LIMIT $k)),
       |${kmAssignOn(s"c$j", s"a${j}_1", s"cent${j}_0")},
       |${kmCent(s"cent${j}_1", s"a${j}_1")},
       |${kmAssignOn(s"c$j", s"a${j}_2", s"cent${j}_1")},
       |${kmCent(s"cent${j}_2", s"a${j}_2")},
       |${kmAssignOn(s"c$j", s"a${j}_3", s"cent${j}_2")},
       |r$j AS (SELECT a.id, k.cv FROM a${j}_3 a
       |        JOIN cent${j}_2 k USING (cell))""".stripMargin
  }

  private def kmAssign(name: String, cents: String) =
    s"""$name AS (SELECT id, v, cell FROM (
       |  SELECT c.id, c.v, k.cell, ${kmPairCos("c.v", "k.cv")} AS cos
       |  FROM c, $cents k)
       |QUALIFY row_number() OVER (PARTITION BY id ORDER BY cos DESC, cell) = 1)""".stripMargin
  private def kmCent(name: String, assign: String) =
    s"""$name AS (SELECT cell, list(m ORDER BY i) AS cv FROM (
       |  SELECT cell, i, round(avg(x), 6) + 0.0 AS m FROM (
       |    SELECT cell, unnest(v) AS x,
       |      unnest(generate_series(1, len(v))) AS i FROM $assign)
       |  GROUP BY cell, i)
       |GROUP BY cell)""".stripMargin
  private val kmeansCtes =
    s"""c AS (SELECT vec_id AS id, [CAST(x AS DOUBLE) for x in embedding] AS v
       |      FROM embeddings),
       |cent0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT)
       |            AS cell, v AS cv
       |          FROM (SELECT id, v FROM c ORDER BY id LIMIT 8)),
       |${kmAssign("a1", "cent0")},
       |${kmCent("cent1", "a1")},
       |${kmAssign("a2", "cent1")},
       |${kmCent("cent2", "a2")},
       |${kmAssign("a3", "cent2")}""".stripMargin

  private val oraclesDirect: Map[String, String] = Map(

    "tokenize_bpe" ->
      """SELECT doc_id, text AS decoded, true AS within_bytes,
        |  (n_chars > 0) AS nonempty
        |FROM documents ORDER BY doc_id""".stripMargin,

    "chunk_documents" -> chunkSql,
    // same chunking driven through the YAML `chunk` transform
    "chunk_config" -> chunkSql,

    "shard_assign" ->
      """WITH hashed AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |      AS BIGINT) % 8 AS shard,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT doc_id, source, shard,
        |  row_number() OVER (PARTITION BY shard
        |                     ORDER BY h, CAST(doc_id AS VARCHAR)) AS pos
        |FROM hashed ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS dup_of
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
        |ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $toksCte, $shCte,
        |$minhashCandCtes,
        |$jaccardTail""".stripMargin,

    "sample_stratified" ->
      """WITH h AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |    WHEN 'src2' THEN 0.004 WHEN 'src3' THEN 0.001 END AS fr,
        |  md5(coalesce(CAST(doc_id AS VARCHAR), '')) AS m
        |  FROM documents),
        |f AS (SELECT doc_id, source, fr,
        |  (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(m, 6, 1)) - 1) AS bucket
        |  FROM h)
        |SELECT doc_id, source, CAST(fr AS DOUBLE) AS sample_rate
        |FROM f WHERE fr IS NOT NULL
        |  AND bucket < CAST(floor(fr * 16777216) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "dedup_spans" ->
      s"""WITH $toksCte,
        |win AS (SELECT doc_id,
        |  unnest([md5(array_to_string(t[i*4+1 : i*4+8], ' '))
        |          for i in range(0, (len(t)-8)//4 + 1)]) AS wh
        |  FROM toks WHERE len(t) >= 8),
        |cnt AS (SELECT wh, count(DISTINCT doc_id) AS nd FROM win GROUP BY 1),
        |per AS (SELECT w.doc_id, count(*) AS nw,
        |    sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS ndup
        |  FROM win w JOIN cnt c USING (wh) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(per.nw, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.ndup, 0) AS BIGINT) AS n_dup_windows,
        |  CASE WHEN coalesce(per.nw, 0) > 0
        |    THEN round(per.ndup * 1.0 / per.nw, 6) ELSE 0.0
        |  END AS dup_span_ratio
        |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $toksCte, $shCte,
        |$minhashCandCtes,
        |$clusterCtes
        |SELECT doc_id, cluster, (doc_id = cluster) AS keep
        |FROM comp ORDER BY doc_id""".stripMargin,

    "dedup_config" ->
      s"""WITH RECURSIVE $toksCte, $shCte,
        |$minhashCandCtes,
        |$clusterCtes
        |SELECT d.doc_id, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id NOT IN (
        |  SELECT doc_id FROM comp WHERE doc_id <> cluster)
        |ORDER BY d.doc_id""".stripMargin,

    // sequential YAML chain: quality gate first, exact dedup over the
    // gated docs, LSH clustering over the exact-deduped survivors —
    // every downstream CTE scoped to the previous stage's output
    "curation_config" ->
      s"""WITH RECURSIVE
        |q AS (
        |  SELECT doc_id,
        |    round((least(length(text) / 500.0, 1.0)
        |      + least(stop_ratio * 5.0, 1.0)
        |      + greatest(1.0 - punct_ratio * 4.0, 0.0)) / 3.0, 6) AS quality
        |  FROM (
        |    SELECT doc_id, text,
        |      round(len(list_filter(tk,
        |        x -> x IN ('the','a','of','and','to','in','is','on'))) * 1.0
        |        / len(tk), 6) AS stop_ratio,
        |      round((length(text) - length(regexp_replace(text,
        |        '[[:punct:]]', '', 'g'))) * 1.0 / length(text), 6)
        |        AS punct_ratio
        |    FROM (SELECT doc_id, text,
        |      list_filter(string_split(text,' '), x -> len(x)>0) AS tk
        |      FROM documents))),
        |gated AS (
        |  SELECT d.* FROM documents d JOIN q USING (doc_id)
        |  WHERE q.quality >= 0.5),
        |exact_dup AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM gated) WHERE rn > 1),
        |g2 AS (SELECT * FROM gated
        |       WHERE doc_id NOT IN (SELECT doc_id FROM exact_dup)),
        |toks AS (SELECT doc_id,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t FROM g2),
        |$shCte,
        |$minhashCandCtes,
        |inv AS (SELECT doc_id, unnest(list_distinct(s)) shv FROM sh),
        |sz AS (SELECT doc_id, len(list_distinct(s)) n FROM sh),
        |common AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_common
        |  FROM cand c
        |  JOIN inv sa ON sa.doc_id = c.id_a
        |  JOIN inv sb ON sb.doc_id = c.id_b AND sb.shv = sa.shv
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM common JOIN sz za ON za.doc_id = id_a
        |    JOIN sz zb ON zb.doc_id = id_b
        |  WHERE round(n_common * 1.0 / (za.n + zb.n - n_common), 6) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a AS src, b AS dst FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
        |comp AS (
        |  SELECT d.doc_id,
        |    least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster
        |  FROM g2 d LEFT JOIN reach r ON r.src = d.doc_id
        |  GROUP BY d.doc_id)
        |SELECT doc_id, source FROM g2
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM comp WHERE doc_id <> cluster)
        |ORDER BY doc_id""".stripMargin,

    // remap-injected identifiers scrubbed by the pii_redact transform
    "pii_config" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    replace(replace(replace(text,
        |      ' data ', ' mail bob.lee+x@ex-ample.org now '),
        |      ' key ', ' host 10.42.7.250 dial +555-867-5309 '),
        |      ' row ', ' ssn 123-45-6789 card 4242 4242 4242 4242 ') AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g')
        |    AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,

    // YAML decontaminate: benchmark = full text of every 97th doc, so
    // those docs flag themselves out along with any gram-sharers
    "decon_config" ->
      s"""WITH $toksCte,
        |sh8 AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM toks),
        |bsh AS (SELECT s FROM sh8 WHERE doc_id % 97 = 0),
        |bg AS (SELECT DISTINCT unnest(s) AS g FROM bsh),
        |contam AS (
        |  SELECT DISTINCT cg.doc_id
        |  FROM (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh8) cg
        |  JOIN bg ON cg.g = bg.g)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        |ORDER BY doc_id""".stripMargin,

    // exact_confirm variant: same string-gram semantics, so the same
    // oracle — the confirm pass makes the equality definitional
    "decon_exact" ->
      s"""WITH $toksCte,
        |sh8 AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM toks),
        |bsh AS (SELECT s FROM sh8 WHERE doc_id % 97 = 0),
        |bg AS (SELECT DISTINCT unnest(s) AS g FROM bsh),
        |contam AS (
        |  SELECT DISTINCT cg.doc_id
        |  FROM (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh8) cg
        |  JOIN bg ON cg.g = bg.g)
        |SELECT doc_id, source FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        |ORDER BY doc_id""".stripMargin,

    "curation_pipeline" ->
      s"""WITH RECURSIVE $toksCte, $shCte,
        |$minhashCandCtes,
        |$clusterCtes,
        |q AS (
        |  SELECT doc_id, source,
        |    round((least(n_chars / 500.0, 1.0) + least(stop_ratio * 5.0, 1.0)
        |      + greatest(1.0 - punct_ratio * 4.0, 0.0)) / 3.0, 6) AS quality
        |  FROM (
        |    SELECT doc_id, source, n_chars,
        |      round(len(list_filter(tk,
        |        x -> x IN ('the','a','of','and','to','in','is','on'))) * 1.0
        |        / len(tk), 6) AS stop_ratio,
        |      round((length(text) - length(regexp_replace(text,
        |        '[[:punct:]]', '', 'g'))) * 1.0 / length(text), 6)
        |        AS punct_ratio
        |    FROM (SELECT doc_id, source, text, n_chars,
        |      list_filter(string_split(text,' '), x -> len(x)>0) AS tk
        |      FROM documents))),
        |exact_dup AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn > 1),
        |sh8 AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM toks),
        |bt AS (SELECT t[1:12] AS t FROM toks WHERE doc_id % 97 = 0),
        |bsh AS (SELECT
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM bt),
        |bg AS (SELECT DISTINCT unnest(s) AS g FROM bsh),
        |contam AS (
        |  SELECT DISTINCT cg.doc_id
        |  FROM (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh8) cg
        |  JOIN bg ON cg.g = bg.g),
        |kept AS (
        |  SELECT q.doc_id, q.source, q.quality FROM q
        |  WHERE quality >= 0.5
        |    AND doc_id NOT IN (SELECT doc_id FROM exact_dup)
        |    AND doc_id NOT IN (
        |      SELECT doc_id FROM comp WHERE doc_id <> cluster)
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |h AS (SELECT doc_id, source, quality,
        |  CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |    WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1 END AS fr,
        |  md5(coalesce(CAST(doc_id AS VARCHAR), '')) AS m
        |  FROM kept),
        |f AS (SELECT doc_id, source, quality, fr,
        |  (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(m, 6, 1)) - 1) AS bucket
        |  FROM h),
        |mix AS (
        |  SELECT doc_id, source, quality, CAST(fr AS DOUBLE) AS sample_rate
        |  FROM f WHERE fr IS NOT NULL
        |    AND bucket < CAST(floor(fr * 16777216) AS BIGINT)),
        |wt AS (
        |  SELECT m.doc_id, m.source, m.quality, m.sample_rate,
        |    CAST(len(t.t) AS INT) AS n_tokens,
        |    CASE m.source WHEN 'src0' THEN 600 WHEN 'src1' THEN 400
        |      WHEN 'src2' THEN 10000 WHEN 'src3' THEN 10000 END AS budget
        |  FROM mix m JOIN toks t ON t.doc_id = m.doc_id),
        |cum AS (
        |  SELECT doc_id, source, quality, sample_rate, n_tokens, budget,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM wt)
        |SELECT doc_id, source, quality, sample_rate, n_tokens, cum_tokens
        |FROM cum WHERE budget IS NOT NULL AND cum_tokens <= budget
        |ORDER BY doc_id""".stripMargin,

    "dedup_ngram" ->
      s"""WITH $toksCte, $shCte,
        |inv0 AS (SELECT doc_id, unnest(list_distinct(s)) shv FROM sh),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM inv0 a JOIN inv0 b ON a.shv = b.shv AND a.doc_id < b.doc_id),
        |$jaccardTail""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $toksCte,
        |tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
        |$simhash64Cte
        |SELECT doc, simhash FROM fp ORDER BY doc""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH $toksCte,
        |tok AS (SELECT doc_id, unnest(t) AS tk FROM toks),
        |$simhash64Cte,
        |banded AS (
        |  SELECT doc, simhash, i AS band_idx,
        |    CAST((fpu // dv) % 65536 AS BIGINT) AS band_val
        |  FROM fp, (VALUES (0, 1), (1, 65536), (2, 4294967296),
        |            (3, 281474976710656)) AS bd(i, dv)),
        |cand AS (
        |  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b,
        |    a.simhash AS ha, b.simhash AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc < b.doc)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 6
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding AS v,
        |  ${sketchExpr("embedding")} AS bucket FROM embeddings),
        |pairs AS (
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(
        |    list_sum([CAST(a.v[i] AS DOUBLE)*CAST(b.v[i] AS DOUBLE)
        |              for i in range(1, len(a.v)+1)])
        |    / sqrt(list_sum([CAST(a.v[i] AS DOUBLE)*CAST(a.v[i] AS DOUBLE)
        |                     for i in range(1, len(a.v)+1)]))
        |    / sqrt(list_sum([CAST(b.v[i] AS DOUBLE)*CAST(b.v[i] AS DOUBLE)
        |                     for i in range(1, len(b.v)+1)])), 6) AS cos
        |FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT * FROM pairs WHERE cos >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |            FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS nn_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, nn_id, $cosExpr AS cos
        |  FROM c, q WHERE nn_id <> query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank, nn_id, cos
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, nn_id)
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
        |             ${sketchExpr("embedding")} AS bucket
        |            FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS nn_id, embedding AS cv,
        |        ${sketchExpr("embedding")} AS bucket FROM embeddings),
        |scored AS (
        |  SELECT query_id, c.bucket, nn_id, $cosExpr AS cos
        |  FROM c JOIN q USING (bucket) WHERE nn_id <> query_id)
        |SELECT query_id, bucket, CAST(row_number() OVER w AS INT) AS rank, nn_id, cos
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, nn_id)
        |QUALIFY rank <= 3
        |ORDER BY query_id, rank""".stripMargin,

    "ann_ivf" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv
        |              FROM embeddings ORDER BY vec_id LIMIT 25),
        |assign AS (
        |  SELECT vec_id, cent_id AS cell FROM (
        |    SELECT e.vec_id, cent.cent_id, $cosExpr AS cos
        |    FROM (SELECT vec_id, embedding AS qv FROM embeddings) e, cent)
        |  QUALIFY row_number() OVER
        |    (PARTITION BY vec_id ORDER BY cos DESC, cent_id) = 1),
        |c AS (SELECT e.vec_id AS nn_id, e.embedding AS cv, a.cell
        |      FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id),
        |q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, a.cell
        |      FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id
        |      WHERE e.vec_id >= 100 AND e.vec_id < 105),
        |scored AS (
        |  SELECT query_id, c.cell, nn_id, $cosExpr AS cos
        |  FROM c JOIN q USING (cell) WHERE nn_id <> query_id)
        |SELECT query_id, cell, CAST(row_number() OVER w AS INT) AS rank,
        |  nn_id, cos
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, nn_id)
        |QUALIFY rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "ann_kmeans" ->
      s"""WITH $kmeansCtes
        |SELECT cell, CAST(count(*) AS BIGINT) AS n,
        |  array_to_string([printf('%.6f', x) for x in any_value(cv)], ',')
        |    AS centroid
        |FROM a3 JOIN cent2 USING (cell)
        |GROUP BY cell ORDER BY cell""".stripMargin,

    "dedup_semantic" ->
      s"""WITH $kmeansCtes,
        |dropped AS (
        |  SELECT DISTINCT a.id FROM a3 a JOIN a3 b
        |    ON a.cell = b.cell AND b.id < a.id
        |  WHERE ${kmPairCos("a.v", "b.v")} >= 0.40)
        |SELECT a3.id AS vec_id, a3.cell FROM a3
        |LEFT JOIN dropped d ON d.id = a3.id
        |WHERE d.id IS NULL ORDER BY vec_id""".stripMargin,

    "classify_lang" ->
      """WITH tr AS (SELECT doc_id, lang,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |te AS (SELECT doc_id,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t
        |  FROM documents WHERE doc_id % 5 = 0),
        |occ AS (SELECT lang, unnest(t) AS tok FROM tr),
        |vocab AS (SELECT tok FROM (
        |    SELECT tok, count(*) AS df FROM occ GROUP BY tok)
        |  QUALIFY row_number() OVER (ORDER BY df DESC, tok) <= 500),
        |classes AS (SELECT lang, count(*) AS n_docs FROM tr GROUP BY lang),
        |ntrain AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tr),
        |priors AS (SELECT lang,
        |  round(ln(n_docs / (SELECT n FROM ntrain)), 6) AS prior
        |  FROM classes),
        |counts AS (SELECT lang, tok, count(*) AS cnt
        |  FROM occ JOIN vocab USING (tok) GROUP BY lang, tok),
        |totals AS (SELECT lang, sum(cnt) AS total_c FROM counts GROUP BY lang),
        |vs AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM vocab),
        |grid AS (SELECT c.lang, v.tok FROM classes c, vocab v),
        |logp AS (SELECT g.lang, g.tok,
        |  round(ln((coalesce(cnt, 0) + 1.0) /
        |           (total_c + (SELECT v FROM vs))), 6) AS lp
        |  FROM grid g
        |  LEFT JOIN counts USING (lang, tok) JOIN totals USING (lang)),
        |scored AS (SELECT x.doc_id, l.lang,
        |  round(p.prior + sum(l.lp), 4) AS score
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM te) x
        |  JOIN logp l USING (tok) JOIN priors p ON p.lang = l.lang
        |  GROUP BY x.doc_id, l.lang, p.prior),
        |pred AS (SELECT doc_id, lang AS pred, score FROM scored
        |  QUALIFY row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, lang) = 1)
        |SELECT p.doc_id, p.pred, p.score, d.lang AS actual,
        |  CAST(p.pred = d.lang AS INT) AS correct
        |FROM pred p JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "text_perplexity" ->
      """WITH tr AS (SELECT doc_id,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t
        |  FROM documents WHERE doc_id % 5 <> 0),
        |te AS (SELECT doc_id,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t
        |  FROM documents WHERE doc_id % 5 = 0),
        |trtok AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos,
        |  unnest(t) AS w FROM tr),
        |tetok AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos,
        |  unnest(t) AS w FROM te),
        |vocab AS (SELECT w FROM (
        |    SELECT w, count(*) AS cnt FROM trtok GROUP BY w)
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, w) <= 500),
        |veff AS (SELECT CAST(count(*) + 1 AS DOUBLE) AS v FROM vocab),
        |trm AS (SELECT doc_id, pos,
        |  CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS wm
        |  FROM trtok t LEFT JOIN vocab v USING (w)),
        |tem AS (SELECT doc_id, pos,
        |  CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS wm
        |  FROM tetok t LEFT JOIN vocab v USING (w)),
        |trbg AS (SELECT wm AS w1,
        |  lead(wm) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM trm QUALIFY w2 IS NOT NULL),
        |tebg AS (SELECT doc_id, wm AS w1,
        |  lead(wm) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |  FROM tem QUALIFY w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, count(*) AS c2 FROM trbg GROUP BY w1, w2),
        |wt AS (SELECT w1, sum(c2) AS c1 FROM bc GROUP BY w1),
        |sc AS (SELECT b.doc_id,
        |  round(ln((coalesce(c.c2, 0) + 1.0) /
        |           (coalesce(t.c1, 0) + (SELECT v FROM veff))), 6) AS logp
        |  FROM tebg b LEFT JOIN bc c USING (w1, w2)
        |  LEFT JOIN wt t USING (w1)),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(-sum(logp) / count(*), 4) AS nll
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, nll, round(exp(nll), 4) AS ppl
        |FROM agg ORDER BY doc_id""".stripMargin,

    "dsir_weights" ->
      """WITH d AS (SELECT doc_id, source,
        |  list_filter(string_split(text,' '), x -> len(x)>0) t
        |  FROM documents),
        |bg AS (SELECT doc_id, source,
        |  unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
        |  FROM d),
        |bk AS (SELECT doc_id, source,
        |  CAST(('0x' || substr(md5(g), 1, 6)) AS BIGINT) % 1024 AS b
        |  FROM bg),
        |tc AS (SELECT b, count(*) AS c FROM bk WHERE source = 'src0'
        |       GROUP BY b),
        |rc AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
        |tt AS (SELECT CAST(sum(c) AS DOUBLE) AS v FROM tc),
        |rt AS (SELECT CAST(sum(c) AS DOUBLE) AS v FROM rc),
        |ratio AS (SELECT r.range AS b,
        |  round(ln((coalesce(tc.c, 0) + 1.0) / ((SELECT v FROM tt) + 1024))
        |    - ln((coalesce(rc.c, 0) + 1.0) / ((SELECT v FROM rt) + 1024)),
        |    6) AS lr
        |  FROM range(1024) r LEFT JOIN tc ON tc.b = r.range
        |  LEFT JOIN rc ON rc.b = r.range)
        |SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(round(sum(CAST(lr AS DECIMAL(18,6))), 4) AS DOUBLE)
        |    AS log_weight
        |FROM bk JOIN ratio USING (b)
        |GROUP BY bk.doc_id ORDER BY doc_id""".stripMargin,

    "decontaminate" ->
      s"""WITH $toksCte,
        |sh8 AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM toks),
        |bt AS (SELECT t[1:12] AS t FROM toks WHERE doc_id % 97 = 0),
        |bsh AS (SELECT
        |  CASE WHEN len(t) >= 8
        |    THEN [array_to_string(t[i:i+7],' ') for i in range(1, len(t)-6)]
        |    ELSE [array_to_string(t,' ')] END s
        |  FROM bt),
        |bg AS (SELECT DISTINCT unnest(s) AS g FROM bsh),
        |cg AS (SELECT doc_id, unnest(list_distinct(s)) AS g FROM sh8),
        |hit AS (SELECT cg.doc_id,
        |          count(*) AS n_grams, count(bg.g) AS n_hit
        |        FROM cg LEFT JOIN bg ON cg.g = bg.g
        |        GROUP BY cg.doc_id)
        |SELECT doc_id, n_grams, n_hit,
        |  round(CAST(n_hit AS DOUBLE) / n_grams, 4) AS hit_ratio,
        |  CAST(n_hit > 0 AS INT) AS contaminated
        |FROM hit ORDER BY doc_id""".stripMargin,

    "sample_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |  len(list_filter(string_split(text,' '), x -> len(x)>0)) AS n_tokens
        |  FROM documents),
        |b AS (SELECT *, CASE source WHEN 'src0' THEN 10000
        |  WHEN 'src1' THEN 700 WHEN 'src2' THEN 60 END AS budget FROM d),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  budget FROM b)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE budget IS NOT NULL AND cum_tokens <= budget
        |ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      s"""WITH $toksCte,
        |bg AS (SELECT doc_id, t,
        |  CASE WHEN len(t) >= 2
        |    THEN [array_to_string(t[i:i+1],' ') for i in range(1, len(t))]
        |    ELSE [] END AS b
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN len(t) > 0
        |    THEN round((len(t) - len(list_distinct(t))) * 1.0 / len(t), 6)
        |    ELSE 0.0 END AS dup_word_ratio,
        |  CASE WHEN len(t) > 0
        |    THEN round(list_max([len(list_filter(t, x -> x = d))
        |                         for d in list_distinct(t)]) * 1.0 / len(t), 6)
        |    ELSE 0.0 END AS top_word_share,
        |  CASE WHEN len(b) > 0
        |    THEN round(list_max([len(list_filter(b, x -> x = d))
        |                         for d in list_distinct(b)]) * 1.0 / len(b), 6)
        |    ELSE 0.0 END AS top_bigram_share
        |FROM bg ORDER BY doc_id""".stripMargin,

    "ann_pq" ->
      s"""WITH ${(0 until 4).map(j => pqSubCtes(j, 16, 8)).mkString(",\n")},
        |rec AS (
        |  SELECT r0.id, r0.cv || r1.cv || r2.cv || r3.cv AS rv
        |  FROM r0 JOIN r1 USING (id) JOIN r2 USING (id)
        |       JOIN r3 USING (id)),
        |probes AS (
        |  SELECT vec_id AS query_id,
        |    [CAST(x AS DOUBLE) for x in embedding] AS qv
        |  FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT p.query_id, r.id AS nn_id,
        |    ${kmPairCos("p.qv", "r.rv")} AS pq_cos
        |  FROM probes p, rec r WHERE r.id <> p.query_id)
        |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank,
        |  nn_id, pq_cos
        |FROM scored
        |WINDOW w AS (PARTITION BY query_id ORDER BY pq_cos DESC, nn_id)
        |QUALIFY row_number() OVER w <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "sample_temperature" ->
      """WITH n AS (
        |  SELECT source, count(*) AS ns FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(ns) AS BIGINT) AS N,
        |    list_sum(list(sqrt(ns) ORDER BY source)) AS sw
        |  FROM n),
        |fr AS (
        |  SELECT source,
        |    round(least(1.0,
        |      floor(N * 0.4) * (sqrt(ns) / sw) / ns), 6) AS f
        |  FROM n, tot),
        |h AS (
        |  SELECT d.doc_id, d.source, fr.f,
        |    md5(coalesce(CAST(d.doc_id AS VARCHAR), '')) AS m
        |  FROM documents d JOIN fr USING (source)),
        |b AS (SELECT doc_id, source, f,
        |  (strpos('0123456789abcdef', substr(m, 1, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substr(m, 2, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substr(m, 3, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(m, 4, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(m, 5, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(m, 6, 1)) - 1) AS bucket
        |  FROM h)
        |SELECT doc_id, source, CAST(f AS DOUBLE) AS sample_rate
        |FROM b WHERE bucket < floor(f * 16777216)
        |ORDER BY doc_id""".stripMargin,

    "curation_pipeline2" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(text,
        |      ' merge ', '.' || chr(10) || 'we have to merge with that of and the lot. '),
        |      ' slow ', '...' || chr(10) || '• slow '),
        |      ' data ', ' mail bob.lee+x@ex-ample.org now '),
        |      ' row ', ' ssn 123-45-6789 spare ') AS t2
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, t2,
        |    len(regexp_split_to_array(trim(t2), '\s+')) AS n_words,
        |    length(regexp_replace(t2, '\s+', '', 'g')) AS nw_chars,
        |    (length(t2) - length(replace(t2, '#', ''))) +
        |      (length(t2) - length(replace(t2, '...', ''))) / 3 AS n_sym,
        |    string_split(t2, chr(10)) AS ls,
        |    regexp_split_to_array(trim(t2), '\s+') AS ws
        |  FROM base),
        |gated AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(t2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |      '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |      '\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
        |      '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g')
        |      AS red
        |  FROM m
        |  WHERE n_words BETWEEN 50 AND 100000
        |    AND round(nw_chars * 1.0 / n_words, 6) BETWEEN 3.0 AND 10.0
        |    AND round(n_sym * 1.0 / n_words, 6) <= 0.1
        |    AND round(len(list_filter(ls, l -> regexp_matches(l, '^\s*[-*•]')))
        |      * 1.0 / len(ls), 6) <= 0.9
        |    AND round(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
        |      * 1.0 / len(ls), 6) <= 0.3
        |    AND round(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
        |      * 1.0 / n_words, 6) >= 0.8
        |    AND ((CASE WHEN regexp_matches(lower(t2), '\bthe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bbe\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bto\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bof\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\band\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bthat\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bhave\b') THEN 1 ELSE 0 END)
        |    + (CASE WHEN regexp_matches(lower(t2), '\bwith\b') THEN 1 ELSE 0 END)) >= 2),
        |tk2 AS (
        |  SELECT doc_id AS doc,
        |    list_filter(string_split(red, ' '), x -> len(x) > 0) AS t
        |  FROM gated),
        |tk3 AS (SELECT doc, t, len(t) AS n_tokens FROM tk2),
        |w0 AS (
        |  SELECT doc, t, unnest(range(1, n_tokens - 8 + 2)) AS start
        |  FROM tk3 WHERE n_tokens >= 8),
        |wins AS (
        |  SELECT doc, start,
        |    md5(array_to_string(t[start:start+7], ' ')) AS wh
        |  FROM w0),
        |marked AS (
        |  SELECT doc, start, start + 7 AS e,
        |    count(*) OVER (PARTITION BY wh) AS cnt,
        |    row_number() OVER (PARTITION BY wh ORDER BY doc, start) AS rn
        |  FROM wins),
        |cuts AS (SELECT doc, start, e FROM marked WHERE cnt > 1 AND rn > 1),
        |isl0 AS (
        |  SELECT doc, start, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start > max(e) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM cuts),
        |isl1 AS (
        |  SELECT doc, start, e,
        |    sum(ni) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl0),
        |isl AS (
        |  SELECT doc, island, min(start) AS s, max(e) AS e
        |  FROM isl1 GROUP BY doc, island),
        |per AS (
        |  SELECT doc, CAST(sum(e - s + 1) AS BIGINT) AS n_removed
        |  FROM isl GROUP BY doc),
        |cov AS (SELECT DISTINCT doc, unnest(range(s, e + 1)) AS i FROM isl),
        |pos AS (
        |  SELECT doc, unnest(range(1, n_tokens + 1)) AS i, t
        |  FROM tk3 WHERE n_tokens > 0),
        |kept AS (
        |  SELECT p.doc, p.i, p.t[p.i] AS tok FROM pos p
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cov c WHERE c.doc = p.doc AND c.i = p.i)),
        |clean AS (
        |  SELECT doc, string_agg(tok, ' ' ORDER BY i) AS cleaned_text
        |  FROM kept GROUP BY doc),
        |sized AS (
        |  SELECT tk3.doc AS doc_id,
        |    CAST(len(list_filter(string_split(
        |      coalesce(clean.cleaned_text, ''), ' '), x -> len(x) > 0))
        |      AS INT) AS n_toks,
        |    coalesce(per.n_removed, 0) AS n_removed
        |  FROM tk3
        |  LEFT JOIN per ON per.doc = tk3.doc
        |  LEFT JOIN clean ON clean.doc = tk3.doc),
        |keyed AS (
        |  SELECT doc_id, n_toks, n_removed,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |      AS BIGINT) % 8 AS b,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM sized),
        |placed AS (
        |  SELECT doc_id, n_toks, n_removed,
        |    CAST(coalesce(sum(CAST(n_toks AS BIGINT) + 1) OVER (
        |      ORDER BY b, h, CAST(doc_id AS VARCHAR)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS "offset"
        |  FROM keyed)
        |SELECT doc_id, n_toks, n_removed, "offset",
        |  "offset" // 256 AS first_seq,
        |  CASE WHEN n_toks > 0 THEN ("offset" + n_toks - 1) // 256
        |       ELSE "offset" // 256 END AS last_seq
        |FROM placed ORDER BY doc_id""".stripMargin,

    "dedup_span_removal" ->
      """WITH tk AS (
        |  SELECT doc_id AS doc,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
        |  FROM documents),
        |tk2 AS (SELECT doc, t, len(t) AS n_tokens FROM tk),
        |w0 AS (
        |  SELECT doc, t, unnest(range(1, n_tokens - 8 + 2)) AS start
        |  FROM tk2 WHERE n_tokens >= 8),
        |wins AS (
        |  SELECT doc, start,
        |    md5(array_to_string(t[start:start+7], ' ')) AS wh
        |  FROM w0),
        |marked AS (
        |  SELECT doc, start, start + 7 AS e,
        |    count(*) OVER (PARTITION BY wh) AS cnt,
        |    row_number() OVER (PARTITION BY wh ORDER BY doc, start) AS rn
        |  FROM wins),
        |cuts AS (SELECT doc, start, e FROM marked WHERE cnt > 1 AND rn > 1),
        |isl0 AS (
        |  SELECT doc, start, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start > max(e) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM cuts),
        |isl1 AS (
        |  SELECT doc, start, e,
        |    sum(ni) OVER (PARTITION BY doc ORDER BY start, e
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl0),
        |isl AS (
        |  SELECT doc, island, min(start) AS s, max(e) AS e
        |  FROM isl1 GROUP BY doc, island),
        |per AS (
        |  SELECT doc, count(*) AS n_spans_removed,
        |    CAST(sum(e - s + 1) AS BIGINT) AS n_removed
        |  FROM isl GROUP BY doc),
        |cov AS (SELECT DISTINCT doc, unnest(range(s, e + 1)) AS i FROM isl),
        |pos AS (
        |  SELECT doc, unnest(range(1, n_tokens + 1)) AS i, t
        |  FROM tk2 WHERE n_tokens > 0),
        |kept AS (
        |  SELECT p.doc, p.i, p.t[p.i] AS tok FROM pos p
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM cov c WHERE c.doc = p.doc AND c.i = p.i)),
        |clean AS (
        |  SELECT doc, string_agg(tok, ' ' ORDER BY i) AS cleaned_text
        |  FROM kept GROUP BY doc)
        |SELECT tk2.doc AS doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |  coalesce(per.n_removed, 0) AS n_removed,
        |  coalesce(per.n_spans_removed, 0) AS n_spans_removed,
        |  coalesce(clean.cleaned_text, '') AS cleaned_text
        |FROM tk2
        |LEFT JOIN per ON per.doc = tk2.doc
        |LEFT JOIN clean ON clean.doc = tk2.doc
        |ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS BIGINT) AS n_toks,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |      AS BIGINT) % 16 AS b,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |placed AS (
        |  SELECT doc_id, n_toks,
        |    CAST(coalesce(sum(n_toks + 1) OVER (
        |      ORDER BY b, h, CAST(doc_id AS VARCHAR)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS "offset"
        |  FROM d)
        |SELECT doc_id, n_toks, "offset",
        |  "offset" // 512 AS first_seq,
        |  CASE WHEN n_toks > 0 THEN ("offset" + n_toks - 1) // 512
        |       ELSE "offset" // 512 END AS last_seq,
        |  "offset" % 512 AS offset_in_seq,
        |  CAST((CASE WHEN n_toks > 0 THEN ("offset" + n_toks - 1) // 512
        |       ELSE "offset" // 512 END) - "offset" // 512 + 1 AS INT)
        |    AS n_seqs_spanned
        |FROM placed ORDER BY doc_id""".stripMargin,

    "pii_redact" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    replace(replace(replace(text,
        |      ' data ', ' mail bob.lee+x@ex-ample.org now '),
        |      ' key ', ' host 10.42.7.250 dial +555-867-5309 '),
        |      ' row ', ' ssn 123-45-6789 card 4242 4242 4242 4242 ') AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ipv4,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INT) AS n_ssn,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS INT)
        |    AS n_phone,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b')) AS INT)
        |    AS n_card,
        |  CAST(len(regexp_extract_all(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |   + len(regexp_extract_all(t2,
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))
        |   + len(regexp_extract_all(t2,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
        |   + len(regexp_extract_all(t2,
        |    '\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b'))
        |   + len(regexp_extract_all(t2,
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b')) AS INT)
        |    AS n_pii,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(t2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g')
        |    AS redacted
        |FROM t ORDER BY doc_id""".stripMargin,

    "quality_gopher" -> gopherSql,

    // same gopher rules driven through remap -> quality_gate in YAML
    "quality_config" -> gopherSql,

    "quality_c4" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    replace(replace(text,
        |      ' merge ', '.' || chr(10) || 'we have to merge with that of and the lot. '),
        |      ' slow ', '...' || chr(10) || '• slow ') AS t2
        |  FROM documents),
        |c AS (
        |  -- array_to_string of an empty list is NULL in DuckDB; Spark's
        |  -- array_join is '' — coalesce for parity
        |  SELECT doc_id,
        |    coalesce(array_to_string(list_filter(string_split(t2, chr(10)),
        |      l -> regexp_matches(l, '[.!?"'']\s*$')
        |        AND len(regexp_split_to_array(trim(l), '\s+')) >= 5),
        |      chr(10)), '') AS clean_text
        |  FROM t)
        |SELECT doc_id, clean_text,
        |  CAST(length(clean_text)
        |    - length(regexp_replace(clean_text, '[.!?]', '', 'g')) AS INT)
        |    AS n_sentences,
        |  (NOT contains(clean_text, '{')
        |    AND NOT contains(lower(clean_text), 'lorem ipsum')
        |    AND length(clean_text)
        |      - length(regexp_replace(clean_text, '[.!?]', '', 'g')) >= 3
        |    AND length(clean_text) > 0) AS c4_pass
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text, n_chars,
        |    list_filter(string_split(text,' '), x -> len(x)>0) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, n_chars, toks,
        |    CAST(len(toks) AS INT) AS n_tokens,
        |    CAST(list_sum([greatest(ceil(len(x)/4.0), 1) for x in toks]) AS BIGINT)
        |      AS n_subwords,
        |    round(len(list_filter(toks,
        |      x -> x IN ('the','a','of','and','to','in','is','on'))) * 1.0
        |      / len(toks), 6) AS stop_ratio,
        |    round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
        |      * 1.0 / length(text), 6) AS punct_ratio,
        |    list_sum([len(x) for x in toks]) * 1.0 / len(toks) AS mean_tok_len
        |  FROM t)
        |SELECT doc_id, n_tokens, n_subwords, stop_ratio, punct_ratio, mean_tok_len,
        |  CASE WHEN stop_ratio > 0.05 THEN 'en' ELSE 'und' END AS lang_pred,
        |  round((least(n_chars / 500.0, 1.0) + least(stop_ratio * 5.0, 1.0)
        |    + greatest(1.0 - punct_ratio * 4.0, 0.0)) / 3.0, 6) AS quality,
        |  md5(array_to_string([lower(x) for x in toks], ' ')) AS fp
        |FROM s ORDER BY doc_id""".stripMargin,

    // the fake decoder's rolling checksum is deterministic byte math —
    // recomputable in SQL (docs are ASCII: code point == utf-8 byte)
    "multimodal_features" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CASE WHEN length(text) = 0 THEN 0
        |      ELSE list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          [CAST(unicode(x) AS BIGINT) for x in string_split_regex(text, '')]),
        |        (a, b) -> (a * 31 + b) % 2147483648) END AS ck,
        |    CAST(strlen(text) AS BIGINT) AS len
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  len AS byte_len,
        |  CAST(64 + ck % 512 AS INT) AS width,
        |  CAST(64 + (ck // 512) % 512 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + ck % 30 ELSE 1 END AS INT)
        |    AS n_frames,
        |  printf('%.1f,%.1f,%.1f,%.1f', CAST(len AS DOUBLE),
        |    CAST(ck % 256 AS DOUBLE), CAST((ck // 256) % 256 AS DOUBLE),
        |    CAST(ck % 7 AS DOUBLE)) AS feature
        |FROM c ORDER BY doc_id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin
  )

  // the YAML-surface queries run the SAME computation as their
  // direct-API counterparts with identical conf — one oracle each
  val oracles: Map[String, String] = oraclesDirect ++ Map(
    "pack_config" -> oraclesDirect("pack_sequences"),
    "shard_config" -> oraclesDirect("shard_assign"),
    "semantic_config" -> oraclesDirect("dedup_semantic"),
    "ann_config" -> oraclesDirect("ann_topk"))
}

package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan audits for the properties that decide whether these
  * plans survive a 1000-executor, 100 TB run — asserted, not eyeballed,
  * so a regression that silently un-broadcasts a join or blocks filter
  * pushdown fails CI rather than surfacing as a cluster bill:
  *
  *  - predicate pushdown reaches the parquet scan (PushedFilters)
  *  - column pruning reaches the scan (ReadSchema carries only the
  *    projected columns, not the whole table)
  *  - the enrichment join broadcasts its small side (no shuffle of the
  *    big fact stream)
  *  - aggregation is partial/final (map-side combine before the
  *    exchange)
  *  - the remap hot path stays inside WholeStageCodegen with ZERO
  *    exchanges (a pure pipeline must not shuffle)
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** AQE leaves codegen markers out of the formatted plan until the
    * final plan exists; CodegenMode reports the compiled subtrees up
    * front ("Found N WholeStageCodegen subtrees").
    */
  private def codegenSubtrees(df: org.apache.spark.sql.DataFrame): Int = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    "WholeStageCodegen subtree".r.findAllIn(s).size.max(
      if (s.contains("Found 0 WholeStageCodegen")) 0
      else "\\*\\(\\d+\\)".r.findAllIn(s).size)
  }

  test("q1_agg: filter pushdown, partial aggregation, codegen") {
    val df = graft.SparkEntry.queries("q1_agg")(spark, dir)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filter in:\n$p")
    // partial/final pair: two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no partial aggregate in:\n$p")
    assert(codegenSubtrees(df) >= 1, "no codegen span")
  }

  test("scan prunes columns: 2-column projection reads 2 columns") {
    val df = graft.Graft.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val p = plan(df)
    // ReadSchema must not mention unprojected wide columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"), s"l_comment not pruned:\n$p")
    assert(!p.contains("l_shipdate"), "l_shipdate not pruned")
  }

  test("enrichment join broadcasts the small side") {
    val df = graft.SparkEntry.queries("enrich_join")(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"enrichment join does not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "small-dim enrichment fell back to a sort-merge join")
  }

  test("remap hot path: zero exchanges, one codegen pipeline") {
    val ev = graft.Graft.table(spark, dir, "events")
    val df = graft.Queries.eventsRemap(ev)
    val p = plan(df)
    // Graft.table's small-file parallelism floor adds one ROUND-ROBIN
    // repartition; what must NOT appear is a requirements-driven
    // (hash/range) shuffle — the remap itself is shuffle-free
    assert(!p.contains("ENSURE_REQUIREMENTS"),
      s"pure remap pipeline shuffles:\n$p")
    assert(codegenSubtrees(df) >= 1, "no codegen span")
  }

  test("exact dedup is a single shuffle") {
    val df = graft.SparkEntry.queries("dedup_exact")(spark, dir)
    val p = plan(df)
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(p).size
    // one hash shuffle for the group-by; the final orderBy of the
    // deterministic gate adds a range exchange — nothing else
    assert(exchanges <= 2, s"dedup_exact shuffles $exchanges times:\n$p")
  }

  test("kmeans assignment is a shuffle-free projection") {
    import graft.datapipe.Ann
    val e = graft.Graft.table(spark, dir, "embeddings")
    val cents = Ann.kmeans(e, "vec_id", "embedding", k = 4, iters = 1)
    val assigned = e.select(col("vec_id"),
      Ann.ivfAssign(Ann.asDouble(col("embedding")), cents).as("cell"))
    val p = plan(assigned)
    // the codebook is a literal: no join, and no requirements-driven
    // (hash/range) exchange anywhere in the assignment — a 100 TB
    // corpus pass is scan + project. (Graft.table's small-file
    // parallelism floor may add a round-robin repartition; that is the
    // only exchange allowed.)
    assert(!p.contains("ENSURE_REQUIREMENTS"),
      s"kmeans assignment shuffles:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"kmeans assignment hash-partitions:\n$p")
    assert(!p.contains("Join"), s"kmeans assignment joins:\n$p")
  }

  test("large-k assignment keeps an O(1) plan (broadcast codebook)") {
    import graft.datapipe.Ann
    val e = graft.Graft.table(spark, dir, "embeddings")
    val dim = e.select(size(Ann.asDouble(col("embedding")))).head.getInt(0)
    val k = Ann.LiteralCodebookMax * 4
    val codebook: Seq[(Long, Seq[Double])] = (0 until k).map(j =>
      (j.toLong, (0 until dim).map(c => ((j * 31 + c * 7) % 13 - 6) / 6.0)))
    val bigK = e.select(col("vec_id"),
      Ann.ivfAssign(Ann.asDouble(col("embedding")), codebook).as("cell"))
    val p = plan(bigK)
    // no O(k) literal tree: the per-centroid cosine subtrees (zip_with/
    // aggregate chains) must NOT be inlined k times; plan size stays
    // bounded as k grows — the property that survives k ≈ √N at 100 TB
    assert(!p.contains("zip_with"), s"large-k plan inlines the codebook:\n$p")
    assert(p.length < 20000, s"large-k plan grew with k (${p.length} chars)")
    assert(!p.contains("ENSURE_REQUIREMENTS") && !p.contains("Join"),
      s"large-k assignment is not a pure projection:\n$p")
  }

  test("loki envelope: label grouping is exactly one shuffle") {
    val ev = graft.Graft.table(spark, dir, "events")
      .withColumn("message", col("event_type"))
    val df = graft.sinks.Envelopes.lokiStreams(ev,
      Seq("app" -> "{{ event_type }}"), "json")
    val p = plan(df)
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(p).size
    assert(exchanges == 1,
      s"loki envelope shuffles $exchanges times (want exactly 1):\n$p")
    // and the per-stream aggregation is partial/final around it
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r
      .findAllIn(p).size >= 2, s"no partial aggregate:\n$p")
  }

  test("file sink: static path skips the shuffle, template path has one") {
    import graft.sinks.FileSink
    val ev = graft.Graft.table(spark, dir, "events")
      .withColumn("message", col("event_type"))
    val staticPlan = plan(FileSink.routed(ev,
      FileSink.Config("/tmp/out.log", singleFile = false)))
    // Graft.table's parallelism floor adds a round-robin repartition;
    // the sink itself must add no keyed shuffle for a static path
    assert(!staticPlan.contains("hashpartitioning") &&
        !staticPlan.contains("ENSURE_REQUIREMENTS"),
      s"static-path file sink shuffles:\n$staticPlan")
    val tplPlan = plan(FileSink.routed(ev,
      FileSink.Config("/tmp/{{ event_type }}.log", singleFile = false)))
    assert("REPARTITION_BY_COL|hashpartitioning".r.findAllIn(tplPlan).nonEmpty,
      s"template-path file sink does not co-locate by path:\n$tplPlan")
    assert("ENSURE_REQUIREMENTS".r.findAllIn(tplPlan).isEmpty,
      s"template-path file sink has a requirements-driven shuffle beyond " +
        s"the path repartition:\n$tplPlan")
  }

  test("pii redaction is a shuffle-free projection") {
    val d = graft.Graft.table(spark, dir, "documents")
    val p = plan(graft.datapipe.Pii.stats(d, col("text")))
    assert(!p.contains("ENSURE_REQUIREMENTS") && !p.contains("hashpartitioning"),
      s"pii redaction shuffles:\n$p")
    assert(!p.contains("Join"))
  }

  test("span removal: hash + doc shuffles only, keyed joins, no cross") {
    val d = graft.Graft.table(spark, dir, "documents")
    val p = plan(graft.datapipe.Dedup.removeDupSpans(d, "doc_id",
      col("text"), 8))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"span removal degenerated to a cross join:\n$p")
    // window-hash agg, islands window, rebuild join — a handful of keyed
    // exchanges; anything beyond that is a plan regression
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(p).size
    assert(exchanges <= 6, s"span removal shuffles $exchanges times:\n$p")
  }

  test("packing: one bucket shuffle, prefix broadcast, no global window") {
    val d = graft.Graft.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.datapipe.Dedup.tokens(col("text"))).as("n_toks"))
    val p = plan(graft.datapipe.Packing.pack(d, col("doc_id"),
      col("n_toks"), 512, buckets = 16))
    // the 100 TB hazard is a SINGLE-PARTITION window (an empty
    // partitionBy) — the plan must window over the bucket key instead
    assert(!p.contains("Window [") ||
      !p.contains("windowspecdefinition()"), "global (unkeyed) window")
    assert(p.contains("hashpartitioning"),
      s"packing lost its bucket shuffle:\n$p")
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(p).size
    assert(exchanges <= 2, s"packing shuffles $exchanges times:\n$p")
  }

  test("pq encode is a shuffle-free projection; scoring broadcasts probes") {
    import graft.datapipe.Ann
    val e = graft.Graft.table(spark, dir, "embeddings")
    val cbs = Ann.pqCodebooks(e, "vec_id", "embedding", m = 4, k = 8,
      iters = 1)
    val enc = plan(Ann.pqEncode(e, "vec_id", "embedding", cbs))
    assert(!enc.contains("ENSURE_REQUIREMENTS") && !enc.contains("Join"),
      s"pq encode is not a pure projection:\n$enc")
    val top = plan(Ann.pqTopK(e, e.filter(col("vec_id") < 3), "vec_id",
      "embedding", 5, cbs))
    assert(top.contains("BroadcastNestedLoopJoin") ||
      top.contains("BroadcastExchange"),
      s"pq scoring does not broadcast the probes:\n$top")
    assert(!top.contains("SortMergeJoin"),
      "pq scoring shuffled the corpus for the probe join")
  }

  test("semantic dedup: the candidate join is keyed (hash), not a cross") {
    import graft.datapipe.Ann
    val e = graft.Graft.table(spark, dir, "embeddings")
    val cents = Ann.kmeans(e, "vec_id", "embedding", k = 4, iters = 1)
    val df = Ann.semanticDedup(e, "vec_id", "embedding", cents, 0.4)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"semantic dedup degenerated to a cross join:\n$p")
  }

  test("naive bayes: the fitted model broadcasts; the corpus side doesn't") {
    val d = graft.Graft.table(spark, dir, "documents")
    val train = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val test0 = d.filter(pmod(col("doc_id"), lit(5)) === 0)
    val df = graft.datapipe.Classifier.naiveBayes(
      train, test0, "doc_id", col("text"), col("lang"), 200)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"model join does not broadcast:\n$p")
    // scoring side: the model join must not shuffle the corpus (it
    // broadcasts the model instead — a sort-merge join here would be a
    // corpus-wide exchange on a model key). The FIT contributes several
    // bounded-size shuffles (vocab/class aggregations over the train
    // split), so only a pathological growth is gated.
    assert(!p.contains("SortMergeJoin"),
      s"model join shuffles the corpus side:\n$p")
    val exchanges = "ENSURE_REQUIREMENTS".r.findAllIn(p).size
    assert(exchanges <= 12,
      s"classifier plan shuffles $exchanges times:\n$p")
  }

  test("bpe encode is a shuffle-free projection; train counts are TopK") {
    import graft.datapipe.Bpe
    val docs = graft.Graft.table(spark, dir, "documents")
    val model = Bpe.train(docs, col("text"), numMerges = 30)
    // encode: broadcast rank table inside one UDF projection — a 100 TB
    // tokenization pass is scan + project, no exchange, no join
    val encoded = docs.select(col("doc_id"),
      Bpe.encodeCol(model, col("text")).as("ids"))
    val pe = plan(encoded)
    assert(!pe.contains("ENSURE_REQUIREMENTS") && !pe.contains("Join"),
      s"bpe encode is not a pure projection:\n$pe")
    // train's frequency cut: orderBy+limit must plan as TakeOrdered
    // (a bounded TopK), never a global sort of the distinct-word table
    val pretok = udf((s: String) =>
      if (s == null) Array.empty[String]
      else graft.datapipe.Bpe.preTokenize(s).toArray)
    val freq = docs.select(explode(pretok(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(1000)
    val pf = plan(freq)
    assert(pf.contains("TakeOrderedAndProject"),
      s"bpe train word cut is a full sort:\n$pf")
  }

  test("vrl_json_schema: validation is projection-only over the scan") {
    val df = graft.SparkEntry.queries("vrl_json_schema")(spark, dir)
    val p = plan(df)
    // per-row schema validation must not introduce joins or hash
    // shuffles — only the deterministic-gate orderBy's range exchange
    assert(!p.contains("hashpartitioning"),
      s"vrl_json_schema hash-partitions:\n$p")
    assert(!p.contains("Join"), s"vrl_json_schema joins:\n$p")
  }

  test("merge-assignment events stay a zero-exchange projection") {
    val ev = graft.Graft.table(spark, dir, "events")
      .select(col("event_id"), concat(lit("<34>1 2024-02-13T21:53:30Z h a 1 i - m"),
        col("event_type")).as("message"))
    val out = graft.functions.VrlCompiler.run(ev,
      """. |= object!(parse_syslog!(string!(.message)))""").primary
    val p = plan(out)
    assert(!p.contains("ENSURE_REQUIREMENTS") && !p.contains("Join"),
      s"|= merge introduced a shuffle or join:\n$p")
  }

  test("chunking is scan + explode, no exchange beyond the gate sort") {
    val df = graft.SparkEntry.queries("chunk_documents")(spark, dir)
    val p = plan(df)
    assert(!p.contains("hashpartitioning"), s"chunking hash-partitions:\n$p")
    assert(!p.contains("Join"), s"chunking joins:\n$p")
    assert(p.contains("Generate"), s"chunking lost its explode:\n$p")
  }

  test("decoding-block composition stays projection-only over the source") {
    // source + generic `decoding.codec` (the YAML composition path):
    // the decoder must not introduce a shuffle or join — it's a pure
    // column rewrite over whatever the transport produced
    val raw = graft.Graft.table(spark, dir, "events")
      .select(concat(lit("<165>1 2024-02-13T21:53:30.605Z host app - ID47 - msg "),
        col("event_id")).as("message"))
    val decoded = ConfigLoader.applyDecoding(raw,
      Map("decoding" -> java.util.Map.of("codec", "syslog")))
    val p = plan(decoded)
    assert(!p.contains("hashpartitioning"), s"decoder shuffles:\n$p")
    assert(!p.contains("Join"), s"decoder joins:\n$p")
  }

  test("temperature mix: the draw is a filter over the scan, no joins") {
    // the per-stratum counts are a bounded driver artifact (|strata|
    // rows) gathered at BUILD time; the returned plan must be a pure
    // deterministic-hash filter — no join against a rates table, no
    // extra shuffle of the corpus
    val e = graft.Graft.table(spark, dir, "events")
    val df = graft.operators.Sample.temperatureMix(e,
      col("event_type"), col("event_id"), budgetFraction = 0.2)
    val p = plan(df)
    assert(!p.contains("Join"), s"temperature mix joins:\n$p")
    // the only allowed exchange is the tiny-fixture parallelism floor's
    // round-robin, never a hashpartitioning of the corpus
    assert(!p.contains("hashpartitioning"), s"draw shuffles on a key:\n$p")
  }

  test("bloom membership probe is a shuffle-free projection") {
    // the filter is a broadcast literal word array; the probe side must
    // stay a pure column expression over the scan — no join, no
    // exchange beyond the tiny-fixture floor
    val e = graft.Graft.table(spark, dir, "events")
    val t = graft.enrich.MemoryFilters.bloomTable(
      e.filter(col("event_type") === "error")
        .select(col("user_id").cast("string").as("k")),
      col("k"), maxEntries = 1024)
    val probed = e.select(col("event_id"),
      graft.enrich.MemoryFilters.bloomMember(
        col("user_id").cast("string"), t).as("member"))
    val p = plan(probed)
    assert(!p.contains("hashpartitioning"), s"bloom probe shuffles:\n$p")
    assert(!p.contains("Join"), s"bloom probe joins:\n$p")
  }

  test("cuckoo probe: entry list broadcasts, corpus side never shuffles") {
    val e = graft.Graft.table(spark, dir, "events")
    val t = graft.enrich.MemoryFilters.cuckooTable(
      e.select(col("user_id").cast("string").as("k"), col("event_id")),
      col("k"), col("event_id"), maxEntries = 4096)
    val probed = graft.enrich.MemoryFilters.cuckooMember(
      e, col("user_id").cast("string"), t)
    val p = plan(probed)
    // row-preserving projection against the broadcast literal map —
    // no join at all (a (bucket OR bucket) join could duplicate rows)
    assert(!p.contains("Join"), s"cuckoo probe joins:\n$p")
    assert(!p.contains("hashpartitioning"), s"corpus side shuffles:\n$p")
  }

  test("dd v2-series decode is projection-only over the scan") {
    val df = graft.SparkEntry.queries("dd_agent_v2")(spark, dir)
    val p = plan(df)
    // encode→decode→explode is a per-row pipeline: no join, no
    // aggregation, no exchange beyond the final presentation sort
    assert(!p.contains("Join"), s"dd_agent_v2 joins:\n$p")
    assert(!p.contains("HashAggregate"), s"dd_agent_v2 aggregates:\n$p")
    assert(!p.contains("hashpartitioning"), s"dd_agent_v2 shuffles:\n$p")
  }

  test("dd sketch decode: only the two keyed aggregations shuffle") {
    val df = graft.SparkEntry.queries("dd_agent_sketch")(spark, dir)
    val p = plan(df)
    assert(!p.contains("Join"), s"dd_agent_sketch joins:\n$p")
    // (event_type, idx) then event_type — keyed hash shuffles only,
    // with map-side partial aggregation before each
    assert("hashpartitioning".r.findAllIn(p).size <= 2,
      s"dd_agent_sketch extra shuffles:\n$p")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(p).size >= 2, s"no partial aggregate:\n$p")
  }

  test("bounded semantic dedup: candidate join keyed by cell, no cross") {
    val e = graft.Graft.table(spark, dir, "embeddings")
    val out = graft.datapipe.Ann.semanticDedupBounded(
      e, "vec_id", "embedding", k = 4, iters = 1, threshold = 0.4,
      maxCell = 64, maxDepth = 1)
    val p = plan(out)
    assert(!p.contains("CartesianProduct"), s"cross join:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"nested-loop join:\n$p")
  }

  test("metric sink envelopes are shuffle-free projections") {
    // hecMetric + sematextLine: per-row body builders must never
    // exchange — at 100 TB the sink batch grouping is the ONLY shuffle
    // a metric sink pays
    val m = graft.Graft.table(spark, dir, "events").select(
      col("event_type").as("name"), lit("app").as("namespace"),
      lit("incremental").as("kind"), lit("counter").as("value_type"),
      col("value").as("counter_value"),
      map(lit("env"), lit("prod")).as("tags"), col("ts"))
    val hec = m.select(graft.sinks.Envelopes.hecMetric(m).as("l"))
    val sem = m.select(
      graft.sinks.Envelopes.sematextLine(m, "t", "ns").as("l"))
    Seq(hec, sem).foreach { df =>
      val p = plan(df)
      // the only allowed exchange is Graft.table's small-fixture
      // round-robin parallelism floor (scan-side; never fires at scale)
      assert(!p.contains("hashpartitioning"), s"envelope shuffles:\n$p")
      assert(!p.contains("rangepartitioning"), s"envelope sorts:\n$p")
      assert(!p.contains("Join"), s"sink envelope joins:\n$p")
      assert(!p.contains("Aggregate"), s"sink envelope aggregates:\n$p")
    }
  }

  test("datadog v2/sketch fragments are shuffle-free projections") {
    // DdMetrics series + sketch encode: per-row protobuf fragment
    // builders must never exchange — the sink's batch POST grouping is
    // the only work beyond the scan at 100 TB
    val m = graft.Graft.table(spark, dir, "events").select(
      col("event_type").as("name"), lit("app").as("namespace"),
      lit("incremental").as("kind"), lit("counter").as("value_type"),
      col("value").as("counter_value"),
      map(lit("env"), lit("prod")).as("tags"), col("ts"))
    val d = m.withColumn("value_type", lit("distribution"))
      .withColumn("dist_samples", array(struct(
        col("counter_value").as("value"), lit(2L).as("rate"))))
    val series = m.select(
      graft.sinks.DdMetrics.seriesFragment(m).as("b"))
    val sketch = d.select(
      graft.sinks.DdMetrics.sketchFragment(d).as("b"))
    Seq(series, sketch).foreach { df =>
      val p = plan(df)
      assert(!p.contains("hashpartitioning"), s"fragment shuffles:\n$p")
      assert(!p.contains("Join"), s"fragment joins:\n$p")
      assert(!p.contains("Aggregate"), s"fragment aggregates:\n$p")
    }
  }

  test("datadog trace fragments project; APM stats = ONE keyed agg") {
    val e = graft.Graft.table(spark, dir, "events")
    val span = struct(
      lit("svc").as("service"), col("event_type").as("name"),
      lit("r").as("resource"), col("event_id").as("trace_id"),
      col("event_id").as("span_id"), lit(0L).as("parent_id"),
      (unix_micros(col("ts")) * 1000).as("start_ns"),
      lit(5L).as("duration"), lit(0L).as("error"),
      map().cast("map<string,string>").as("meta"),
      map(lit("_top_level"), lit(1.0)).as("metrics"),
      lit("web").as("span_type"))
    val traces = e.select(lit("h").as("host"), lit("prod").as("env"),
      array(span).as("spans"))
    val cfg = graft.sinks.DdTraces.Config("http://x", "k")
    val frag = traces.select(
      graft.sinks.DdTraces.traceFragment(traces, cfg).as("b"))
    val fp = plan(frag)
    assert(!fp.contains("hashpartitioning"), s"trace frag shuffles:\n$fp")
    assert(!fp.contains("Join") && !fp.contains("Aggregate"),
      s"trace frag joins/aggs:\n$fp")
    // APM stats: explode + exactly one keyed aggregation — the grouped
    // result is bounded by key cardinality, not event count, so the
    // driver-side StatsPayload export stays bounded at any input scale
    val sp = plan(graft.sinks.DdTraces.apmStats(traces, cfg))
    assert(sp.contains("Generate"), s"no explode in apm stats:\n$sp")
    // exactly one keyed exchange (the groupBy); the other exchange in
    // the fixture plan is Graft.table's round-robin parallelism floor
    val keyedExchanges = sp.split("hashpartitioning").length - 1
    assert(keyedExchanges == 1, s"apm stats needs exactly 1 keyed exchange:\n$sp")
    assert(!sp.contains("Join"), s"apm stats joins:\n$sp")
  }

  test("memory kv lookup compiles to a literal-map projection") {
    val kv = new graft.enrich.MemoryKv()
    kv.put("alice", "\"x\"")
    graft.functions.VrlCompiler.filterTables =
      graft.functions.VrlCompiler.filterTables + ("audit_kv" -> kv)
    import spark.implicits._
    val out = graft.functions.VrlCompiler.run(
      Seq("alice", "bob").toDF("u"),
      """.row = get_enrichment_table_record("audit_kv", {"key": .u})"""
    ).primary
    val p = plan(out)
    assert(!p.contains("Join"), s"kv lookup joins:\n$p")
    assert(!p.contains("hashpartitioning"), s"kv lookup shuffles:\n$p")
  }

  test("object-store sink: partition_by_prefix is the ONLY shuffle") {
    // mirror of ObjectStoreSink.writeBatch's `lines` plan: prefix
    // render + line encode (projection), one repartition(__prefix) so
    // objects scale as prefixes (not tasks × prefixes), local sort
    val base = graft.Graft.table(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val rendered = graft.functions.Template.render(base.schema,
      "type={{ event_type }}/date=%F/")
    val projected = base.select(rendered.as("__prefix"),
      graft.sinks.LineCodec.encode(base, "json").as("__line"))
    val lines = projected.repartition(col("__prefix"))
      .sortWithinPartitions("__prefix")
    val p = plan(lines)
    // formatted mode prints each node twice (tree + detail) — count the
    // "(n) Exchange" detail headers once each
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    val keyed = "hashpartitioning\\(__prefix".r.findAllIn(p).size
    assert(keyed >= 1, s"prefix repartition missing:\n$p")
    // tiny-fixture parallelism floor adds one round-robin before it;
    // nothing else may shuffle
    assert(exchanges <= 2, s"extra exchanges in the sink plan:\n$p")
    assert(!p.contains("Join"), s"sink plan joins:\n$p")
  }

  test("greptimedb row fragments are shuffle-free projections") {
    // GreptimeMetrics.fragment builds one RowInsertRequests proto
    // fragment per metric row — counter, histogram (b-columns +
    // count/sum), summary (p-columns + count/sum), and distribution
    // (R-3 quantile lanes) must all stay row-local: the per-row HOF
    // quantile walks replace what would otherwise be an explode +
    // re-group, so the only shuffle at 100 TB is the transport batching
    val e = graft.Graft.table(spark, dir, "events")
    val base = e.select(
      col("event_type").as("name"), lit("app").as("namespace"),
      lit("absolute").as("kind"),
      when(pmod(col("event_id"), lit(4)) === 0, "counter")
        .when(pmod(col("event_id"), lit(4)) === 1, "histogram")
        .when(pmod(col("event_id"), lit(4)) === 2, "summary")
        .otherwise("distribution").as("value_type"),
      col("value").as("counter_value"),
      array(struct(lit(1.0).as("upper_limit"), lit(2L).as("count")),
        struct(lit(Double.PositiveInfinity).as("upper_limit"),
          lit(1L).as("count"))).as("histo_buckets"),
      array(struct(lit(0.5).as("quantile"), col("value").as("value")))
        .as("summary_quantiles"),
      array(struct(col("value").as("value"), lit(3L).as("rate")))
        .as("dist_samples"),
      lit(3L).as("stat_count"), col("value").as("stat_sum"),
      map(lit("env"), lit("prod")).as("tags"), col("ts"))
    val frag = base.select(graft.sinks.GreptimeMetrics.fragment(base,
      graft.sinks.GreptimeMetrics.Config("http://x")).as("b"))
    val p = plan(frag)
    assert(!p.contains("hashpartitioning"), s"fragment shuffles:\n$p")
    assert(!p.contains("Join"), s"fragment joins:\n$p")
    assert(!p.contains("Aggregate"), s"fragment aggregates:\n$p")
  }

  test("remote_write family fan-out = one explode + one keyed shuffle") {
    // Envelopes.remoteWriteSeries spreads histogram/summary/sketch rows
    // into their exposition lines (one Generate) and groups samples per
    // label set (ONE keyed exchange). A second keyed exchange would
    // double the shuffle volume of every remote-write egress at scale.
    val e = graft.Graft.table(spark, dir, "events")
    val base = e.select(
      concat(lit("ev_"), col("event_type")).as("name"),
      map(lit("host"), pmod(col("user_id"), lit(5)).cast("string"))
        .as("tags"),
      when(pmod(col("event_id"), lit(2)) === 0, "gauge")
        .otherwise("histogram").as("value_type"),
      col("value").as("gauge_value"),
      array(struct(lit(1.0).as("upper_limit"), lit(2L).as("count")),
        struct(lit(Double.PositiveInfinity).as("upper_limit"),
          lit(1L).as("count"))).as("histo_buckets"),
      lit(3L).as("stat_count"), col("value").as("stat_sum"),
      col("ts").as("timestamp"))
    val p = plan(graft.sinks.Envelopes.remoteWriteSeries(base))
    assert(p.contains("Generate"), s"no line fan-out explode:\n$p")
    val keyedExchanges = p.split("hashpartitioning").length - 1
    assert(keyedExchanges == 1,
      s"remote_write needs exactly 1 keyed exchange, got $keyedExchanges:\n$p")
    assert(!p.contains("Join"), s"remote_write joins:\n$p")
  }

  test("top_k transform: global form is TakeOrderedAndProject (bounded " +
      "heaps, never a full sort); per-key form has no global ordering") {
    def topo(body: String) =
      s"""
        |sources:
        |  events:
        |    type: parquet
        |    table: events
        |transforms:
        |  t:
        |    type: top_k
        |    inputs: [events]
        |$body
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [t]
        |""".stripMargin
    // global top-k at 100 TB must be per-partition heaps + one k-row
    // driver merge — a global range-exchange sort would shuffle the
    // whole table to rank it
    val g = ConfigLoader.load(spark,
      topo("    k: 5\n    by: [\"-value\", event_id]"), dir).sink("out")
    val pg = plan(g)
    assert(pg.contains("TakeOrderedAndProject"),
      s"global top_k is not TakeOrderedAndProject:\n$pg")
    assert(!pg.toLowerCase.contains("rangepartitioning"),
      s"global top_k range-shuffles:\n$pg")
    // per-key: one hash exchange for the window, no range exchange
    val k = ConfigLoader.load(spark,
      topo("    k: 3\n    per: [event_type]\n    by: [\"-value\"]"), dir)
      .sink("out")
    val pk = plan(k)
    assert(pk.toLowerCase.contains("hashpartitioning") &&
      !pk.toLowerCase.contains("rangepartitioning"),
      s"per-key top_k plans a global sort:\n$pk")
  }

  test("set_op union_distinct: ONE keyed exchange with partial " +
      "aggregation (map-side combine), no join") {
    val yaml =
      """
        |sources:
        |  events:
        |    type: parquet
        |    table: events
        |transforms:
        |  x:
        |    type: set_op
        |    op: union_distinct
        |    inputs: [events, events]
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [x]
        |""".stripMargin
    val df = ConfigLoader.load(spark, yaml, dir).sink("out")
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"distinct has no partial aggregate:\n$p")
    assert(!p.contains("Join"), s"union_distinct joins:\n$p")
  }

  test("join transform: broadcast-hash when hinted; one keyed exchange " +
      "per side otherwise") {
    // hinted (`broadcast: right` in transform_join's YAML): the fact
    // side must NOT shuffle — at 100 TB the dimension broadcast is the
    // difference between a local hash probe and an exabyte exchange
    val df = graft.SparkEntry.queries("transform_join")(spark, dir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"hinted join does not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"hinted join shuffled or went cartesian:\n$p")

    // un-hinted, auto-broadcast forced off (as it would be for two big
    // sides): a co-partitioned shuffle join — exactly one
    // requirements-driven exchange per side, never a nested loop
    val yaml =
      """
        |sources:
        |  orders:
        |    type: parquet
        |    table: orders
        |  customers:
        |    type: parquet
        |    table: customer
        |transforms:
        |  j:
        |    type: join
        |    inputs: [orders, customers]
        |    left_on: [o_custkey]
        |    right_on: [c_custkey]
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [j]
        |""".stripMargin
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = scala.util.Try(spark.conf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .filter(_ != null)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val big = ConfigLoader.load(spark, yaml, dir).sink("out")
      val p2 = plan(big)
      assert(p2.contains("SortMergeJoin") || p2.contains("ShuffledHashJoin"),
        s"un-hinted join is not a shuffle join:\n$p2")
      val keyed = p2.split("ENSURE_REQUIREMENTS").length - 1
      assert(keyed == 2,
        s"expected exactly 2 keyed exchanges (one per side), got $keyed:\n$p2")
      assert(!p2.contains("CartesianProduct") &&
        !p2.contains("BroadcastNestedLoopJoin"),
        s"un-hinted join degenerated:\n$p2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      prevAqe match {
        case Some(v) => spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset(
          "spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("metric egress runs on native expressions inside codegen — " +
      "no Scala UDF lane survives on the sketch path") {
    // the r14 ports: toSketch/sketchQs/proto encode are native
    // expressions whose generated code is a single kernel call, so the
    // egress projection must (a) show the expressions by name, (b)
    // contain NO ScalaUDF on the sketch path, (c) keep a whole-stage
    // codegen span. A regression to a UDF re-pays a Catalyst<->Scala
    // conversion per row (measured 10-18x by the egress_udfs probe).
    val e = graft.Graft.table(spark, dir, "events")
    val d = e.select(
      col("event_type").as("name"), lit("distribution").as("value_type"),
      map(lit("env"), lit("prod")).as("tags"), col("ts"),
      array(struct(col("value").as("value"), lit(2L).as("rate")))
        .as("dist_samples"))
    val frag = d.select(graft.sinks.DdMetrics.sketchFragment(d).as("b"))
    val p = plan(frag)
    assert(p.contains("to_agent_sketch"), s"no native sketch expr:\n$p")
    assert(p.contains("proto_encode"), s"no native proto encode:\n$p")
    assert(!p.contains("UDF"), s"a UDF lane survives on the sketch path:\n$p")
    assert(codegenSubtrees(frag) >= 1, "sketch fragment fell out of codegen")

    // decode side: the OTLP flatten must use the native proto_decode
    val bytes = graft.codecs.ProtobufCodec.encodeTo(
      graft.codecs.ProtobufCodec.Otlp.ExportLogsServiceRequest,
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(Seq.empty),
        graft.codecs.ProtobufCodec.Otlp.ExportLogsServiceRequest.sparkType))
    // non-foldable input (a literal would constant-fold the whole
    // flatten into a LocalTableScan and audit nothing)
    val in = e.limit(4).select(
      when(col("event_id").isNotNull, lit(bytes)).as("value"))
    val flat = graft.streaming.StreamRunner.OtlpFlatten.logs(in, col("value"))
    val pd = plan(flat)
    assert(pd.contains("proto_decode"), s"no native proto decode:\n$pd")
    assert(codegenSubtrees(flat) >= 1, "otlp flatten fell out of codegen")
  }
}

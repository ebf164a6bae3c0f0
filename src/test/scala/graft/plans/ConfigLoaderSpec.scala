package graft.plans

import graft.SparkSpec

/** Behavior-YAML runner spec — files follow the reference's published
  * unit-test format (tests/behavior/transforms/{filter,remap,dedupe,
  * route}.yaml shape: insert_at / extract_from / no_outputs_from with
  * VRL conditions; src/unit_test.rs:163).
  */
class ConfigLoaderSpec extends SparkSpec {

  private def runAll(yaml: String): Unit = {
    val results = ConfigLoader.runBehavior(spark, yaml)
    assert(results.nonEmpty)
    val failed = results.filterNot(_.passed)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.failures.mkString("; ")}").mkString("\n"))
  }

  test("filter behavior: vrl conditions pass/drop events") {
    runAll(
      """
        |transforms:
        |  keep_high:
        |    inputs: ["ignored"]
        |    type: "filter"
        |    condition:
        |      type: "vrl"
        |      source: |
        |        v = .value
        |        v > 100
        |tests:
        |  - name: "passes above threshold"
        |    inputs:
        |      - insert_at: "keep_high"
        |        type: "log"
        |        log_fields:
        |          message: "m1"
        |          value: 150
        |    outputs:
        |      - extract_from: "keep_high"
        |        conditions:
        |          - type: "vrl"
        |            source: '.message == "m1" && .value == 150'
        |  - name: "drops below threshold"
        |    no_outputs_from:
        |      - "keep_high"
        |    inputs:
        |      - insert_at: "keep_high"
        |        type: "log"
        |        log_fields:
        |          message: "m2"
        |          value: 10
        |""".stripMargin)
  }

  test("remap behavior: assignment, abort flags") {
    runAll(
      """
        |transforms:
        |  set_fields:
        |    inputs: []
        |    type: remap
        |    source: |
        |      .tag = upcase(.message) + "!"
        |      .n = .value * 2
        |  abort_drop:
        |    inputs: []
        |    type: remap
        |    drop_on_abort: true
        |    source: |
        |      .foo = false
        |      abort
        |  abort_forward:
        |    inputs: []
        |    type: remap
        |    drop_on_abort: false
        |    source: |
        |      .foo = false
        |      abort
        |tests:
        |  - name: "assignments apply"
        |    inputs:
        |      - insert_at: "set_fields"
        |        type: log
        |        log_fields:
        |          message: "hi"
        |          value: 21
        |    outputs:
        |      - extract_from: "set_fields"
        |        conditions:
        |          - type: vrl
        |            source: '.tag == "HI!" && .n == 42'
        |  - name: "abort with drop_on_abort drops"
        |    no_outputs_from: ["abort_drop"]
        |    inputs:
        |      - insert_at: "abort_drop"
        |        type: log
        |        log_fields:
        |          message: "x"
        |  - name: "abort without drop forwards the unmodified event"
        |    inputs:
        |      - insert_at: "abort_forward"
        |        type: log
        |        log_fields:
        |          message: "x"
        |    outputs:
        |      - extract_from: "abort_forward"
        |        conditions:
        |          - type: vrl
        |            source: '.message == "x" && is_null(.foo)'
        |""".stripMargin)
  }

  test("dedupe behavior: first event per match key wins") {
    runAll(
      """
        |transforms:
        |  dd:
        |    inputs: []
        |    type: "dedupe"
        |    fields:
        |      match:
        |        - "a"
        |tests:
        |  - name: "duplicate key collapses to first"
        |    inputs:
        |      - insert_at: "dd"
        |        type: "log"
        |        log_fields:
        |          a: 1
        |          b: 2
        |      - insert_at: "dd"
        |        type: "log"
        |        log_fields:
        |          a: 1
        |          b: 3
        |      - insert_at: "dd"
        |        type: "log"
        |        log_fields:
        |          a: 2
        |          b: 4
        |    outputs:
        |      - extract_from: "dd"
        |        conditions:
        |          - type: "vrl"
        |            source: ".a == 1 && .b == 2"
        |      - extract_from: "dd"
        |        conditions:
        |          - type: "vrl"
        |            source: ".a == 2 && .b == 4"
        |""".stripMargin)
  }

  test("route behavior: every-match ports + chained transform") {
    runAll(
      """
        |transforms:
        |  rt:
        |    inputs: []
        |    type: "route"
        |    route:
        |      hot: '.level == "error"'
        |      big: ".size > 100"
        |  tag_hot:
        |    inputs: ["rt.hot"]
        |    type: remap
        |    source: |
        |      .via = "hot"
        |tests:
        |  - name: "event routed to both matching ports"
        |    inputs:
        |      - insert_at: "rt"
        |        type: log
        |        log_fields:
        |          level: "error"
        |          size: 150
        |    outputs:
        |      - extract_from: "rt.hot"
        |        conditions:
        |          - type: vrl
        |            source: '.level == "error"'
        |      - extract_from: "rt.big"
        |        conditions:
        |          - type: vrl
        |            source: ".size == 150"
        |      - extract_from: "tag_hot"
        |        conditions:
        |          - type: vrl
        |            source: '.via == "hot"'
        |  - name: "no match lands on _unmatched only"
        |    no_outputs_from: ["rt.hot", "rt.big"]
        |    inputs:
        |      - insert_at: "rt"
        |        type: log
        |        log_fields:
        |          level: "info"
        |          size: 5
        |    outputs:
        |      - extract_from: "rt._unmatched"
        |        conditions:
        |          - type: vrl
        |            source: '.level == "info"'
        |""".stripMargin)
  }

  test("type assertions: string!/int! error-drop under drop_on_error") {
    runAll(
      """
        |transforms:
        |  norm:
        |    inputs: []
        |    type: remap
        |    drop_on_error: true
        |    source: |
        |      .msg = upcase(string!(.message))
        |      .n2 = int!(.n) * 2
        |tests:
        |  - name: "assertions pass on matching types"
        |    inputs:
        |      - insert_at: "norm"
        |        type: log
        |        log_fields:
        |          message: "hello"
        |          n: 21
        |    outputs:
        |      - extract_from: "norm"
        |        conditions:
        |          - type: vrl
        |            source: '.msg == "HELLO" && .n2 == 42'
        |  - name: "string! on a non-string drops the event"
        |    no_outputs_from: ["norm"]
        |    inputs:
        |      - insert_at: "norm"
        |        type: log
        |        log_fields:
        |          message: 5
        |          n: 1
        |""".stripMargin)
  }

  test("full topology from YAML builds one plan per sink") {
    val built = ConfigLoader.load(spark,
      """
        |sources:
        |  events:
        |    type: parquet
        |    table: events
        |transforms:
        |  enrich:
        |    type: remap
        |    inputs: [events]
        |    source: |
        |      .sev = if .event_type == "error" { 3 } else { 6 }
        |  errors_only:
        |    type: filter
        |    inputs: [enrich]
        |    condition: '.sev == 3'
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [errors_only]
        |""".stripMargin,
      "/root/testdata/sf0.001")
    val rows = built.sink("out").count()
    assert(rows == 201) // error-typed events at sf0.001
  }

  test("join transform: kinds, key forms, right_prefix, errors") {
    val dir = "/root/testdata/sf0.001"
    def topo(body: String) =
      s"""
        |sources:
        |  orders:
        |    type: parquet
        |    table: orders
        |  customers:
        |    type: parquet
        |    table: customer
        |transforms:
        |  solvent:
        |    type: filter
        |    inputs: [customers]
        |    condition: '.c_acctbal > 0.0'
        |  j:
        |    type: join
        |    inputs: [orders, solvent]
        |$body
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [j]
        |""".stripMargin
    val keys = "    left_on: [o_custkey]\n    right_on: [c_custkey]\n"
    val nOrders = graft.Graft.table(spark, dir, "orders").count()
    // ground truth from a direct join, computed outside the loader
    val solventKeys = graft.Graft.table(spark, dir, "customer")
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 0.0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val matched = graft.Graft.table(spark, dir, "orders")
      .select("o_custkey").collect()
      .count(r => solventKeys(r.getLong(0))).toLong

    // inner drops orders of filtered-out customers
    val inner = ConfigLoader.load(spark, topo(keys + "    kind: inner"), dir)
      .sink("out")
    assert(inner.count() == matched)
    // left keeps every order, right columns NULL where unmatched
    val left = ConfigLoader.load(spark, topo(keys + "    kind: left"), dir)
      .sink("out")
    assert(left.count() == nOrders)
    assert(left.filter(org.apache.spark.sql.functions.col("c_name").isNull)
      .count() == nOrders - matched)
    // left_anti = exactly the unmatched orders, left columns only
    val anti = ConfigLoader.load(spark,
      topo(keys + "    kind: left_anti"), dir).sink("out")
    assert(anti.count() == nOrders - matched)
    assert(!anti.columns.contains("c_name"))
    // right_prefix renames non-key right columns (key stays addressable)
    val pfx = ConfigLoader.load(spark,
      topo(keys + "    kind: inner\n    right_prefix: cust_"), dir)
      .sink("out")
    assert(pfx.columns.contains("cust_c_name") &&
      pfx.columns.contains("c_custkey") && !pfx.columns.contains("c_name"))
    // `on:` form — same-named key columns created by upstream remaps
    val onForm = ConfigLoader.load(spark,
      """
        |sources:
        |  orders:
        |    type: parquet
        |    table: orders
        |  customers:
        |    type: parquet
        |    table: customer
        |transforms:
        |  lkey:
        |    type: remap
        |    inputs: [orders]
        |    source: |
        |      .custkey = .o_custkey
        |  rkey:
        |    type: remap
        |    inputs: [customers]
        |    source: |
        |      .custkey = .c_custkey
        |  j:
        |    type: join
        |    inputs: [lkey, rkey]
        |    on: [custkey]
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [j]
        |""".stripMargin, dir).sink("out")
    assert(onForm.count() == nOrders)

    // config errors surface at load, with the component named
    def loadErr(body: String): String =
      intercept[IllegalArgumentException] {
        ConfigLoader.load(spark, topo(body), dir)
      }.getMessage
    assert(loadErr(keys + "    kind: sideways").contains("unknown kind"))
    assert(loadErr("    kind: inner").contains("left_on"))
    assert(loadErr(keys + "    broadcast: both").contains("broadcast"))
    val arity = intercept[IllegalArgumentException] {
      ConfigLoader.load(spark,
        """
          |sources:
          |  orders:
          |    type: parquet
          |    table: orders
          |transforms:
          |  j:
          |    type: join
          |    inputs: [orders]
          |    on: [o_custkey]
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [j]
          |""".stripMargin, dir)
    }
    assert(arity.getMessage.contains("exactly two inputs"))
  }

  test("join transform: collision check, metadata dedup, self-join, " +
      "unusable broadcast hints") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    // same-named non-key columns without right_prefix → named error at
    // build (not a downstream ambiguity surprise). Both sides are
    // events-shaped, so every column collides.
    def selfTopo(extra: String) =
      s"""
        |sources:
        |  events:
        |    type: parquet
        |    table: events
        |transforms:
        |  errs:
        |    type: filter
        |    inputs: [events]
        |    condition: '.event_type == "error"'
        |  j:
        |    type: join
        |    inputs: [events, errs]
        |    left_on: [event_id]
        |    right_on: [event_id]
        |$extra
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [j]
        |""".stripMargin
    val dup = intercept[IllegalArgumentException] {
      ConfigLoader.load(spark, selfTopo("    kind: inner"), dir)
    }
    assert(dup.getMessage.contains("right_prefix"))
    // with the prefix, the SELF-join (both inputs resolve to the same
    // upstream scan) builds and binds each key to its own side — the
    // shared key name is prefixed too, so no ambiguous duplicate
    val self = ConfigLoader.load(spark,
      selfTopo("    kind: inner\n    right_prefix: r_"), dir).sink("out")
    assert(self.columns.contains("r_event_id") &&
      self.columns.count(_ == "event_id") == 1)
    val nErr = graft.Graft.table(spark, dir, "events")
      .filter(col("event_type") === "error").count()
    assert(self.count() == nErr)
    // semi/anti joins emit no right columns → no collision check needed
    val semi = ConfigLoader.load(spark, selfTopo("    kind: left_semi"), dir)
      .sink("out")
    assert(semi.count() == nErr)
    // the loader's per-source provenance stamp (source_type) sits on
    // both sides of every join; the LEFT event's copy wins instead of
    // the check demanding a prefix for it (transform_join's shape)
    val enriched = ConfigLoader.load(spark,
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
        |""".stripMargin, dir).sink("out")
    assert(enriched.columns.count(_ == "source_type") == 1)
    // a broadcast hint Spark cannot honor (the preserved side of an
    // outer/semi/anti join can't be the hash build side) is rejected
    // at load instead of silently degrading to a shuffle
    def hintErr(extra: String): String =
      intercept[IllegalArgumentException] {
        ConfigLoader.load(spark, selfTopo(extra), dir)
      }.getMessage
    assert(hintErr("    kind: left\n    broadcast: left\n    right_prefix: r_")
      .contains("cannot apply"))
    assert(hintErr("    kind: full\n    broadcast: right\n    right_prefix: r_")
      .contains("cannot apply"))
    assert(hintErr(
      "    kind: left_anti\n    broadcast: left\n    right_prefix: r_")
      .contains("cannot apply"))
  }

  test("sort / top_k / set_op transforms: semantics and load errors") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    def topo(body: String, in: String = "events") =
      s"""
        |sources:
        |  events:
        |    type: parquet
        |    table: events
        |transforms:
        |$body
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [$in]
        |""".stripMargin
    // global sort: total order, descending with '-' prefix
    val sorted = ConfigLoader.load(spark, topo(
      """  s:
        |    type: sort
        |    inputs: [events]
        |    by: ["-value", "event_id"]""".stripMargin, "s"), dir)
      .sink("out").select("value").collect().map(_.getDouble(0))
    assert(sorted.length > 0 && sorted.sameElements(sorted.sortBy(-_)))
    // within_key: rows of one key are contiguous and ordered, and the
    // plan has NO global range exchange (the scale point of the form)
    val keyed = ConfigLoader.load(spark, topo(
      """  s:
        |    type: sort
        |    inputs: [events]
        |    by: ["-value"]
        |    within_key: [user_id]""".stripMargin, "s"), dir).sink("out")
    assert(!keyed.queryExecution.executedPlan.toString
      .toLowerCase.contains("rangepartitioning"))
    val rows = keyed.select("user_id", "value").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(0) == b.getLong(0))
        assert(a.getDouble(1) >= b.getDouble(1))
      case _ =>
    }
    // every key's rows are contiguous in the output
    val order = rows.map(_.getLong(0)).toSeq
    assert(order.foldLeft((Set.empty[Long], Option.empty[Long], true)) {
      case ((seen, prev, ok), k) =>
        if (prev.contains(k)) (seen, prev, ok)
        else (seen + k, Some(k), ok && !seen(k))
    }._3, "a key's rows are not contiguous")
    // global top_k equals orderBy+limit ground truth
    val topG = ConfigLoader.load(spark, topo(
      """  t:
        |    type: top_k
        |    inputs: [events]
        |    k: 5
        |    by: ["-value", "event_id"]""".stripMargin, "t"), dir)
      .sink("out").select("event_id").collect().map(_.getLong(0)).toSet
    val want = graft.Graft.table(spark, dir, "events")
      .orderBy(col("value").desc, col("event_id")).limit(5)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(topG == want)
    // per-key top_k: every group capped at k
    val topP = ConfigLoader.load(spark, topo(
      """  t:
        |    type: top_k
        |    inputs: [events]
        |    k: 2
        |    per: [event_type]
        |    by: ["-value", "event_id"]""".stripMargin, "t"), dir)
      .sink("out")
    assert(topP.groupBy("event_type").count()
      .filter(col("count") > 2).count() == 0)
    // set_op arity + option validation, named errors
    def err(body: String, in: String = "x"): String =
      intercept[IllegalArgumentException] {
        ConfigLoader.load(spark, topo(body, in), dir)
      }.getMessage
    assert(err(
      """  x:
        |    type: set_op
        |    op: xor
        |    inputs: [events, events]""".stripMargin).contains("unknown op"))
    assert(err(
      """  x:
        |    type: set_op
        |    op: intersect
        |    inputs: [events]""".stripMargin).contains("two inputs"))
    assert(err(
      """  x:
        |    type: set_op
        |    op: union_distinct
        |    all: true
        |    inputs: [events, events]""".stripMargin).contains("union_distinct"))
    assert(err(
      """  x:
        |    type: sort
        |    inputs: [events]""".stripMargin).contains("by"))
    assert(err(
      """  x:
        |    type: top_k
        |    inputs: [events]
        |    by: [value]""".stripMargin).contains("k"))
    // exceptAll keeps duplicate multiplicity (all: true): the implicit
    // fan-in union gives every row multiplicity 2; subtracting one copy
    // leaves exactly one per row. union_distinct collapses the same
    // fan-in back to one copy.
    val nEvents = graft.Graft.table(spark, dir, "events").count()
    val exAll = ConfigLoader.load(spark, topo(
      """  c1:
        |    type: filter
        |    inputs: [events]
        |    condition: 'true'
        |  c2:
        |    type: filter
        |    inputs: [events]
        |    condition: 'true'
        |  both:
        |    type: filter
        |    inputs: [c1, c2]
        |    condition: 'true'
        |  x:
        |    type: set_op
        |    op: except
        |    all: true
        |    inputs: [both, events]""".stripMargin, "x"), dir).sink("out")
    assert(exAll.count() == nEvents)
    val uniq = ConfigLoader.load(spark, topo(
      """  c1:
        |    type: filter
        |    inputs: [events]
        |    condition: 'true'
        |  c2:
        |    type: filter
        |    inputs: [events]
        |    condition: 'true'
        |  both:
        |    type: filter
        |    inputs: [c1, c2]
        |    condition: 'true'
        |  x:
        |    type: set_op
        |    op: union_distinct
        |    inputs: [both, events]""".stripMargin, "x"), dir).sink("out")
    assert(uniq.count() == nEvents)
  }

  test("dedup_lsh transform: emits, knob threading, load errors") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    def topo(extra: String): String =
      s"""
        |sources:
        |  docs:
        |    type: parquet
        |    table: documents
        |transforms:
        |  nd:
        |    type: dedup_lsh
        |    inputs: [docs]
        |    id_field: doc_id
        |$extra
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [nd]
        |""".stripMargin
    val docs = graft.Graft.table(spark, dir, "documents")
    val pairs = graft.datapipe.Dedup.minhashLsh(docs, "doc_id", col("text"))
    // pairs emit matches the direct API call
    val yPairs = ConfigLoader.load(spark, topo("    emit: pairs"), dir)
      .sink("out").select("id_a", "id_b")
    assert(yPairs.exceptAll(pairs.select("id_a", "id_b")).count() == 0)
    assert(pairs.select("id_a", "id_b").exceptAll(yPairs).count() == 0)
    // survivors = docs minus non-canonical cluster members; every id in
    // a verified pair loses all but its cluster's lowest id
    val labels = graft.datapipe.Dedup.connectedComponents(
      docs.select(col("doc_id").as("id")), pairs.select("id_a", "id_b"))
    val wantKeep = labels.filter(col("id") === col("comp")).count()
    val surv = ConfigLoader.load(spark, topo("    emit: survivors"), dir)
      .sink("out")
    assert(surv.count() == wantKeep)
    assert(surv.columns.contains("text")) // passthrough keeps all columns
    // clusters emit: one row per doc, keep marks the canonical member,
    // and the knobs (auto max_bucket, pinned fat_index, hint_rows)
    // thread through without changing this corpus's output
    val clus = ConfigLoader.load(spark, topo(
      """    emit: clusters
        |    max_bucket: -1
        |    fat_index: false
        |    hint_rows: 1000""".stripMargin), dir).sink("out")
    assert(clus.count() == docs.count())
    assert(clus.filter(col("keep")).count() == wantKeep)
    // named load errors
    def err(extra: String, drop: String = ""): String =
      intercept[IllegalArgumentException] {
        ConfigLoader.load(spark,
          topo(extra).replace(drop, ""), dir).sink("out").count()
      }.getMessage
    // method: ngram swaps in the exact PPJoin pair generator
    val yNgram = ConfigLoader.load(spark, topo(
      """    emit: pairs
        |    method: ngram""".stripMargin), dir)
      .sink("out").select("id_a", "id_b")
    val wantNgram = graft.datapipe.Dedup
      .ngramJaccardPrefix(docs, "doc_id", col("text"))
      .select("id_a", "id_b")
    assert(yNgram.exceptAll(wantNgram).count() == 0)
    assert(wantNgram.exceptAll(yNgram).count() == 0)
    assert(err("    emit: nope").contains("unknown emit"))
    assert(err("    method: cosine").contains("unknown method"))
    assert(err("    num_hashes: 10\n    bands: 3").contains("multiple"))
    assert(err("    threshold: 1.5").contains("threshold"))
    assert(err("    emit: pairs", drop = "    id_field: doc_id\n")
      .contains("id_field"))
    assert(err("    text_field: no_such_column").contains("no_such_column"))
  }

  test("datapipe transforms at the YAML surface: quality_gate, " +
      "pii_redact, chunk, dedup_exact, decontaminate") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def topo(transforms: String, last: String): String =
      s"""
        |sources:
        |  docs:
        |    type: parquet
        |    table: documents
        |transforms:
        |$transforms
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [$last]
        |""".stripMargin
    def run(transforms: String, last: String) =
      ConfigLoader.load(spark, topo(transforms, last), dir).sink("out")
    val docs = graft.Graft.table(spark, dir, "documents")

    // quality_gate: each rules mode matches the direct API
    val gGopher = run(
      """  g:
        |    type: quality_gate
        |    inputs: [docs]
        |    rules: gopher""".stripMargin, "g")
    val wantGopher = graft.datapipe.QualityRules
      .gopherMetrics(docs, col("text")).filter(col("gopher_pass")).count()
    assert(gGopher.count() == wantGopher)
    assert(gGopher.columns.contains("text") &&
      !gGopher.columns.contains("gopher_pass")) // pass keeps original shape
    val gAnn = run(
      """  g:
        |    type: quality_gate
        |    inputs: [docs]
        |    rules: heuristic
        |    emit: annotate""".stripMargin, "g")
    assert(gAnn.count() == docs.count())
    assert(gAnn.columns.contains("quality"))
    val gC4 = run(
      """  g:
        |    type: quality_gate
        |    inputs: [docs]
        |    rules: c4
        |    min_sentences: 1""".stripMargin, "g")
    // c4 pass mode REPLACES text with the cleaned text
    val wantC4 = graft.datapipe.QualityRules
      .c4Metrics(docs, col("text"), minSentences = 1)
      .filter(col("c4_pass"))
    assert(gC4.count() == wantC4.count())
    if (gC4.count() > 0)
      assert(gC4.select("text").exceptAll(
        wantC4.select(col("clean_text").as("text"))).count() == 0)

    // pii_redact: in-place redact matches Pii.redact; stats appends
    val scrubbed = run(
      """  p:
        |    type: pii_redact
        |    inputs: [docs]""".stripMargin, "p")
    assert(scrubbed.select("text").exceptAll(
      docs.select(graft.datapipe.Pii.redact(col("text")).as("text")))
      .count() == 0)
    val pStats = run(
      """  p:
        |    type: pii_redact
        |    inputs: [docs]
        |    emit: stats""".stripMargin, "p")
    assert(pStats.columns.contains("n_pii") &&
      pStats.columns.contains("redacted"))

    // chunk: text replaced by the chunk, ordinal appended, other
    // columns pass through; total chunks match the direct API
    val chunks = run(
      """  c:
        |    type: chunk
        |    inputs: [docs]
        |    size: 100
        |    overlap: 20""".stripMargin, "c")
    val wantChunks = docs.select(explode(
      graft.datapipe.TextAnalysis.chunks(col("text"), 100, 20))).count()
    assert(chunks.count() == wantChunks)
    assert(chunks.columns.contains("chunk_id") &&
      chunks.columns.contains("doc_id"))

    // dedup_exact: survivors + dups partition the corpus; dups carry
    // their canonical id
    val dups = run(
      """  d:
        |    type: dedup_exact
        |    inputs: [docs]
        |    id_field: doc_id
        |    emit: dups""".stripMargin, "d")
    val surv = run(
      """  d:
        |    type: dedup_exact
        |    inputs: [docs]
        |    id_field: doc_id""".stripMargin, "d")
    assert(dups.count() + surv.count() == docs.count())
    assert(dups.columns.contains("dup_of"))
    assert(dups.filter(col("dup_of") >= col("doc_id")).count() == 0)

    // decontaminate: clean + flagged partition the corpus; benchmark
    // docs flag themselves
    val deconTopo =
      """  bench:
        |    type: filter
        |    inputs: [docs]
        |    condition: mod(.doc_id, 97) == 0
        |  clean:
        |    type: decontaminate
        |    inputs: [docs, bench]
        |    id_field: doc_id
        |    ngram: 8""".stripMargin
    val clean = run(deconTopo, "clean")
    val ann = run(deconTopo.replace("    ngram: 8",
      "    ngram: 8\n    emit: annotate"), "clean")
    assert(ann.count() == docs.count())
    val flagged = ann.filter(col("contaminated") === 1).count()
    assert(clean.count() == docs.count() - flagged)
    assert(flagged >= docs.filter(pmod(col("doc_id"), lit(97)) === 0).count())

    // named load errors
    def err(transforms: String, last: String): String =
      intercept[IllegalArgumentException] {
        run(transforms, last).count()
      }.getMessage
    assert(err(
      """  g:
        |    type: quality_gate
        |    inputs: [docs]
        |    rules: fancy""".stripMargin, "g").contains("unknown rules"))
    assert(err(
      """  c:
        |    type: chunk
        |    inputs: [docs]
        |    size: 100
        |    overlap: 100""".stripMargin, "c").contains("overlap"))
    assert(err(
      """  d:
        |    type: dedup_exact
        |    inputs: [docs]""".stripMargin, "d").contains("id_field"))
    assert(err(
      """  x:
        |    type: decontaminate
        |    inputs: [docs]
        |    id_field: doc_id""".stripMargin, "x")
      .contains("exactly two inputs"))
    assert(err(
      """  p:
        |    type: pii_redact
        |    inputs: [docs]
        |    text_field: nope""".stripMargin, "p").contains("nope"))
  }

  test("curation stages: min_line_words agreement, reserved-name " +
      "collisions fail fast, chunk survives pos/col inputs") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def topo(pre: String, transforms: String, last: String): String =
      s"""
        |sources:
        |  docs:
        |    type: parquet
        |    table: documents
        |transforms:
        |$pre$transforms
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [$last]
        |""".stripMargin
    def run(transforms: String, last: String, pre: String = "") =
      ConfigLoader.load(spark, topo(pre, transforms, last), dir).sink("out")
    val docs = graft.Graft.table(spark, dir, "documents")

    // a non-default min_line_words drives BOTH the pass decision and
    // the emitted text (the r15 bug: the decision used the default, so
    // a 2-word-line doc passed min_line_words=5 judgment and failed).
    // The sf documents carry no punctuation, so synthesize lines: even
    // ids get a 2-word sentence that only survives min_line_words<=2.
    val punct =
      """  pre:
        |    type: remap
        |    inputs: [docs]
        |    source: |
        |      .text = if mod(.doc_id, 2) == 0 { "one two." } else { "alpha beta gamma delta epsilon zeta." }
        |""".stripMargin
    val gC4 = run(
      """  g:
        |    type: quality_gate
        |    inputs: [pre]
        |    rules: c4
        |    min_sentences: 1
        |    min_line_words: 2""".stripMargin, "g", pre = punct)
    // with the threshold honored everywhere, every doc passes and the
    // emitted text is the original sentence; the buggy form dropped the
    // even ids (decision at the default threshold) entirely
    assert(gC4.count() == docs.count())
    assert(gC4.filter(col("text") === "one two.").count() ==
      docs.filter(pmod(col("doc_id"), lit(2)) === 0).count())

    // an input already carrying a reserved metric column fails fast
    // instead of being silently recomputed/overwritten
    val renameNw =
      """  pre:
        |    type: remap
        |    inputs: [docs]
        |    source: .n_words = 1
        |""".stripMargin
    val e1 = intercept[IllegalArgumentException] {
      run("""  g:
        |    type: quality_gate
        |    inputs: [pre]
        |    rules: gopher""".stripMargin, "g", pre = renameNw).count()
    }
    assert(e1.getMessage.contains("n_words") &&
      e1.getMessage.contains("reserved"))

    // chunk: an input column literally named `pos` or `col` passes
    // through untouched (posexplode's defaults used to collide)
    val withPos =
      """  pre:
        |    type: remap
        |    inputs: [docs]
        |    source: |
        |      .pos = 7
        |      .col = "keep"
        |""".stripMargin
    val chunks = run(
      """  c:
        |    type: chunk
        |    inputs: [pre]
        |    size: 100
        |    overlap: 20""".stripMargin, "c", pre = withPos)
    assert(chunks.columns.count(_ == "pos") == 1)
    assert(chunks.filter(col("pos") =!= 7).count() == 0)
    assert(chunks.filter(col("col") =!= "keep").count() == 0)
    assert(chunks.columns.contains("chunk_id"))
    val e2 = intercept[IllegalArgumentException] {
      run("""  c:
        |    type: chunk
        |    inputs: [c0]
        |    size: 100
        |    overlap: 20""".stripMargin, "c",
        pre = """  c0:
        |    type: chunk
        |    inputs: [docs]
        |    size: 200
        |    overlap: 0
        |""".stripMargin).count()
    }
    assert(e2.getMessage.contains("chunk_id"))

    // decontaminate exact_confirm at the YAML surface: same rows out
    // as the hash-only pass at this scale (no collisions at sf0.001)
    val deconTopo =
      """  clean:
        |    type: decontaminate
        |    inputs: [docs, bench]
        |    id_field: doc_id
        |    ngram: 8""".stripMargin
    val benchPre =
      """  bench:
        |    type: filter
        |    inputs: [docs]
        |    condition: mod(.doc_id, 97) == 0
        |""".stripMargin
    val clean = run(deconTopo, "clean", pre = benchPre)
    val confirmed = run(deconTopo + "\n    exact_confirm: true",
      "clean", pre = benchPre)
    assert(clean.select("doc_id").exceptAll(
      confirmed.select("doc_id")).count() == 0)
    assert(clean.count() == confirmed.count())
  }

  test("pack_sequences / shard_assign / semantic_dedup at the YAML " +
      "surface: direct-API parity, bounded method, named errors") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def topo(src: String, transforms: String, last: String): String =
      s"""
        |sources:
        |  in:
        |    type: parquet
        |    table: $src
        |transforms:
        |$transforms
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [$last]
        |""".stripMargin
    def run(src: String, transforms: String, last: String) =
      ConfigLoader.load(spark, topo(src, transforms, last), dir).sink("out")
    val docs = graft.Graft.table(spark, dir, "documents")
    val vecs = graft.Graft.table(spark, dir, "embeddings")

    // pack_sequences: every input column survives, pack columns match
    // the direct API at identical conf
    val packed = run("documents",
      """  p:
        |    type: pack_sequences
        |    inputs: [in]
        |    id_field: doc_id
        |    seq_len: 128
        |    buckets: 8""".stripMargin, "p")
    val wantPack = graft.datapipe.Packing.pack(docs, col("doc_id"),
      size(graft.datapipe.Dedup.tokens(col("text"))), seqLen = 128,
      buckets = 8)
    assert(packed.count() == docs.count())
    assert(packed.select("doc_id", "offset", "first_seq").exceptAll(
      wantPack.select("doc_id", "offset", "first_seq")).count() == 0)

    // shard_assign: parity with the direct API
    val sharded = run("documents",
      """  sh:
        |    type: shard_assign
        |    inputs: [in]
        |    key_field: doc_id
        |    shards: 4""".stripMargin, "sh")
    val wantShard = graft.datapipe.Shards.assign(docs, col("doc_id"), 4)
    assert(sharded.select("doc_id", "shard", "pos").exceptAll(
      wantShard.select("doc_id", "shard", "pos")).count() == 0)

    // semantic_dedup survivors + cells agree; bounded method keeps a
    // subset-or-equal survivor set with the same threshold semantics
    val surv = run("embeddings",
      """  sd:
        |    type: semantic_dedup
        |    inputs: [in]
        |    id_field: vec_id
        |    threshold: 0.4
        |    k: 4
        |    emit: survivors""".stripMargin, "sd")
    val cells = run("embeddings",
      """  sd:
        |    type: semantic_dedup
        |    inputs: [in]
        |    id_field: vec_id
        |    threshold: 0.4
        |    k: 4
        |    emit: cells""".stripMargin, "sd")
    assert(cells.count() == vecs.count())
    assert(cells.filter(col("keep")).count() == surv.count())
    // original shape (the YAML parquet source adds its source_type tag)
    assert(vecs.columns.toSet.subsetOf(surv.columns.toSet))
    assert(!surv.columns.contains("cell") && !surv.columns.contains("keep"))
    val bounded = run("embeddings",
      """  sd:
        |    type: semantic_dedup
        |    inputs: [in]
        |    id_field: vec_id
        |    threshold: 0.4
        |    k: 4
        |    method: bounded
        |    max_cell: 64""".stripMargin, "sd")
    assert(bounded.count() > 0 && bounded.count() <= vecs.count())

    // ann: brute matches the direct API; lsh/ivf return k-bounded,
    // rank-ordered rows per query
    val annTopo =
      """  probes:
        |    type: filter
        |    inputs: [in]
        |    condition: .vec_id < 5
        |  nn:
        |    type: ann
        |    inputs: [in, probes]
        |    id_field: vec_id
        |    k: 3
        |    method: METHOD""".stripMargin
    val brute = run("embeddings", annTopo.replace("METHOD", "brute"), "nn")
    val wantNn = graft.datapipe.Ann.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
    assert(brute.select("query_id", "rank", "nn_id").exceptAll(
      wantNn.select("query_id", "rank", "nn_id")).count() == 0)
    Seq("lsh", "ivf").foreach { m =>
      val out = run("embeddings", annTopo.replace("METHOD", m), "nn")
      val perQ = out.groupBy("query_id").count().collect()
      assert(perQ.nonEmpty && perQ.forall(_.getLong(1) <= 3), m)
      assert(out.filter(col("rank") > 3).count() == 0, m)
    }

    // named errors
    def err(src: String, transforms: String, last: String): String =
      intercept[IllegalArgumentException] {
        run(src, transforms, last).count()
      }.getMessage
    assert(err("embeddings",
      """  nn:
        |    type: ann
        |    inputs: [in]
        |    id_field: vec_id""".stripMargin, "nn")
      .contains("exactly two inputs"))
    assert(err("documents",
      """  p:
        |    type: pack_sequences
        |    inputs: [in]
        |    id_field: doc_id
        |    seq_len: 0""".stripMargin, "p").contains("seq_len"))
    assert(err("documents",
      """  sh:
        |    type: shard_assign
        |    inputs: [in]""".stripMargin, "sh").contains("key_field"))
    assert(err("embeddings",
      """  sd:
        |    type: semantic_dedup
        |    inputs: [in]
        |    id_field: vec_id
        |    threshold: 1.5""".stripMargin, "sd").contains("threshold"))
    assert(err("embeddings",
      """  sd:
        |    type: semantic_dedup
        |    inputs: [in]
        |    id_field: vec_id
        |    method: bounded
        |    emit: cells""".stripMargin, "sd").contains("cells"))
  }

  private def resourceYaml(name: String): String = {
    val in = getClass.getResourceAsStream(s"/behavior/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("reference reduce.yaml behavior file passes as published") {
    // verbatim clone of the reference's own test suite for the reduce
    // transform: default strategies, merge_strategies incl. array
    // concat, ends_when/starts_when segmentation (ruby/java exception
    // grouping, line continuation/termination, log streams)
    runAll(resourceYaml("reduce.yaml"))
  }

  test("reference filter.yaml behavior file passes as published") {
    // VRL conditions with leading statements, is_metric conditions, and
    // metric-typed inserted events (.tags.message addressing)
    runAll(resourceYaml("filter.yaml"))
  }

  test("reference route.yaml behavior file passes as published") {
    // named ports (foo.first/…), an is_log route arm, and a downstream
    // transform chained off a port
    runAll(resourceYaml("route.yaml"))
  }

  test("reference task_transform.yaml behavior file passes as published") {
    // multi-input fan-in into dedupe and reduce; assert_eq! conditions
    runAll(resourceYaml("task_transform.yaml"))
  }

  test("reference remap_with_drop.yaml behavior file passes as published") {
    // abort + reroute_dropped: primary silent, `droptest.dropped` port
    // carries the original event
    runAll(resourceYaml("remap_with_drop.yaml"))
  }

  /** Point `file:` programs / `enrichment_tables:` CSVs at the cloned
    * reference fixtures (tests/data/…) for the duration of `body`.
    */
  private def withBehaviorData(body: => Unit): Unit = {
    val prev = ConfigLoader.behaviorRoot
    ConfigLoader.behaviorRoot =
      getClass.getResource("/behavior-data").getPath
    try body finally ConfigLoader.behaviorRoot = prev
  }

  test("reference remap.yaml behavior file passes as published") {
    // the reference's largest behavior file (90 tests): index-path and
    // quoted-path assignment, scalar/object/map whole-event assignment,
    // exact VRL error-message strings with source spans, enrichment
    // table lookups, `file:` programs, metric-event remapping, and the
    // long tail of stdlib functions
    withBehaviorData { runAll(resourceYaml("remap.yaml")) }
  }

  test("reference vrl_test_input.yaml behavior file passes as published") {
    // `type: vrl` inputs (the event is the result of a VRL program) and
    // the `%` metadata root — scalar whole-event round-trips through
    // `.event = .`
    runAll(resourceYaml("vrl_test_input.yaml"))
  }

  test("reference example.vrl test file passes as published (vrl crate format)") {
    // lib/vector-vrl/tests/tests/example.vrl: `# object:` input event,
    // `# result:` expected event, program returns `.`
    val in = getClass.getResourceAsStream("/behavior-data/tests/vrl/example.vrl")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val (actual, expected) = graft.VrlTool.runTestFile(spark, text)
    assert(actual == expected)
  }

  test("reference formats/simple.{yaml,yml,json} behavior files pass as published") {
    // the three config FORMATS of the same nested-assignment test — the
    // JSON variant parses through the same loader (JSON ⊂ YAML)
    runAll(resourceYaml("formats/simple.yaml"))
    runAll(resourceYaml("formats/simple.yml"))
    runAll(resourceYaml("formats/simple.json"))
  }

  test("aws_secrets_manager backend resolves over the amz-json protocol") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var sawTarget: String = null
    @volatile var sawBody: String = null
    server.createContext("/", ex => {
      sawTarget = ex.getRequestHeaders.getFirst("X-Amz-Target")
      sawBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val resp = ("""{"ARN":"arn:aws:secretsmanager:x","Name":"s",""" +
        """"SecretString":"{\"api_token\":\"s3cr3t-tok\"}"}""")
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val yaml =
        s"""
          |secret:
          |  awssm:
          |    type: aws_secrets_manager
          |    secret_id: prod/pipeline
          |    endpoint: http://127.0.0.1:${server.getAddress.getPort}/
          |sources:
          |  in: {type: parquet, table: events}
          |transforms:
          |  up:
          |    type: remap
          |    inputs: [in]
          |    source: |
          |      .token = "SECRET[awssm.api_token]"
          |sinks:
          |  sm_out: {type: memory, inputs: [up]}
          |""".stripMargin
      val resolved = ConfigLoader.interpolateSecrets(yaml)
      assert(resolved.contains(""".token = "s3cr3t-tok""""))
      assert(sawTarget == "secretsmanager.GetSecretValue")
      assert(sawBody.contains(""""SecretId":"prod/pipeline""""))
    } finally server.stop(0)
  }

  test("reference config/secret.yaml behavior file passes as published") {
    // SECRET[backend.key] interpolation over the raw config text: test /
    // exec (process protocol shim) / file (JSON) / directory (nested
    // paths + trailing-whitespace trim) backends
    withBehaviorData { runAll(resourceYaml("config/secret.yaml")) }
  }

  test("geoip enrichment table from YAML: VRL ip lookup on a real mmdb") {
    // write a spec-conformant MaxMind db with the micro writer, point a
    // `type: geoip` enrichment table at it, and look up through VRL —
    // the full reference path (geoip.rs + enrichment.cue) end to end
    val db = graft.enrich.Mmdb.build(Seq(
      "10.0.0.0/8" -> Map[String, Any](
        "autonomous_system_number" -> 64512L,
        "autonomous_system_organization" -> "Alpha Net"),
      "203.0.113.0/24" -> Map[String, Any](
        "autonomous_system_number" -> 64513L,
        "autonomous_system_organization" -> "Doc Net")),
      databaseType = "GeoLite2-ASN")
    val f = java.nio.file.Files.createTempFile("micro", ".mmdb")
    java.nio.file.Files.write(f, db)
    try runAll(
      s"""
        |enrichment_tables:
        |  geo:
        |    type: geoip
        |    path: ${f.toString}
        |transforms:
        |  enrich:
        |    inputs: []
        |    type: remap
        |    source: |
        |      rec = get_enrichment_table_record("geo", {"ip": .ip})
        |      .asn = rec.autonomous_system_number
        |      .org = rec.autonomous_system_organization
        |      .net = rec.network
        |tests:
        |  - name: "hit inside 203.0.113.0/24"
        |    inputs:
        |      - insert_at: enrich
        |        type: log
        |        log_fields:
        |          ip: "203.0.113.77"
        |    outputs:
        |      - extract_from: enrich
        |        conditions:
        |          - type: vrl
        |            source: '.asn == 64513 && .org == "Doc Net" && .net == "203.0.113.0/24"'
        |  - name: "miss yields nulls"
        |    inputs:
        |      - insert_at: enrich
        |        type: log
        |        log_fields:
        |          ip: "198.51.100.1"
        |    outputs:
        |      - extract_from: enrich
        |        conditions:
        |          - type: vrl
        |            source: '.asn == null && .org == null'
        |""".stripMargin)
    finally java.nio.file.Files.delete(f)
  }

  test("reference dedupe.yaml behavior file passes as published") {
    // nested match paths incl. a row whose `a.b` is a SCALAR while other
    // rows nest `a.b.c` — the input builder degrades the column to
    // variant and Dedupe keys on the variant path's canonical JSON
    runAll(resourceYaml("dedupe.yaml"))
  }

  test("reference lua_v1.yaml behavior file passes as published") {
    // unversioned + version-1 lua scripts: multiple assignment over the
    // `event` global (micro-Lua interpreter, operators/Lua.scala)
    runAll(resourceYaml("lua_v1.yaml"))
  }

  test("reference lua_v2.yaml behavior file passes as published") {
    // v2 process hooks (inline + named-in-source), log field edits,
    // metric counter arithmetic, and log<->metric type conversions
    runAll(resourceYaml("lua_v2.yaml"))
  }

  test("behavior suite inventory: every cloned reference file runs — zero skips") {
    // self-reporting coverage of tests/behavior/: all TEN of the
    // reference's behavior files execute verbatim (the lua pair joined
    // in round 8 via the micro-Lua interpreter)
    val runnable = Seq("reduce.yaml", "filter.yaml", "route.yaml",
      "task_transform.yaml", "remap_with_drop.yaml", "remap.yaml",
      "dedupe.yaml", "vrl_test_input.yaml", "lua_v1.yaml", "lua_v2.yaml")
    runnable.foreach { f =>
      assert(getClass.getResourceAsStream(s"/behavior/$f") != null,
        s"behavior file $f not cloned into test resources")
    }
    val report = runnable.map(f => s"$f: RUN")
    info(report.mkString("\n"))
    assert(report.size == 10)
  }

  test("run: log_schema global renames the standard event keys") {
    // lib/vector-core/src/config/log_schema.rs — message_key/host_key
    // renames apply to every log source's standard columns
    val dir = java.nio.file.Files.createTempDirectory("lscfg")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "hello world\n".getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("lswork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |log_schema:
        |  message_key: msg
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .msg = upcase!(.msg)
        |sinks:
        |  lstap:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val rows = spark.table("lstap").collect()
      assert(rows.nonEmpty)
      assert(rows.head.schema.fieldNames.contains("msg"))
      assert(rows.map(_.getAs[String]("msg")).toSet == Set("HELLO WORLD"))
    } finally running.stopAll()
  }

  test("run: file source tails a growing file across micro-batches") {
    // `type: file` + path = the REAL tail (fingerprint/rotation/
    // checkpoint FileTail, src/sources/file.rs semantics), reachable
    // straight from a config file
    val dir = java.nio.file.Files.createTempDirectory("tailcfg")
    val log = dir.resolve("app.log")
    java.nio.file.Files.write(log, "one\ntwo\n".getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("tailwork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .message = upcase!(.message)
        |sinks:
        |  tap2:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      assert(running.tails.nonEmpty)
      running.processAllAvailable()
      val batch1 = spark.table("tap2").collect()
        .map(_.getAs[String]("message")).toSet
      assert(batch1 == Set("ONE", "TWO"))
      // second micro-batch: append to the same file — the tail resumes
      // from its per-fingerprint offset, no re-read of old lines
      java.nio.file.Files.write(log, "three\n".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      running.processAllAvailable()
      val batch2 = spark.table("tap2").collect()
        .map(_.getAs[String]("message")).sorted.toSeq
      // exact multiset: growth past the fingerprint window must migrate
      // the offset, not re-emit the file from byte 0
      assert(batch2 == Seq("ONE", "THREE", "TWO"))
    } finally running.stopAll()
  }

  test("run: streaming throttle uses the GCRA kernel from a YAML config") {
    // a live (file-tail) source through `type: throttle` — the loader
    // dispatches to the flatMapGroupsWithState GCRA kernel; all six
    // lines share one key and an identical event time, so exactly
    // `threshold` of them conform (cold-start burst)
    val dir = java.nio.file.Files.createTempDirectory("thrcfg")
    java.nio.file.Files.write(dir.resolve("a.log"),
      (1 to 6).map(i => s"line$i").mkString("", "\n", "\n").getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("thrwork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  limited:
        |    type: throttle
        |    inputs: [logs]
        |    threshold: 3
        |    window_secs: 10
        |sinks:
        |  tap3:
        |    type: memory
        |    inputs: [limited]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("tap3").count() == 3L)
    } finally running.stopAll()
  }

  /** Retry `f` until it passes or the deadline expires — for sinks fed
    * by timeout-flushed kernels (aggregate/line_agg), whose rows land a
    * flush interval after the sources drain.
    */
  private def eventually[T](deadlineMs: Long = 30000)(f: => T): T = {
    val end = System.nanoTime + deadlineMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime < end) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  private def tailConfig(lines: Seq[String], transformYaml: String,
                         sink: String): ConfigLoader.RunningConfig = {
    val dir = java.nio.file.Files.createTempDirectory("strmcfg")
    java.nio.file.Files.write(dir.resolve("a.log"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("strmwork").toString
    ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |$transformYaml
        |sinks:
        |  $sink:
        |    type: memory
        |    inputs: [last]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
  }

  test("run: streaming line_agg groups multiline logs with timeout flush") {
    // halt_before ^START: the first group flushes when START b arrives;
    // the OPEN group [START b, tail] only exists because of the
    // reference's timeout flush (line_agg.rs:49-58) — unreachable in
    // the batch window form
    val running = tailConfig(
      Seq("START a", "  frame1", "  frame2", "START b", "  tail"),
      """
        |transforms:
        |  last:
        |    type: line_agg
        |    inputs: [logs]
        |    mode: halt_before
        |    condition_pattern: "^START"
        |    timeout_ms: 500
        |""".stripMargin, "tap5")
    try {
      running.processAllAvailable()
      eventually() {
        val msgs = spark.table("tap5").collect()
          .map(_.getAs[String]("message")).toSet
        assert(msgs == Set("START a\n  frame1\n  frame2", "START b\n  tail"))
      }
    } finally running.stopAll()
  }

  test("run: streaming aggregate flushes per-series sums every interval") {
    val running = tailConfig(
      Seq("1", "2", "3.5"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .val = to_float!(.message)
        |  last:
        |    type: aggregate
        |    inputs: [vals]
        |    mode: sum
        |    interval_ms: 600
        |    group_by: [file]
        |    value_field: val
        |""".stripMargin, "tap6")
    try {
      running.processAllAvailable()
      eventually() {
        val rows = spark.table("tap6").collect()
        assert(rows.nonEmpty)
        assert(rows.map(_.getAs[Double]("value")).sum == 6.5)
        assert(rows.map(_.getAs[Long]("n_events")).sum == 3L)
      }
    } finally running.stopAll()
  }

  test("run: event_time aggregate closes watermarked windows on late-data bounds") {
    // events at t=100s and t=200s land in the [0, 3600) window; the
    // t=7300s event pushes the watermark past that window's end, so
    // append mode emits it — the LAST window stays open (correct
    // watermark semantics; the reference can't express this at all,
    // its windows are processing-time only)
    val running = tailConfig(
      Seq("100", "200", "7300"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .val = to_float!(.message)
        |      .event_ts = from_unix_timestamp!(to_int!(.message))
        |  last:
        |    type: aggregate
        |    inputs: [vals]
        |    mode: sum
        |    interval_ms: 3600000
        |    value_field: val
        |    event_time:
        |      timestamp_field: event_ts
        |      watermark: "0 seconds"
        |""".stripMargin, "tap_et")
    try {
      running.processAllAvailable()
      eventually() {
        val rows = spark.table("tap_et").collect()
        assert(rows.length == 1, rows.mkString(","))
        assert(rows.head.getAs[Double]("value") == 300.0)
        assert(rows.head.getAs[Long]("n_events") == 2L)
        assert(rows.head.getAs[java.sql.Timestamp]("window_start")
          .toInstant.getEpochSecond == 0L)
      }
    } finally running.stopAll()
  }

  test("run: file source multiline block aggregates at the source") {
    // the file source's embedded multiline: config (src/sources/file.rs)
    // — java-style stack traces group under their leading line without
    // a separate transform
    val dir = java.nio.file.Files.createTempDirectory("mlcfg")
    java.nio.file.Files.write(dir.resolve("app.log"),
      ("ERROR boom\n  at a.b\n  at c.d\nINFO fine\nERROR again\n  at e.f\n")
        .getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("mlwork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |    multiline:
        |      mode: halt_before
        |      start_pattern: '^\\S'
        |      timeout_ms: 500
        |sinks:
        |  ml_tap:
        |    type: memory
        |    inputs: [logs]
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    try eventually() {
      running.processAllAvailable()
      val got = spark.table("ml_tap").collect()
        .map(_.getAs[String]("message")).toSet
      assert(got == Set(
        "ERROR boom\n  at a.b\n  at c.d",
        "INFO fine",
        "ERROR again\n  at e.f"))
    } finally running.stopAll()
  }

  test("run: encoding only_fields/except_fields/timestamp_format transform the sink input") {
    val tmp = java.nio.file.Files.createTempDirectory("encwork").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: parquet
        |    table: events
        |sinks:
        |  enc_only:
        |    type: memory
        |    inputs: [in]
        |    encoding:
        |      only_fields: [event_id, event_type]
        |  enc_except:
        |    type: memory
        |    inputs: [in]
        |    encoding:
        |      except_fields: [props]
        |      timestamp_format: unix_ms
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    try {
      val only = spark.table("enc_only")
      assert(only.columns.toSeq == Seq("event_id", "event_type"))
      val except = spark.table("enc_except")
      assert(!except.columns.contains("props"))
      // ts became a unix-ms long
      assert(except.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      val ms = except.orderBy("event_id").head().getAs[Long]("ts")
      assert(ms > 1600000000000L && ms < 2000000000000L)
    } finally running.stopAll()
    // mutual exclusion is validated at load
    intercept[IllegalArgumentException] {
      ConfigLoader.run(spark,
        """
          |sources:
          |  in: {type: parquet, table: events}
          |sinks:
          |  bad:
          |    type: memory
          |    inputs: [in]
          |    encoding:
          |      only_fields: [event_id]
          |      except_fields: [props]
          |""".stripMargin, "/root/testdata/sf0.001",
        java.nio.file.Files.createTempDirectory("encbad").toString)
    }
  }

  test("run: event_time aggregate mode latest keeps the last sample, not the sum") {
    // two samples in the [0, 3600) window (100@t=100, 200@t=200); the
    // t=7300 sample closes it. latest must emit 200.0 — a sum would be
    // 300.0 (the round-8 defect: latest silently collapsed to sum)
    val running = tailConfig(
      Seq("100", "200", "7300"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .val = to_float!(.message)
        |      .event_ts = from_unix_timestamp!(to_int!(.message))
        |  last:
        |    type: aggregate
        |    inputs: [vals]
        |    mode: latest
        |    interval_ms: 3600000
        |    value_field: val
        |    event_time:
        |      timestamp_field: event_ts
        |      watermark: "0 seconds"
        |""".stripMargin, "tap_et_latest")
    try {
      running.processAllAvailable()
      eventually() {
        val rows = spark.table("tap_et_latest").collect()
        assert(rows.length == 1, rows.mkString(","))
        assert(rows.head.getAs[Double]("value") == 200.0)
        assert(rows.head.getAs[Long]("n_events") == 2L)
      }
    } finally running.stopAll()
  }

  test("run: event_time aggregate mode diff emits last-minus-first by event time") {
    val running = tailConfig(
      Seq("50", "200", "7300"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .val = to_float!(.message)
        |      .event_ts = from_unix_timestamp!(to_int!(.message))
        |  last:
        |    type: aggregate
        |    inputs: [vals]
        |    mode: diff
        |    interval_ms: 3600000
        |    value_field: val
        |    event_time:
        |      timestamp_field: event_ts
        |      watermark: "0 seconds"
        |""".stripMargin, "tap_et_diff")
    try {
      running.processAllAvailable()
      eventually() {
        val rows = spark.table("tap_et_diff").collect()
        assert(rows.length == 1, rows.mkString(","))
        assert(rows.head.getAs[Double]("value") == 150.0)
      }
    } finally running.stopAll()
  }

  test("run: streaming incremental_to_absolute keeps a per-series running sum") {
    val running = tailConfig(
      Seq("1", "2", "3"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .val = to_float!(.message)
        |  last:
        |    type: incremental_to_absolute
        |    inputs: [vals]
        |    group_by: [file]
        |    value_field: val
        |""".stripMargin, "tap7")
    try {
      running.processAllAvailable()
      eventually() {
        val sums = spark.table("tap7").collect()
          .map(_.getAs[Double]("val")).sorted.toSeq
        assert(sums == Seq(1.0, 3.0, 6.0))
      }
    } finally running.stopAll()
  }

  test("run: streaming window emits lookback context around a trigger") {
    val running = tailConfig(
      Seq("a", "b", "c", "TRIG", "d", "e"),
      """
        |transforms:
        |  last:
        |    type: window
        |    inputs: [logs]
        |    flush_when: .message == "TRIG"
        |    num_events_before: 2
        |    num_events_after: 1
        |""".stripMargin, "tap8")
    try {
      running.processAllAvailable()
      eventually() {
        val msgs = spark.table("tap8").collect()
          .map(_.getAs[String]("message")).toSet
        assert(msgs == Set("b", "c", "TRIG", "d"))
      }
    } finally running.stopAll()
  }

  test("run: streaming count-mode sample keeps 1-in-rate per key") {
    val running = tailConfig(
      (1 to 7).map(i => s"line$i"),
      """
        |transforms:
        |  last:
        |    type: sample
        |    inputs: [logs]
        |    rate: 3
        |    group_by: file
        |""".stripMargin, "tap9")
    try {
      running.processAllAvailable()
      // 7 events, 1-in-3 counter: ceil(7/3) = 3 kept (which three
      // depends on intra-batch iterator order — count is deterministic)
      assert(spark.table("tap9").count() == 3L)
    } finally running.stopAll()
  }

  test("run: streaming tag_cardinality_limit drops events past the limit") {
    val dir = java.nio.file.Files.createTempDirectory("tclcfg")
    val log = dir.resolve("a.log")
    java.nio.file.Files.write(log, "x\ny\n".getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("tclwork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  last:
        |    type: tag_cardinality_limit
        |    inputs: [logs]
        |    tag: message
        |    value_limit: 2
        |    limit_exceeded_action: drop_event
        |sinks:
        |  tap10:
        |    type: memory
        |    inputs: [last]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      // x and y claim both slots in batch 1 (deterministic: the only
      // two values); batch 2's z exceeds and drops, repeats of x pass
      java.nio.file.Files.write(log, "z\nx\n".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      running.processAllAvailable()
      val msgs = spark.table("tap10").collect()
        .map(_.getAs[String]("message")).sorted.toSeq
      assert(msgs == Seq("x", "x", "y"))
    } finally running.stopAll()
  }

  test("run: streaming reduce sessions merge per key and flush on ends_when + expiry") {
    // two sessions: "a b END" closes via ends_when (concat message,
    // numeric val sums); the trailing "tail" session only flushes via
    // the expire_after_ms timeout — the cross-micro-batch state the
    // batch window form cannot hold
    val running = tailConfig(
      Seq("a 1", "b 2", "END 3", "tail 4"),
      """
        |transforms:
        |  vals:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      parts = split!(.message, " ")
        |      .word = parts[0]
        |      .val = to_float!(parts[1])
        |  last:
        |    type: reduce
        |    inputs: [vals]
        |    group_by: [file]
        |    ends_when: .word == "END"
        |    expire_after_ms: 800
        |    merge_strategies:
        |      word: concat
        |""".stripMargin, "tap11")
    try {
      running.processAllAvailable()
      eventually() {
        val rows = spark.table("tap11").collect()
          .map(r => (r.getAs[String]("word"), r.getAs[Double]("val"),
            r.getAs[Long]("n_events"))).sortBy(_._1)
        assert(rows.toSeq == Seq(("a b END", 6.0, 3L), ("tail", 4.0, 1L)))
      }
    } finally running.stopAll()
  }

  test("run: spark block switches kernel state to the RocksDB store") {
    // `spark: {state_store: rocksdb}` applies the provider conf before
    // the queries start — same GCRA behavior, state on executor disk
    // (the 100 TB posture for state that outgrows heap)
    val dir = java.nio.file.Files.createTempDirectory("rockscfg")
    java.nio.file.Files.write(dir.resolve("a.log"),
      (1 to 6).map(i => s"line$i").mkString("", "\n", "\n").getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("rockswork").toString
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    val running = ConfigLoader.run(spark,
      s"""
        |spark:
        |  state_store: rocksdb
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  limited:
        |    type: throttle
        |    inputs: [logs]
        |    threshold: 3
        |    window_secs: 10
        |sinks:
        |  tap12:
        |    type: memory
        |    inputs: [limited]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      running.processAllAvailable()
      assert(spark.table("tap12").count() == 3L)
    } finally {
      running.stopAll()
      prev match {
        case Some(p) => spark.conf
          .set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf
          .unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("run: streaming dedupe uses the TTL first-seen kernel from YAML") {
    // six tailed lines collapse to three by message: the loader routes
    // streaming inputs to the flatMapGroupsWithState first-seen kernel
    val dir = java.nio.file.Files.createTempDirectory("ddpcfg")
    java.nio.file.Files.write(dir.resolve("a.log"),
      Seq("x", "y", "x", "z", "y", "x").mkString("", "\n", "\n").getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("ddpwork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  uniq:
        |    type: dedupe
        |    inputs: [logs]
        |    fields:
        |      match: [message]
        |sinks:
        |  tap4:
        |    type: memory
        |    inputs: [uniq]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("tap4").select("message").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("x", "y", "z"))
    } finally running.stopAll()
  }

  test("run: demo_logs streaming source -> remap -> memory sink") {
    val tmp = java.nio.file.Files.createTempDirectory("cfgrun").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: demo_logs
        |    format: json
        |    interval: 0.01
        |transforms:
        |  parse:
        |    type: remap
        |    inputs: [in]
        |    source: |
        |      .j = parse_json!(.message)
        |      .host = to_string(.j.host) ?? ""
        |      .seq = to_int(.j.seq) ?? -1
        |sinks:
        |  tap:
        |    type: memory
        |    inputs: [parse]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      assert(running.queries.keySet == Set("tap"))
      // rate source: let a few ticks land, then drain
      Thread.sleep(1500)
      running.processAllAvailable()
      val got = spark.table("tap")
      assert(got.columns.contains("host") && got.columns.contains("seq"))
      val rows = got.collect()
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[String]("host").startsWith("host")))
      assert(rows.forall(_.getAs[Long]("seq") >= 0L))
    } finally running.stopAll()
  }

  test("run: batch source through a parquet sink writes files") {
    val tmp = java.nio.file.Files.createTempDirectory("cfgbatch").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  events:
        |    type: parquet
        |transforms:
        |  errs:
        |    type: filter
        |    inputs: [events]
        |    condition: '.event_type == "error"'
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [errs]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    assert(running.queries.isEmpty) // batch: wrote synchronously
    val written = spark.read.parquet(s"$tmp/out")
    assert(written.count() == 201)
  }

  test("run: internal_metrics through a prometheus_exporter sink from YAML") {
    // the full self-observability loop (internal_metrics.rs +
    // sinks/prometheus/exporter.rs): the engine scrapes its own
    // registry, the exporter aggregates and serves exposition text
    val tmp = java.nio.file.Files.createTempDirectory("obswork").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  im:
        |    type: internal_metrics
        |    scrape_interval_secs: 3600
        |    tags:
        |      pid_key: pid
        |sinks:
        |  prom:
        |    type: prometheus_exporter
        |    address: 127.0.0.1:0
        |    inputs: [im]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val port = running.exporters("prom").boundPort
      val body = new String(new java.net.URL(
        s"http://127.0.0.1:$port/metrics").openStream().readAllBytes())
      assert(body.contains("# TYPE vector_uptime_seconds gauge"))
      assert(body.contains("vector_uptime_seconds{"))
      assert(body.contains("host=\""))
      assert(body.contains("pid=\""))
    } finally running.stopAll()
  }

  test("run: opentelemetry OTLP/HTTP source from YAML") {
    import graft.codecs.ProtobufCodec
    import graft.codecs.ProtobufCodec.Otlp
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    val tmp = java.nio.file.Files.createTempDirectory("otlpwork").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  otel:
        |    type: opentelemetry
        |    http:
        |      address: 127.0.0.1:0
        |transforms:
        |  sev:
        |    type: filter
        |    inputs: [otel]
        |    condition: '.severity_number >= 9'
        |sinks:
        |  tap_otlp:
        |    type: memory
        |    inputs: [sev]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      val rec = org.apache.spark.sql.functions.struct(
        lit(1700000000000000000L).as("time_unix_nano"),
        lit(13L).as("severity_number"),
        lit("WARN").as("severity_text"),
        org.apache.spark.sql.functions
          .struct(lit("from yaml").as("string_value")).as("body"),
        lit(null).cast("long").as("dropped_attributes_count"),
        lit(null).cast("binary").as("trace_id"),
        lit(null).cast("binary").as("span_id"),
        lit(null).cast("long").as("observed_time_unix_nano"))
      val envelope = org.apache.spark.sql.functions.struct(
        array(org.apache.spark.sql.functions.struct(
          array(org.apache.spark.sql.functions.struct(
            array(rec).as("log_records"),
            lit("").as("schema_url"))).as("scope_logs"),
          lit("").as("schema_url"))).as("resource_logs"))
      val bytes = Seq(1).toDF("x")
        .select(ProtobufCodec.encode(
          Otlp.ExportLogsServiceRequest, envelope).as("b"))
        .head().getAs[Array[Byte]]("b")
      val conn = new java.net.URL(
        s"http://127.0.0.1:${ConfigLoader.lastOtlpPort}/v1/logs")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(bytes)
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      running.processAllAvailable()
      val rows = spark.table("tap_otlp").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("message") == "from yaml")
      assert(rows(0).getAs[String]("severity_text") == "WARN")
    } finally running.stopAll()
  }

  test("run: opentelemetry named .metrics output feeds a metric pipeline") {
    import org.apache.spark.sql.functions.{array, lit, struct, unhex}
    import graft.codecs.ProtobufCodec
    import graft.codecs.ProtobufCodec.Otlp
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("otlpm").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  otel:
        |    type: opentelemetry
        |    http:
        |      address: 127.0.0.1:0
        |sinks:
        |  tap_otlm:
        |    type: memory
        |    inputs: [otel.metrics]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      val point = struct(
        lit(null).cast("long").as("start_time_unix_nano"),
        lit(1700000000000000000L).as("time_unix_nano"),
        lit(3.25).as("as_double"),
        lit(null).cast("long").as("as_int"),
        lit(null).cast(
          "array<struct<key:string,value:struct<string_value:string>>>")
          .as("attributes"))
      val metric = struct(
        lit("queue_len").as("name"), lit("").as("description"),
        lit("1").as("unit"),
        struct(array(point).as("data_points")).as("gauge"),
        lit(null).cast(Otlp.OtlpSum.sparkType).as("sum"))
      val envelope = struct(array(struct(
        array(struct(array(metric).as("metrics"),
          lit("").as("schema_url"))).as("scope_metrics"),
        lit("").as("schema_url"))).as("resource_metrics"))
      val bytes = Seq(1).toDF("x").select(ProtobufCodec.encode(
          Otlp.ExportMetricsServiceRequest, envelope).as("b"))
        .head().getAs[Array[Byte]]("b")
      val conn = new java.net.URL(
        s"http://127.0.0.1:${ConfigLoader.lastOtlpPort}/v1/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(bytes)
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      running.processAllAvailable()
      val rows = spark.table("tap_otlm").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("name") == "queue_len")
      assert(rows(0).getAs[Double]("gauge_value") == 3.25)
    } finally running.stopAll()
  }

  test("run: host_metrics and static_metrics sources from YAML") {
    val tmp = java.nio.file.Files.createTempDirectory("hmwork").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  hm:
        |    type: host_metrics
        |    collectors: [memory, load]
        |  sm:
        |    type: static_metrics
        |    metrics:
        |      - name: build_info
        |        value:
        |          gauge:
        |            value: 1
        |        tags:
        |          version: "2.0"
        |sinks:
        |  tap_hm:
        |    type: memory
        |    inputs: [hm, sm]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val rows = spark.table("tap_hm").collect()
      val names = rows.map(_.getAs[String]("name")).toSet
      assert(names.contains("memory_total_bytes"))
      assert(names.contains("load1"))
      assert(!names.contains("cpu_seconds_total")) // collector filter held
      val bi = rows.filter(_.getAs[String]("name") == "build_info")
      assert(bi.nonEmpty &&
        bi.head.getAs[Map[String, String]]("tags")("version") == "2.0")
      assert(bi.head.getAs[String]("namespace") == "static")
    } finally running.stopAll()
  }

  test("run: internal_logs source taps process log records from YAML") {
    val tmp = java.nio.file.Files.createTempDirectory("ilwork").toString
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  il:
        |    type: internal_logs
        |transforms:
        |  errs_only:
        |    type: filter
        |    inputs: [il]
        |    condition: '.level == "ERROR" && contains!(.message, "cfg-probe")'
        |sinks:
        |  tap_il:
        |    type: memory
        |    inputs: [errs_only]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      org.apache.logging.log4j.LogManager.getLogger("graft.cfg.probe")
        .error("cfg-probe fired")
      running.processAllAvailable()
      val rows = spark.table("tap_il").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("target") == "graft.cfg.probe")
      assert(rows(0).getAs[Long]("pid") > 0L)
    } finally running.stopAll()
  }

  test("reduce end_every_period_ms segments groups by event-time period") {
    val built = ConfigLoader.load(spark,
      """
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  r:
        |    type: reduce
        |    inputs: [ev]
        |    group_by: [user_id]
        |    end_every_period_ms: 3600000
        |    merge_strategies:
        |      value: sum
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [r]
        |""".stripMargin, "/root/testdata/sf0.001")
    val got = built.sink("out")
    // one output row per (user, hour-bucket); without the period it
    // would be one per user
    val users = graft.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id").distinct().count()
    val buckets = graft.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "floor(unix_millis(ts) / 3600000) AS b")
      .distinct().count()
    assert(got.count() == buckets && buckets > users)
  }

  test("remap files: several programs concatenate in order") {
    val d = java.nio.file.Files.createTempDirectory("remapfiles")
    java.nio.file.Files.write(d.resolve("a.vrl"),
      ".first = 1\n".getBytes("UTF-8"))
    java.nio.file.Files.write(d.resolve("b.vrl"),
      ".second = .first + 1\n".getBytes("UTF-8"))
    val built = ConfigLoader.load(spark,
      s"""
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  rm:
        |    type: remap
        |    inputs: [ev]
        |    files: ["${d.resolve("a.vrl")}", "${d.resolve("b.vrl")}"]
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [rm]
        |""".stripMargin, "/root/testdata/sf0.001")
    val r = built.sink("out").select("first", "second").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
  }

  test("log_to_metric all_metrics: metric-shaped logs convert; bad drop") {
    // to_metrics (log_to_metric.rs): name+kind+one value object per
    // event; malformed events drop rather than poisoning the batch
    val built = ConfigLoader.load(spark,
      """
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  shape:
        |    type: remap
        |    inputs: [ev]
        |    source: |
        |      . = {
        |        "name": "reqs",
        |        "kind": if .event_id % 2 == 0 { "incremental" } else { "bogus" },
        |        "tags": {"etype": .event_type},
        |        "counter": {"value": .value}
        |      }
        |  m:
        |    type: log_to_metric
        |    all_metrics: true
        |    inputs: [shape]
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [m]
        |""".stripMargin, "/root/testdata/sf0.001")
    val rows = built.sink("out")
    val total = graft.Graft.table(spark, "/root/testdata/sf0.001", "events")
      .count()
    assert(rows.count() == total / 2) // odd event_ids dropped (bad kind)
    val r = rows.orderBy("counter_value").head()
    assert(r.getAs[String]("name") == "reqs")
    assert(r.getAs[String]("kind") == "incremental")
    assert(r.getAs[String]("value_type") == "counter")
    assert(r.getAs[Map[String, String]]("tags").contains("etype"))
  }
}

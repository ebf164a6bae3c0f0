package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.enrich.EnrichmentTable
import graft.enrich.EnrichmentTable.{BetweenDates, Equals}

/** Oracle-checked queries for the core transform operators (SURVEY §2.1)
  * and enrichment joins (§2.3). Each query exercises the real operator
  * implementation in graft.operators / graft.enrich.
  */
object TransformQueries {

  import Queries.Q

  private def ev(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")

  // metric stream derived from events: counter per event_type + value gauge
  private def metricsOf(e: DataFrame): DataFrame = {
    LogToMetric(
      e.withColumn("__eid", col("event_id")),
      ts = col("ts"),
      specs = Seq(
        LogToMetric.Counter(lit("events_total"), Seq("type" -> col("event_type"))),
        LogToMetric.Gauge(lit("value_gauge"), Seq("type" -> col("event_type")),
          col("value"))),
      carry = Seq("__eid"))
      .withColumn("type", element_at(col("tags"), "type"))
  }

  val queries: Map[String, Q] = Map(
    "route" -> { (s, dir) =>
      Route.tagged(ev(s, dir), Seq(
          "error" -> (col("event_type") === "error"),
          "high_value" -> (col("value") > 90.0),
          "purchase" -> (col("event_type") === "purchase")))
        .select(col("event_id"), col("route"))
        .orderBy(col("event_id"), col("route"))
    },

    "exclusive_route" -> { (s, dir) =>
      Route.exclusiveTag(ev(s, dir), Seq(
          "error" -> (col("event_type") === "error"),
          "high_value" -> (col("value") > 90.0)))
        .select(col("event_id"), col("route"))
        .orderBy(col("event_id"))
    },

    "sample_hash" -> { (s, dir) =>
      Sample.byKeyMd5(ev(s, dir), col("user_id"), rate16 = 4)
        .select(col("event_id"), col("user_id"), col("sample_rate"))
        .orderBy(col("event_id"))
    },

    "sample_count" -> { (s, dir) =>
      // deterministic 1-in-10 by sequence number (the count-based mode)
      ev(s, dir).filter(pmod(col("event_id"), lit(10)) === 0)
        .withColumn("sample_rate", lit(10))
        .select(col("event_id"), col("event_type"), col("sample_rate"))
        .orderBy(col("event_id"))
    },

    "dedupe" -> { (s, dir) =>
      Dedupe(ev(s, dir).select("event_id", "user_id", "event_type"),
          Seq("user_id", "event_type"), col("event_id"))
        .orderBy(col("event_id"))
    },

    "reduce_merge" -> { (s, dir) =>
      val projected = ev(s, dir).select(
        col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("ft"), col("event_type").as("lt"),
        col("value").as("sv"), col("value").as("mx"),
        col("value").as("mn"), col("value").as("vals"),
        col("event_type").as("types_cat"),
        array(col("event_type")).as("uniq"))
      Reduce(projected, Seq("user_id"),
          Map(
            "ft" -> Reduce.First, "lt" -> Reduce.Last,
            "sv" -> Reduce.Sum, "mx" -> Reduce.Max, "mn" -> Reduce.Min,
            "vals" -> Reduce.ToArray,
            "types_cat" -> Reduce.Concat(" "),
            "uniq" -> Reduce.FlatUnique),
          orderCol = col("event_id"),
          exclude = Seq("event_id"))
        .withColumn("sv", round(col("sv"), 2))
        // arrays stringified for the driver compare (pandas can't sort
        // array cells); fixed 2-decimal formatting is engine-portable
        .withColumn("vals",
          array_join(transform(col("vals"), v => format_string("%.2f", v)), ","))
        .withColumn("uniq", array_join(array_sort(col("uniq")), ","))
        .orderBy(col("user_id"))
    },

    "aggregate_metrics" -> { (s, dir) =>
      val m = metricsOf(ev(s, dir))
        .withColumn("value", coalesce(col("counter_value"), col("gauge_value")))
        .withColumn("v2", col("value") * col("value"))
      import Aggregate._
      // single aggregation: all 7 modes plus the sum-of-squares needed for
      // stdev ride the same shuffle (extraAggs) — no second agg + join
      val df = Aggregate(m, col("ts"), "1 hour", Seq("name", "type"),
        col("value"), col("__eid"), col("kind"),
        Seq("sum_v" -> SumMode, "n" -> CountMode, "max_v" -> MaxMode,
          "min_v" -> MinMode, "latest_v" -> Latest, "diff_v" -> Diff,
          "auto_v" -> Auto),
        extraAggs = Seq(round(sum(col("v2")), 4).as("sum_sq")))
      // mean/stdev from exactly-rounded parts so any engine computes
      // bit-identical doubles (see Queries.scala conventions)
      df.withColumn("sum_v", round(col("sum_v"), 2))
        .withColumn("auto_v", round(col("auto_v"), 2))
        .withColumn("mean_v", col("sum_v") / col("n"))
        .withColumn("stdev_v",
          when(col("n") > 1,
            sqrt((col("sum_sq") - col("sum_v") * col("sum_v") / col("n")) /
              (col("n") - 1))))
        .drop("sum_sq")
        .orderBy(col("window_start"), col("name"), col("type"))
    },

    "throttle" -> { (s, dir) =>
      Throttle(ev(s, dir).select("event_id", "user_id", "ts"),
          key = col("user_id"), ts = col("ts"), windowDuration = "1 day",
          threshold = 5, orderCol = col("event_id"))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    },

    "window_lookback" -> { (s, dir) =>
      WindowLookback(ev(s, dir).select("event_id", "user_id", "event_type"),
          key = col("user_id"), orderCol = col("event_id"),
          flushWhen = col("event_type") === "error",
          numEventsBefore = 2, numEventsAfter = 1)
        .orderBy(col("event_id"))
    },

    "log_to_metric" -> { (s, dir) =>
      metricsOf(ev(s, dir))
        .select(col("__eid").as("event_id"), col("name"), col("kind"),
          col("value_type"),
          coalesce(col("counter_value"), col("gauge_value")).as("val"),
          col("type"))
        .orderBy(col("event_id"), col("name"))
    },

    "metric_to_log" -> { (s, dir) =>
      LogToMetric.metricToLog(
          metricsOf(ev(s, dir)).filter(col("value_type") === "counter"))
        .select(col("__eid").as("event_id"), col("message"))
        .orderBy(col("event_id"))
    },

    "incremental_to_absolute" -> { (s, dir) =>
      IncrementalToAbsolute(
          metricsOf(ev(s, dir))
            .withColumn("value", coalesce(col("counter_value"), col("gauge_value"))),
          seriesKeys = Seq("name", "type"), value = col("value"),
          orderCol = col("__eid"))
        .select(col("__eid").as("event_id"), col("name"), col("type"),
          col("kind"), round(col("abs_value"), 2).as("abs_value"))
        .orderBy(col("event_id"), col("name"))
    },

    // absolute -> incremental normalizer (sink-side metric normalization)
    "metric_normalize" -> { (s, dir) =>
      val gauges = ev(s, dir).select(
        col("event_id"), lit("value_gauge").as("name"),
        col("event_type").as("type"), lit("absolute").as("kind"),
        col("value"))
      IncrementalToAbsolute.absoluteToIncremental(
          gauges, Seq("name", "type"), col("value"), col("event_id"))
        .select(col("event_id"), col("type"), col("kind"),
          round(col("inc_value"), 2).as("inc_value"))
        .orderBy(col("event_id"))
    },

    // schema-less mode: dynamic event body as a Spark 4 VARIANT column
    "vrl_variant" -> { (s, dir) =>
      import graft.model.LogEvent
      val v = LogEvent.fromJson(col("props"))
      ev(s, dir)
        .withColumn("__v", v)
        .select(
          col("event_id"),
          LogEvent.getPath(col("__v"), ".k", "bigint").as("vk"),
          LogEvent.typeOfPath(col("__v"), ".k").as("vk_type"),
          LogEvent.pathExists(col("__v"), ".k").as("has_k"),
          LogEvent.pathExists(col("__v"), ".nope").as("has_nope"))
        .orderBy(col("event_id"))
    },

    "tag_cardinality_limit" -> { (s, dir) =>
      TagCardinalityLimit(ev(s, dir).select("event_id", "user_id", "event_type"),
          tag = "event_type", valueLimit = 2, orderCol = col("event_id"))
        .orderBy(col("event_id"))
    },

    "metric_sketch" -> { (s, dir) =>
      import graft.model.DDSketch
      val sk = DDSketch.agg()
      ev(s, dir).groupBy(col("event_type"))
        .agg(sk(col("value")).as("sketch"))
        .select(
          col("event_type"),
          col("sketch.total").as("n"),
          DDSketch.quantileIdx(col("sketch"), 0.5).as("q50_idx"),
          DDSketch.quantileIdx(col("sketch"), 0.9).as("q90_idx"),
          DDSketch.quantileIdx(col("sketch"), 0.99).as("q99_idx"),
          DDSketch.quantileValue(col("sketch"), 0.5).as("q50"),
          DDSketch.quantileValue(col("sketch"), 0.9).as("q90"))
        .orderBy(col("event_type"))
    },

    "metric_histogram" -> { (s, dir) =>
      import graft.model.Metrics
      val bounds = Seq(10.0, 50.0, 100.0, 200.0)
      ev(s, dir).groupBy(col("event_type"))
        .agg(
          Metrics.histogramBuckets(col("value"), bounds).as("histo_buckets"),
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_v"))
        .select(col("event_type"), col("n"), col("sum_v"),
          posexplode(col("histo_buckets")).as(Seq("bucket_idx", "bucket")))
        .select(col("event_type"), col("n"), col("sum_v"),
          col("bucket_idx"),
          col("bucket.upper_limit").as("upper_limit"),
          col("bucket.count").as("le_count"))
        .orderBy(col("event_type"), col("bucket_idx"))
    },

    "enrich_join" -> { (s, dir) =>
      val c = Graft.table(s, dir, "customer")
      val n = Graft.table(s, dir, "nation")
      val r = Graft.table(s, dir, "region")
      val withNation = EnrichmentTable.lookup(
        c, n, Seq(Equals(col("c_nationkey"), "n_nationkey")),
        select = Seq("n_name", "n_regionkey"))
      val withRegion = EnrichmentTable.lookup(
        withNation, r, Seq(Equals(col("n_regionkey"), "r_regionkey")),
        select = Seq("r_name"))
      withRegion.select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
        .orderBy(col("c_custkey"))
    },

    "enrich_range" -> { (s, dir) =>
      val spark = s
      import spark.implicits._
      val periods = Seq(
        ("early", "1992-01-01 00:00:00", "1994-12-31 23:59:59"),
        ("mid", "1995-01-01 00:00:00", "1996-12-31 23:59:59"),
        ("late", "1997-01-01 00:00:00", "1998-12-31 23:59:59"))
        .toDF("period", "from_ts", "to_ts")
        .select(col("period"), col("from_ts").cast("timestamp").as("from_ts"),
          col("to_ts").cast("timestamp").as("to_ts"))
      EnrichmentTable.lookup(
          Graft.table(s, dir, "orders"), periods, Nil,
          between = Seq(BetweenDates(col("o_orderdate"), "from_ts", "to_ts")))
        .select(col("o_orderkey"), col("period"))
        .orderBy(col("o_orderkey"))
    },

    "enrich_wildcard" -> { (s, dir) =>
      val spark = s
      import spark.implicits._
      val tiers = Seq(("BUILDING", "tier1"), ("AUTOMOBILE", "tier2"), ("*", "tier0"))
        .toDF("segment", "tier")
      EnrichmentTable.lookupWithWildcard(
          Graft.table(s, dir, "customer"), tiers,
          eventKey = col("c_mktsegment"), tableKey = "segment",
          wildcard = "*", payload = Seq("tier"))
        .select(col("c_custkey"), col("c_mktsegment"), col("tier"))
        .orderBy(col("c_custkey"))
    },

    // remap error semantics: reroute_dropped (remap.rs:128-155) — events
    // whose remap errored land on the `dropped` output, tagged; primary
    // and dropped are re-unioned here so one query verifies the split.
    "remap_dropped" -> { (s, dir) =>
      val e = ev(s, dir)
      val parsed = Graft.jsonLong(col("props"), "k")
      val out = Remap(e,
        sets = Seq(
          "k" -> parsed,
          // simulated fallible op: k must divide cleanly by 3
          "third" -> when(pmod(parsed, lit(3)) === 0, parsed / 3)),
        errorWhen = Some(col("third").isNull))
      Misc.fanIn(Seq(
          out.primary.withColumn("output", lit("primary")),
          out.dropped.withColumn("output", lit("dropped"))))
        .select(col("event_id"), col("k"), col("third").cast("long").as("third"),
          col("output"))
        .orderBy(col("event_id"))
    },

    // trace_to_log + fan-in + aws_ec2_metadata-style env enrichment +
    // dedupe ignore-mode in one pipeline (SURVEY 2.1 small transforms)
    "misc_pipeline" -> { (s, dir) =>
      val e = ev(s, dir).select("event_id", "user_id", "event_type")
      val logs = e.withColumn("source_type", lit("log"))
      val traces = Misc.traceToLog(
        e.filter(col("event_type") === "error"))
      val merged = Misc.fanIn(Seq(logs, traces))
      val enriched = Misc.environmentEnrich(merged,
        Map("az" -> "us-test-1a", "instance_type" -> "c.local"))
      Dedupe.ignoring(enriched, ignoreFields = Seq("event_id", "source_type"),
          orderCol = struct(col("event_id"), col("source_type")))
        .orderBy(col("event_id"), col("source_type"))
    },

    "line_agg" -> { (s, dir) =>
      val e = ev(s, dir)
        .withColumn("k", Graft.jsonLong(col("props"), "k"))
      val line = when(pmod(col("k"), lit(3)) === 0,
          concat(lit("ERROR "), col("event_type")))
        .otherwise(concat(lit("  at fn"), col("k")))
      LineAgg(e.withColumn("line", line),
          fileCol = col("user_id"), orderCol = col("event_id"),
          lineCol = col("line"), mode = LineAgg.ContinueThrough,
          pattern = "^\\s")
        .select(col("file"), col("first_order"), col("n_lines"), col("message"))
        .orderBy(col("file"), col("first_order"))
    },

    "enrich_memory" -> { (s, dir) =>
      val e = ev(s, dir)
      val table = EnrichmentTable.memoryTable(
          e.select(col("user_id"), col("value"), col("event_id")),
          keyCol = "user_id", orderCol = col("event_id"),
          payload = Seq("value"))
        .select(col("user_id").as("mem_key"),
          round(col("value"), 2).as("latest_value"))
      EnrichmentTable.lookup(e, table,
          Seq(EnrichmentTable.Equals(col("user_id"), "mem_key")))
        .select(col("event_id"), col("user_id"), col("latest_value"))
        .orderBy(col("event_id"))
    },

    // memory table, `filter: {type: bloom}` variant
    // (src/enrichment_tables/memory/bloom_table.rs): keys seen by the
    // feed (error events' user ids) populate the filter; the probe side
    // is a pure projection over the broadcast word array. The md5-based
    // lanes are recomputed EXACTLY by the oracle — false positives
    // (if any) match bit-for-bit.
    "enrich_bloom" -> { (s, dir) =>
      val e = ev(s, dir)
      val t = graft.enrich.MemoryFilters.bloomTable(
        e.filter(col("event_type") === "error")
          .select(col("user_id").cast("string").as("k")),
        col("k"), maxEntries = 1024)
      e.select(col("event_id"), col("user_id"),
          graft.enrich.MemoryFilters.bloomMember(
            col("user_id").cast("string"), t).as("member"))
        .orderBy(col("event_id"))
    },

    // memory table, `filter: {type: cuckoo}` variant (cuckoo_table.rs):
    // all keys inserted (capacity-guarded), probes against the inserted
    // set — no false negatives, and the returned fingerprint is the
    // reference's uppercase hex, recomputed exactly by the oracle.
    "enrich_cuckoo" -> { (s, dir) =>
      val e = ev(s, dir)
      val t = graft.enrich.MemoryFilters.cuckooTable(
        e.select(col("user_id").cast("string").as("k"), col("event_id")),
        col("k"), col("event_id"), maxEntries = 4096)
      graft.enrich.MemoryFilters.cuckooMember(
          e, col("user_id").cast("string"), t)
        .select(col("event_id"), col("user_id"), col("member"),
          col("fingerprint"))
        .orderBy(col("event_id"))
    },

    "enrich_geoip" -> { (s, dir) =>
      val spark = s
      import spark.implicits._
      val e = ev(s, dir)
      val ip = when(pmod(col("user_id"), lit(2)) === 0,
          concat_ws(".", lit(10), pmod(col("user_id"), lit(256)),
            pmod(col("user_id") * 7, lit(256)), pmod(col("user_id") * 13, lit(256))))
        .otherwise(concat_ws(".", lit(192), lit(168),
          pmod(col("user_id"), lit(256)), pmod(col("user_id") * 3, lit(256))))
      val cidrs = Seq(("10.0.0.0/8", "alpha"), ("192.168.0.0/16", "beta"),
        ("172.16.0.0/12", "gamma")).toDF("cidr", "network")
      EnrichmentTable.cidrLookup(e.withColumn("ip", ip), col("ip"), cidrs)
        .select(col("event_id"), col("ip"), col("network"))
        .orderBy(col("event_id"))
    },

    // MaxMind-DB enrichment through the REAL binary format: build a
    // spec-conformant .mmdb with the micro writer (fixed literal
    // networks), then per-row search-tree walk via the broadcast reader
    // (enrichment_tables geoip type, src/enrichment_tables/geoip.rs).
    // The oracle recomputes the same mapping as plain range CASEs — any
    // encode/decode/tree defect breaks the hash.
    "enrich_mmdb" -> { (s, dir) =>
      val e = ev(s, dir)
      val ip = when(pmod(col("user_id"), lit(2)) === 0,
          concat_ws(".", lit(10), pmod(col("user_id"), lit(256)),
            pmod(col("user_id") * 7, lit(256)), pmod(col("user_id") * 13, lit(256))))
        .otherwise(concat_ws(".", lit(192), lit(168),
          pmod(col("user_id"), lit(256)), pmod(col("user_id") * 3, lit(256))))
      val db = graft.enrich.Mmdb.build(Seq(
        "10.0.0.0/9" -> Map[String, Any](
          "autonomous_system_number" -> 64512L,
          "autonomous_system_organization" -> "Alpha Net"),
        "10.128.0.0/9" -> Map[String, Any](
          "autonomous_system_number" -> 64513L,
          "autonomous_system_organization" -> "Alpha South"),
        "192.168.0.0/16" -> Map[String, Any](
          "autonomous_system_number" -> 64514L,
          "autonomous_system_organization" -> "Beta Net")),
        databaseType = "GeoLite2-ASN")
      graft.enrich.MmdbEnrich.lookup(
          e.withColumn("ip", ip), col("ip"), graft.enrich.Mmdb(db))
        .select(col("event_id"), col("ip"),
          col("autonomous_system_number").as("asn"),
          col("autonomous_system_organization").as("asn_org"),
          col("network"))
        .orderBy(col("event_id"))
    },

    "sample_group" -> { (s, dir) =>
      Sample.countPerGroup(ev(s, dir), col("event_type"), col("event_id"),
          rate = 7)
        .select(col("event_id"), col("event_type"), col("sample_rate"))
        .orderBy(col("event_id"))
    },

    // `join` — the Spark-native relational transform (no reference
    // analog: the reference has no two-input relational operators, and
    // SURVEY §2.1's scope note says our engine should expose them).
    // Orders enriched against a filtered customer dimension via a
    // BROADCAST left join, declared entirely in YAML: the first input
    // is the left side, the second the right; `broadcast: right` makes
    // the bounded dimension a broadcast-hash join (zero shuffle of the
    // fact side — the 100 TB plan shape PlanAuditSpec pins).
    "transform_join" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
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
          |  enriched:
          |    type: join
          |    inputs: [orders, solvent]
          |    left_on: [o_custkey]
          |    right_on: [c_custkey]
          |    kind: left
          |    broadcast: right
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [enriched]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("o_orderkey").as("order_key"),
          col("c_name").as("cust_name"),
          col("c_nationkey").as("cust_nation"),
          col("c_mktsegment").as("segment"))
        .orderBy(col("order_key"))
    },

    // `sort` — global total order declared in YAML ('-' prefix =
    // descending). The transform itself produces the final row order,
    // so no harness orderBy here: the oracle compare IS the sort check.
    "transform_sort" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  sorted:
          |    type: sort
          |    inputs: [events]
          |    by: ["-value", "event_id"]
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [sorted]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
    },

    // `top_k` — per-key top-k (k best rows per event_type by value):
    // one keyed window, no global sort anywhere in the plan.
    "transform_topk" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  top:
          |    type: top_k
          |    inputs: [events]
          |    k: 3
          |    per: [event_type]
          |    by: ["-value", "event_id"]
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [top]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_type"), col("event_id"),
          round(col("value"), 2).as("value"))
        .orderBy(col("event_type"), col("event_id"))
    },

    // `set_op` — intersect / except / union_distinct chained in one
    // YAML DAG: errors∩high-value and errors∖high-value are tagged by
    // remaps and re-united, so a wrong membership on ANY of the three
    // ops shows up as a wrong `branch` (or a missing/duplicate row).
    "transform_setops" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  errors:
          |    type: filter
          |    inputs: [events]
          |    condition: '.event_type == "error"'
          |  high:
          |    type: filter
          |    inputs: [events]
          |    condition: '.value > 100.0'
          |  inter:
          |    type: set_op
          |    op: intersect
          |    inputs: [errors, high]
          |  exc:
          |    type: set_op
          |    op: except
          |    inputs: [errors, high]
          |  inter_t:
          |    type: remap
          |    inputs: [inter]
          |    source: '.branch = "inter"'
          |  exc_t:
          |    type: remap
          |    inputs: [exc]
          |    source: '.branch = "except"'
          |  uni:
          |    type: set_op
          |    op: union_distinct
          |    inputs: [inter_t, exc_t]
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [uni]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"), col("branch"))
        .orderBy(col("event_id"))
    },

    "topology" -> { (s, dir) =>
      import graft.plans.Topology
      import graft.plans.Topology.{Sink, Source, Transform}
      val built = Topology.build(s, Seq(
        Source("events", Topology.Log, sp => ev(sp, dir)),
        Transform.simple("remap", Seq("events"), df =>
          df.withColumn("severity",
            when(col("event_type") === "error", 3).otherwise(6))),
        Transform("route", Seq("remap"), Topology.Log, Topology.Log, df => Map(
          "error" -> df.filter(col("event_type") === "error"),
          "rest" -> df.filter(col("event_type") =!= "error"))),
        Transform.simple("tag_err", Seq("route.error"),
          _.withColumn("origin", lit("error"))),
        Transform.simple("high", Seq("route.rest"), df =>
          df.filter(col("value") > 150.0).withColumn("origin", lit("high"))),
        Sink("out", Seq("tag_err", "high"), Topology.Log)))
      built.sink("out")
        .select(col("event_id"), col("severity"), col("origin"))
        .orderBy(col("event_id"), col("origin"))
    },

    // same DAG as `topology`, but built by the YAML config loader with
    // VRL-compiled transform bodies (plans/ConfigLoader.scala)
    "topology_yaml" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  remap:
          |    type: remap
          |    inputs: [events]
          |    source: |
          |      .severity = if .event_type == "error" { 3 } else { 6 }
          |  route:
          |    type: route
          |    inputs: [remap]
          |    route:
          |      error: '.event_type == "error"'
          |      rest: '.event_type != "error"'
          |  tag_err:
          |    type: remap
          |    inputs: [route.error]
          |    source: |
          |      .origin = "error"
          |  high:
          |    type: filter
          |    inputs: [route.rest]
          |    condition: '.value > 150.0'
          |  tag_high:
          |    type: remap
          |    inputs: [high]
          |    source: |
          |      .origin = "high"
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [tag_err, tag_high]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_id"), col("severity"), col("origin"))
        .orderBy(col("event_id"), col("origin"))
    },

    // same DAG again, but the sink collects its fan-in via a WILDCARD
    // `inputs: ["tag_*"]` — the reference glob-expands component
    // references at config compile (compiler.rs:27,167); the sink picks
    // up tag_err + tag_high without naming them
    "topology_glob" -> { (s, dir) =>
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  remap:
          |    type: remap
          |    inputs: [events]
          |    source: |
          |      .severity = if .event_type == "error" { 3 } else { 6 }
          |  route:
          |    type: route
          |    inputs: [remap]
          |    route:
          |      error: '.event_type == "error"'
          |      rest: '.event_type != "error"'
          |  tag_err:
          |    type: remap
          |    inputs: [route.error]
          |    source: |
          |      .origin = "error"
          |  high:
          |    type: filter
          |    inputs: [route.rest]
          |    condition: '.value > 150.0'
          |  tag_high:
          |    type: remap
          |    inputs: [high]
          |    source: |
          |      .origin = "high"
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: ["tag_*"]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_id"), col("severity"), col("origin"))
        .orderBy(col("event_id"), col("origin"))
    },

    "topology_yaml2" -> { (s, dir) =>
      // round-7 registry widening: a config file driving FOUR newly
      // YAML-wired surfaces — a datadog_search condition, throttle,
      // log_to_metric, and incremental_to_absolute — as one Catalyst plan
      val built = graft.plans.ConfigLoader.load(s,
        """
          |sources:
          |  events:
          |    type: parquet
          |    table: events
          |transforms:
          |  dd:
          |    type: filter
          |    inputs: [events]
          |    condition:
          |      type: datadog_search
          |      source: "@event_type:error OR @event_type:purchase"
          |  thr:
          |    type: throttle
          |    inputs: [dd]
          |    threshold: 5
          |    window_secs: 3600
          |    key_field: event_type
          |  mk:
          |    type: log_to_metric
          |    inputs: [thr]
          |    metrics:
          |      - type: counter
          |        name: events_total
          |        tags:
          |          etype: "{{ event_type }}"
          |  abs:
          |    type: incremental_to_absolute
          |    inputs: [mk]
          |    group_by: [name]
          |sinks:
          |  out:
          |    type: parquet
          |    inputs: [abs]
          |""".stripMargin, dir)
      built.sink("out")
        .select(col("event_id"), col("name"), col("counter_value"),
          col("abs_value"))
        .orderBy(col("event_id"))
    },

    "condition_search" -> { (s, dir) =>
      // Datadog-search-style condition (SURVEY §2.2): facet equality,
      // wildcard LIKE, regex, numeric range — compiled to Column predicates
      ev(s, dir).filter(
          (col("event_type").rlike("^(error|signup)$") ||
            col("props").like("%\"k\": 1%")) && col("value").between(10.0, 200.0))
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
        .orderBy(col("event_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "route" ->
      """WITH m AS (
        |  SELECT event_id, 'error' AS route FROM events WHERE event_type='error'
        |  UNION ALL SELECT event_id, 'high_value' FROM events WHERE value > 90.0
        |  UNION ALL SELECT event_id, 'purchase' FROM events WHERE event_type='purchase'
        |  UNION ALL SELECT event_id, '_unmatched' FROM events
        |    WHERE NOT(event_type='error' OR value > 90.0 OR event_type='purchase')
        |) SELECT event_id, route FROM m ORDER BY event_id, route""".stripMargin,

    "exclusive_route" ->
      """SELECT event_id,
        |  CASE WHEN event_type='error' THEN 'error'
        |       WHEN value > 90.0 THEN 'high_value'
        |       ELSE '_unmatched' END AS route
        |FROM events ORDER BY event_id""".stripMargin,

    "sample_hash" ->
      """SELECT event_id, user_id, 4 AS sample_rate FROM events
        |WHERE substr(md5(CAST(user_id AS VARCHAR)),1,1) IN ('0','1','2','3')
        |ORDER BY event_id""".stripMargin,

    "sample_count" ->
      """SELECT event_id, event_type, 10 AS sample_rate FROM events
        |WHERE event_id % 10 = 0 ORDER BY event_id""".stripMargin,

    "dedupe" ->
      """SELECT event_id, user_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
        |ORDER BY event_id""".stripMargin,

    "reduce_merge" ->
      """SELECT user_id,
        |  min(CAST(ts AS TIMESTAMP)) AS ts, max(CAST(ts AS TIMESTAMP)) AS ts_end,
        |  arg_min(event_type, event_id) AS ft, arg_max(event_type, event_id) AS lt,
        |  round(sum(value),2) AS sv, max(value) AS mx, min(value) AS mn,
        |  string_agg(printf('%.2f', value), ',' ORDER BY event_id) AS vals,
        |  string_agg(event_type, ' ' ORDER BY event_id) AS types_cat,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS uniq,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "aggregate_metrics" ->
      """WITH metrics AS (
        |  SELECT 'events_total' AS name, event_type AS type, ts, 'incremental' AS kind,
        |         1.0 AS value, event_id FROM events
        |  UNION ALL
        |  SELECT 'value_gauge', event_type, ts, 'absolute', value, event_id FROM events
        |)
        |SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, name, type,
        |  round(sum(value),2) AS sum_v, CAST(count(*) AS BIGINT) AS n,
        |  max(value) AS max_v, min(value) AS min_v,
        |  arg_max(value, event_id) AS latest_v,
        |  arg_max(value, event_id) - arg_min(value, event_id) AS diff_v,
        |  round(CASE WHEN max(kind)='absolute' THEN arg_max(value, event_id)
        |        ELSE sum(value) END, 2) AS auto_v,
        |  round(sum(value),2) / CAST(count(*) AS BIGINT) AS mean_v,
        |  CASE WHEN count(*) > 1 THEN
        |    sqrt((round(sum(value*value),4) - round(sum(value),2)*round(sum(value),2)
        |          / CAST(count(*) AS BIGINT)) / (CAST(count(*) AS BIGINT) - 1))
        |  END AS stdev_v
        |FROM metrics GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "throttle" ->
      """SELECT event_id, user_id FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
        |  ORDER BY event_id) <= 5
        |ORDER BY event_id""".stripMargin,

    "window_lookback" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT *, max(CASE WHEN event_type='error' THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) AS keep
        |  FROM events) WHERE keep = 1 ORDER BY event_id""".stripMargin,

    "log_to_metric" ->
      """SELECT event_id, name, kind, value_type, val, type FROM (
        |  SELECT event_id, 'events_total' AS name, 'incremental' AS kind,
        |         'counter' AS value_type, 1.0 AS val, event_type AS type FROM events
        |  UNION ALL
        |  SELECT event_id, 'value_gauge', 'absolute', 'gauge', value, event_type FROM events
        |) ORDER BY event_id, name""".stripMargin,

    "metric_to_log" ->
      """SELECT event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') || ' incremental events_total=1.0'
        |    AS message
        |FROM events ORDER BY event_id""".stripMargin,

    "incremental_to_absolute" ->
      """WITH metrics AS (
        |  SELECT 'events_total' AS name, event_type AS type, 'incremental' AS kind,
        |         1.0 AS value, event_id FROM events
        |  UNION ALL
        |  SELECT 'value_gauge', event_type, 'absolute', value, event_id FROM events
        |)
        |SELECT event_id, name, type, 'absolute' AS kind,
        |  round(CASE WHEN kind='incremental' THEN
        |    sum(CASE WHEN kind='incremental' THEN value END) OVER (
        |      PARTITION BY name, type ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  ELSE value END, 2) AS abs_value
        |FROM metrics ORDER BY event_id, name""".stripMargin,

    "metric_normalize" ->
      """SELECT event_id, event_type AS type, 'incremental' AS kind,
        |  round(value - lag(value) OVER (PARTITION BY event_type
        |    ORDER BY event_id), 2) AS inc_value
        |FROM events ORDER BY event_id""".stripMargin,

    "vrl_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
        |  'BIGINT' AS vk_type,
        |  json_extract(props, '$.k') IS NOT NULL AS has_k,
        |  false AS has_nope
        |FROM events ORDER BY event_id""".stripMargin,

    "tag_cardinality_limit" ->
      """WITH fs AS (
        |  SELECT event_type AS tv, min(event_id) AS first_seen
        |  FROM events GROUP BY 1),
        |keep AS (
        |  SELECT tv FROM fs
        |  QUALIFY row_number() OVER (ORDER BY first_seen, tv) <= 2)
        |SELECT event_id, user_id, event_type FROM events
        |WHERE event_type IN (SELECT tv FROM keep) ORDER BY event_id""".stripMargin,

    "metric_sketch" ->
      """WITH v AS (SELECT event_type, value FROM events),
        |nz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         sum(CASE WHEN value <= 1e-9 THEN 1 ELSE 0 END) AS z
        |       FROM v GROUP BY 1),
        |bc AS (SELECT event_type, CAST(ceil(ln(value)/ln(1.02)) AS INT) AS i,
        |         count(*) AS c
        |       FROM v WHERE value > 1e-9 GROUP BY 1, 2),
        |cum AS (SELECT event_type, i,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY i) AS cm
        |        FROM bc),
        |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS qq),
        |ranks AS (SELECT nz.event_type, qq,
        |            greatest(1, ceil(qq * nz.n)) - nz.z AS r
        |          FROM nz, qs),
        |sel AS (SELECT r.event_type, r.qq, min(c.i) AS idx
        |        FROM ranks r LEFT JOIN cum c
        |          ON c.event_type = r.event_type AND c.cm >= r.r
        |        WHERE r.r > 0 GROUP BY 1, 2)
        |SELECT nz.event_type, nz.n,
        |  CAST(max(CASE WHEN qq = 0.5 THEN idx END) AS INT) AS q50_idx,
        |  CAST(max(CASE WHEN qq = 0.9 THEN idx END) AS INT) AS q90_idx,
        |  CAST(max(CASE WHEN qq = 0.99 THEN idx END) AS INT) AS q99_idx,
        |  coalesce(round(2 * power(1.02, max(CASE WHEN qq = 0.5 THEN idx END))
        |    / 2.02, 3), 0.0) AS q50,
        |  coalesce(round(2 * power(1.02, max(CASE WHEN qq = 0.9 THEN idx END))
        |    / 2.02, 3), 0.0) AS q90
        |FROM nz LEFT JOIN sel ON sel.event_type = nz.event_type
        |GROUP BY 1, 2 ORDER BY nz.event_type""".stripMargin,

    "metric_histogram" ->
      """WITH b AS (SELECT unnest([10.0, 50.0, 100.0, 200.0]) AS upper_limit,
        |             unnest([0, 1, 2, 3]) AS bucket_idx)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 2) AS sum_v, CAST(bucket_idx AS INT) AS bucket_idx,
        |  upper_limit,
        |  CAST(sum(CASE WHEN value <= upper_limit THEN 1 ELSE 0 END) AS BIGINT)
        |    AS le_count
        |FROM events, b
        |GROUP BY event_type, bucket_idx, upper_limit
        |ORDER BY event_type, bucket_idx""".stripMargin,

    "enrich_join" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,

    "enrich_range" ->
      """SELECT o_orderkey, period FROM orders
        |LEFT JOIN (VALUES
        |  ('early', TIMESTAMP '1992-01-01 00:00:00', TIMESTAMP '1994-12-31 23:59:59'),
        |  ('mid',   TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1996-12-31 23:59:59'),
        |  ('late',  TIMESTAMP '1997-01-01 00:00:00', TIMESTAMP '1998-12-31 23:59:59'))
        |  AS p(period, from_ts, to_ts)
        |ON o_orderdate BETWEEN from_ts AND to_ts
        |ORDER BY o_orderkey""".stripMargin,

    "enrich_wildcard" ->
      """SELECT c_custkey, c_mktsegment,
        |  coalesce(t.tier, 'tier0') AS tier
        |FROM customer
        |LEFT JOIN (VALUES ('BUILDING','tier1'), ('AUTOMOBILE','tier2'))
        |  AS t(segment, tier)
        |ON c_mktsegment = segment
        |ORDER BY c_custkey""".stripMargin,

    "remap_dropped" ->
      """SELECT event_id, k,
        |  CASE WHEN k % 3 = 0 THEN k // 3 END AS third,
        |  CASE WHEN k % 3 = 0 THEN 'primary' ELSE 'dropped' END AS output
        |FROM (SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    "misc_pipeline" ->
      """SELECT min(event_id) AS event_id, user_id, event_type,
        |  'log' AS source_type, 'us-test-1a' AS az, 'c.local' AS instance_type
        |FROM events GROUP BY user_id, event_type
        |ORDER BY event_id, source_type""".stripMargin,

    "line_agg" ->
      """WITH l AS (
        |  SELECT user_id AS file, event_id AS ord,
        |    CASE WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) % 3 = 0
        |      THEN 'ERROR ' || event_type
        |      ELSE '  at fn' ||
        |        CAST(CAST(json_extract_string(props,'$.k') AS BIGINT) AS VARCHAR)
        |    END AS line
        |  FROM events),
        |g AS (
        |  SELECT *, sum(CASE WHEN regexp_matches(line, '^\s') THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY file ORDER BY ord) AS grp
        |  FROM l)
        |SELECT file, min(ord) AS first_order, CAST(count(*) AS BIGINT) AS n_lines,
        |  string_agg(line, chr(10) ORDER BY ord) AS message
        |FROM g GROUP BY file, grp ORDER BY file, first_order""".stripMargin,

    "enrich_bloom" ->
      """WITH lanes AS (SELECT * FROM generate_series(0,6) t(i)),
        |ins AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS k
        |        FROM events WHERE event_type = 'error'),
        |bits AS (SELECT DISTINCT
        |    CAST(('0x' || substr(md5(k || ':' || CAST(i AS VARCHAR)),1,8))
        |      AS BIGINT) % 9816 AS b
        |  FROM ins CROSS JOIN lanes),
        |pl AS (SELECT event_id, user_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' ||
        |      CAST(i AS VARCHAR)),1,8)) AS BIGINT) % 9816 AS b
        |  FROM events CROSS JOIN lanes)
        |SELECT event_id, user_id,
        |  bool_and(b IN (SELECT b FROM bits)) AS member
        |FROM pl GROUP BY event_id, user_id ORDER BY event_id""".stripMargin,

    "enrich_cuckoo" ->
      """SELECT DISTINCT event_id, user_id, TRUE AS member,
        |  upper(to_hex(CAST(('0x' ||
        |    substr(md5('fp:' || CAST(user_id AS VARCHAR)),1,8))
        |    AS BIGINT) % 255 + 1)) AS fingerprint
        |FROM events ORDER BY event_id""".stripMargin,

    "enrich_memory" ->
      """SELECT event_id, user_id, latest_value FROM events
        |LEFT JOIN (SELECT user_id AS mk, round(arg_max(value, event_id), 2)
        |             AS latest_value
        |           FROM events GROUP BY 1) ON user_id = mk
        |ORDER BY event_id""".stripMargin,

    "enrich_geoip" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 2 = 0
        |      THEN '10.' || (user_id%256) || '.' || (user_id*7%256) || '.'
        |        || (user_id*13%256)
        |      ELSE '192.168.' || (user_id%256) || '.' || (user_id*3%256)
        |    END AS ip,
        |    CASE WHEN user_id % 2 = 0 THEN 'alpha' ELSE 'beta' END AS network
        |  FROM events)
        |SELECT event_id, ip, network FROM t ORDER BY event_id""".stripMargin,

    "enrich_mmdb" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CASE WHEN user_id % 2 = 0
        |      THEN '10.' || (user_id%256) || '.' || (user_id*7%256) || '.'
        |        || (user_id*13%256)
        |      ELSE '192.168.' || (user_id%256) || '.' || (user_id*3%256)
        |    END AS ip,
        |    CAST(CASE WHEN user_id % 2 = 0 AND user_id % 256 < 128 THEN 64512
        |         WHEN user_id % 2 = 0 THEN 64513
        |         ELSE 64514 END AS BIGINT) AS asn,
        |    CASE WHEN user_id % 2 = 0 AND user_id % 256 < 128 THEN 'Alpha Net'
        |         WHEN user_id % 2 = 0 THEN 'Alpha South'
        |         ELSE 'Beta Net' END AS asn_org,
        |    CASE WHEN user_id % 2 = 0 AND user_id % 256 < 128 THEN '10.0.0.0/9'
        |         WHEN user_id % 2 = 0 THEN '10.128.0.0/9'
        |         ELSE '192.168.0.0/16' END AS network
        |  FROM events)
        |SELECT event_id, ip, asn, asn_org, network FROM t
        |ORDER BY event_id""".stripMargin,

    "sample_group" ->
      """SELECT event_id, event_type, 7 AS sample_rate FROM events
        |QUALIFY (row_number() OVER (PARTITION BY event_type ORDER BY event_id)
        |  - 1) % 7 = 0
        |ORDER BY event_id""".stripMargin,

    "topology" ->
      """SELECT event_id, severity, origin FROM (
        |  SELECT event_id, 3 AS severity, 'error' AS origin FROM events
        |  WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT event_id, 6, 'high' FROM events
        |  WHERE event_type <> 'error' AND value > 150.0)
        |ORDER BY event_id, origin""".stripMargin,

    "transform_join" ->
      """SELECT o.o_orderkey AS order_key, c.c_name AS cust_name,
        |       c.c_nationkey AS cust_nation, c.c_mktsegment AS segment
        |FROM orders o
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY order_key""".stripMargin,

    "transform_sort" ->
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events
        |ORDER BY events.value DESC, event_id""".stripMargin,

    "transform_topk" ->
      """SELECT event_type, event_id, round(value, 2) AS value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY event_type ORDER BY events.value DESC, event_id) <= 3
        |ORDER BY event_type, event_id""".stripMargin,

    "transform_setops" ->
      """SELECT event_id, event_type, round(value, 2) AS value,
        |       CASE WHEN value > 100.0 THEN 'inter' ELSE 'except' END
        |         AS branch
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin,

    "topology_yaml" ->
      """SELECT event_id, severity, origin FROM (
        |  SELECT event_id, CAST(3 AS BIGINT) AS severity, 'error' AS origin
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT event_id, CAST(6 AS BIGINT), 'high' FROM events
        |  WHERE event_type <> 'error' AND value > 150.0)
        |ORDER BY event_id, origin""".stripMargin,

    "topology_glob" ->
      """SELECT event_id, severity, origin FROM (
        |  SELECT event_id, CAST(3 AS BIGINT) AS severity, 'error' AS origin
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT event_id, CAST(6 AS BIGINT), 'high' FROM events
        |  WHERE event_type <> 'error' AND value > 150.0)
        |ORDER BY event_id, origin""".stripMargin,

    "topology_yaml2" ->
      """WITH f AS (
        |  SELECT * FROM events
        |  WHERE event_type = 'error' OR event_type = 'purchase'),
        |t AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY event_type, date_trunc('hour', ts)
        |    ORDER BY event_id) AS rn
        |  FROM f)
        |SELECT event_id, 'events_total' AS name,
        |       1.0 AS counter_value,
        |       CAST(sum(1.0) OVER (ORDER BY event_id) AS DOUBLE) AS abs_value
        |FROM t WHERE rn <= 5
        |ORDER BY event_id""".stripMargin,

    "condition_search" ->
      """SELECT event_id, event_type, round(value,2) AS value FROM events
        |WHERE (regexp_matches(event_type, '^(error|signup)$')
        |       OR props LIKE '%"k": 1%')
        |  AND value BETWEEN 10.0 AND 200.0
        |ORDER BY event_id""".stripMargin
  )
}

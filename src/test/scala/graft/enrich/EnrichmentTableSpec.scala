package graft.enrich

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EnrichmentTableSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq((1L, "A"), (2L, "B"), (3L, "Z")).toDF("id", "seg")

  test("wildcard fallback fills misses") {
    val table = Seq(("A", "t1"), ("B", "t2"), ("*", "t0")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
        col("seg"), "seg_k", "*", Seq("tier"))
      .select($"id", $"tier").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "t1", 2L -> "t2", 3L -> "t0"))
  }

  test("missing wildcard row degrades to nulls, never drops events") {
    val table = Seq(("A", "t1")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
        col("seg"), "seg_k", "*", Seq("tier"))
      .select($"id", $"tier").as[(Long, Option[String])].collect().toMap
    assert(out.size == 3)
    assert(out(1L).contains("t1"))
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("multiple wildcard rows don't duplicate events") {
    val table = Seq(("A", "t1"), ("*", "t0"), ("*", "t9")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookupWithWildcard(events, table,
      col("seg"), "seg_k", "*", Seq("tier"))
    assert(out.count() == 3)
  }

  test("case-insensitive equality join") {
    val table = Seq(("a", "t1")).toDF("seg_k", "tier")
    val out = EnrichmentTable.lookup(events, table,
        Seq(EnrichmentTable.Equals(col("seg"), "seg_k", caseInsensitive = true)))
      .filter($"tier".isNotNull).select($"id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("cidrLookup picks longest prefix among overlapping CIDRs") {
    val ips = Seq((1L, "10.1.2.3"), (2L, "10.9.9.9"), (3L, "192.168.1.1"))
      .toDF("id", "ip")
    val cidrs = Seq(("10.0.0.0/8", "broad"), ("10.1.0.0/16", "narrow"),
      ("10.1.2.0/24", "narrowest")).toDF("cidr", "geo")
    val out = EnrichmentTable.cidrLookup(ips, col("ip"), cidrs)
      .select($"id", $"geo").as[(Long, Option[String])].collect().toMap
    assert(out.size == 3, "overlapping ranges must not duplicate events")
    assert(out(1L).contains("narrowest"))
    assert(out(2L).contains("broad"))
    assert(out(3L).isEmpty)
  }

  test("cidrLookup duplicate CIDR rows don't duplicate events") {
    val ips = Seq((1L, "10.1.2.3")).toDF("id", "ip")
    val cidrs = Seq(("10.0.0.0/8", "a"), ("10.0.0.0/8", "b")).toDF("cidr", "geo")
    val out = EnrichmentTable.cidrLookup(ips, col("ip"), cidrs)
      .select($"geo").as[String].collect().toSeq
    assert(out == Seq("a"))
  }

  // ---- memory table bloom/cuckoo filter variants ----------------------

  test("bloom: driver insert and distributed build agree; no false negatives") {
    val keys = (1 to 200).map(i => s"key_$i")
    val driver = new MemoryFilters.BloomTable(1024)
    keys.foreach(driver.insert)
    val dist = MemoryFilters.bloomTable(
      keys.toDF("k"), col("k"), maxEntries = 1024)
    assert(driver.words.toSeq == dist.words.toSeq)
    assert(keys.forall(driver.contains)) // bloom: no false negatives
    // column-side membership agrees with the driver filter, row by row
    val probes = (1 to 400).map(i => s"key_$i")
    val got = probes.toDF("k")
      .select(col("k"), MemoryFilters.bloomMember(col("k"), dist).as("m"))
      .as[(String, Boolean)].collect().toMap
    probes.foreach(p => assert(got(p) == driver.contains(p), p))
    assert((1 to 200).forall(i => got(s"key_$i")))
  }

  test("cuckoo: insert/contains/remove with fingerprint parity") {
    val t = new MemoryFilters.CuckooTable(256)
    val keys = (1 to 200).map(i => s"u$i")
    keys.foreach(k => assert(t.insert(k)))
    assert(keys.forall(t.contains)) // under capacity: no false negatives
    assert(t.remove("u7") && !t.remove("not_there_xyz"))
    // distributed probe: member flags + the reference's uppercase-hex
    // fingerprint match the driver filter
    val df = MemoryFilters.cuckooMember(
      Seq("u1", "u7", "u200").toDF("k"), col("k"), t)
    val rows = df.select(col("k"), col("member"), col("fingerprint"))
      .distinct().as[(String, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("u1")._1 && rows("u200")._1)
    assert(rows("u1")._2 == t.fingerprintHex("u1"))
    // u7 was removed — only a fingerprint collision could still hit
    assert(rows("u7")._1 == t.contains("u7"))
  }

  test("cuckoo: capacity guard is loud") {
    val ex = intercept[IllegalArgumentException] {
      MemoryFilters.cuckooTable(
        (1 to 50).map(i => (s"k$i", i.toLong)).toDF("k", "o"),
        col("k"), col("o"), maxEntries = 10)
    }
    assert(ex.getMessage.contains("max_entries"))
  }

  test("cuckoo: probe is row-preserving even when fp occupies both buckets") {
    val t = new MemoryFilters.CuckooTable(256)
    (1 to 200).foreach(i => t.insert(s"u$i"))
    // place a probe's fingerprint in BOTH its candidate buckets (the
    // case a (bucket OR bucket) join would duplicate; unreachable via
    // insert()'s dedupe, but a membership annotation must stay
    // row-preserving regardless of filter state)
    val p = "probe_dup"
    val fp = t.fingerprint(p)
    val b1 = t.bucket1(p)
    val b2 = t.altBucket(b1, fp)
    assert(b1 != b2)
    t.forceEntry(b1, fp)
    t.forceEntry(b2, fp)
    val out = MemoryFilters.cuckooMember(Seq(p).toDF("k"), col("k"), t)
    assert(out.count() == 1L) // membership annotation must not multiply rows
    assert(out.select("member").as[Boolean].head())
  }

  test("cuckoo: build throws loudly when insert exhausts kicks") {
    // bucketSize 1 + maxKicks 0: the second key hashing to an occupied
    // bucket pair must raise, not silently drop a fingerprint
    val keys = (1 to 64).map(i => s"k$i")
    val ex = intercept[IllegalStateException] {
      MemoryFilters.cuckooTable(
        keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "o"),
        col("k"), col("o"), maxEntries = 64, bucketSize = 1, maxKicks = 0)
    }
    assert(ex.getMessage.contains("insert failed"))
  }

  test("memory kv: overwrite near cap credits the replaced entry; utf-8 sizes") {
    val kv = new MemoryKv(maxByteSize = Some(20))
    assert(kv.put("k1", "\"0123456789\"")) // 2 + 12 = 14 bytes
    // overwrite with a SMALLER value: old size must be credited first
    assert(kv.put("k1", "\"01234\"")) // 2 + 7 = 9 bytes, fits after credit
    assert(kv.get("k1").map(_._1).contains("\"01234\""))
    // sizes count UTF-8 bytes (é = 2 bytes), not UTF-16 chars
    val kv2 = new MemoryKv(maxByteSize = Some(10))
    assert(!kv2.put("ké", "\"ééé\"")) // 3 + 8 = 11 bytes > 10
    assert(kv2.put("k", "\"ééé\"")) // 1 + 8 = 9 bytes
  }

  test("memory kv: ttl expiry, max_byte_size rejection, snapshot") {
    var now = 0L
    val kv = new MemoryKv(ttlSecs = 10, maxByteSize = Some(60),
      clock = () => now)
    assert(kv.put("alpha", "\"one\""))
    assert(kv.get("alpha").contains(("\"one\"", 10L)))
    now = 4000
    assert(kv.get("alpha").contains(("\"one\"", 6L))) // remaining ttl
    now = 11000
    assert(kv.get("alpha").isEmpty) // expired 10s after last update
    // capacity: reject entries past max_byte_size (table.rs)
    val kv2 = new MemoryKv(maxByteSize = Some(20))
    assert(kv2.put("k1", "\"0123456789\""))
    assert(!kv2.put("k2", "\"0123456789\""))
    assert(kv2.snapshot().map(_._1) == Seq("k1"))
  }

  test("yaml surface: a sink-fed kv memory table serves VRL lookups") {
    // the table's own `inputs:` make it a sink (reference
    // table.as_sink): every top-level field of each routed event
    // becomes an entry; a later plan's lookup sees {key, value, ttl}
    graft.plans.ConfigLoader.load(spark,
      """
        |enrichment_tables:
        |  kvstore:
        |    type: memory
        |    ttl: 300
        |    inputs: [feed]
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  feed:
        |    type: remap
        |    inputs: [ev]
        |    source: |
        |      . = {"lookup_token": .event_id}
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [ev]
        |""".stripMargin, "/root/testdata/sf0.001")
    val kv = graft.functions.VrlCompiler.filterTables("kvstore")
      .asInstanceOf[MemoryKv]
    // handle_value inserts FIELD NAMES as keys — every event produced
    // the same `lookup_token` key, last value wins
    assert(kv.size == 1 && kv.get("lookup_token").isDefined)
    val out = graft.functions.VrlCompiler.run(
      Seq("lookup_token", "missing_key").toDF("k"),
      """.row = get_enrichment_table_record("kvstore", {"key": .k})"""
    ).primary
    val rows = out.select(col("k"), col("row.key").as("hit"),
        col("row.ttl").as("ttl"))
      .as[(String, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("lookup_token")._1.contains("lookup_token"))
    assert(rows("lookup_token")._2.exists(t => t > 0 && t <= 300))
    assert(rows("missing_key")._1.isEmpty)
  }

  test("yaml surface: memory table source_config exports {key,value,ttl}") {
    // feed in one load, export via source_key in a second — the table's
    // live state survives reload (the reference's from_previous_state)
    graft.plans.ConfigLoader.load(spark,
      """
        |enrichment_tables:
        |  expstore:
        |    type: memory
        |    inputs: [feed]
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  feed:
        |    type: remap
        |    inputs: [ev]
        |    source: |
        |      . = {"exported_token": 41}
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [ev]
        |""".stripMargin, "/root/testdata/sf0.001")
    val built = graft.plans.ConfigLoader.load(spark,
      """
        |enrichment_tables:
        |  expstore:
        |    type: memory
        |    source_config:
        |      source_key: exp_src
        |sinks:
        |  out2:
        |    type: parquet
        |    inputs: [exp_src]
        |""".stripMargin, "/root/testdata/sf0.001")
    val rows = built.sink("out2")
      .select(col("key"), col("value").cast("string").as("v"), col("ttl"))
      .as[(String, String, Long)].collect()
    assert(rows.length == 1, rows.toSeq)
    assert(rows.head._1 == "exported_token")
    assert(rows.head._2 == "41")
    assert(rows.head._3 > 0 && rows.head._3 <= 600)
  }

  test("memory source expired port drains past-ttl entries at ttl 0") {
    var now = 0L
    val kv = new MemoryKv(ttlSecs = 10, clock = () => now)
    kv.put("fresh", "1"); kv.put("old", "2")
    now = 11000
    kv.put("fresh", "1") // refreshed — survives
    now = 12000
    val expired = kv.drainExpired()
    assert(expired == Seq(("old", "2", 0L)))
    assert(kv.snapshot().map(_._1) == Seq("fresh"))
    assert(kv.drainExpired().isEmpty) // drained once
  }

  test("yaml surface: expired output port exports via source_config") {
    graft.functions.VrlCompiler.filterTables =
      graft.functions.VrlCompiler.filterTables - "expstore2"
    val built = graft.plans.ConfigLoader.load(spark,
      """
        |enrichment_tables:
        |  expstore2:
        |    type: memory
        |    ttl: 0
        |    inputs: [feed]
        |    source_config:
        |      source_key: exp2_src
        |      export_expired_items: true
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |transforms:
        |  feed:
        |    type: remap
        |    inputs: [ev]
        |    source: |
        |      . = {"will_expire": 9}
        |sinks:
        |  live:
        |    type: parquet
        |    inputs: [exp2_src]
        |  gone:
        |    type: parquet
        |    inputs: [exp2_src.expired]
        |""".stripMargin, "/root/testdata/sf0.001")
    // ttl 0 expires immediately: the batch `expired` port would drain
    // at LOAD time (before the feed) — so probe the live object instead
    val kv = graft.functions.VrlCompiler.filterTables("expstore2")
      .asInstanceOf[MemoryKv]
    Thread.sleep(1100) // ttl 0 + whole-second age arithmetic
    val expired = kv.drainExpired()
    assert(expired.map(_._1) == Seq("will_expire"))
    assert(built.outputs.contains("gone")) // the port wired end-to-end
  }

  test("yaml surface: filter tables register and VRL lookups hit/miss") {
    graft.plans.ConfigLoader.load(spark,
      """
        |enrichment_tables:
        |  allow:
        |    type: memory
        |    filter:
        |      type: bloom
        |      max_entries: 512
        |  seen:
        |    type: memory
        |    filter:
        |      type: cuckoo
        |      max_entries: 128
        |sources:
        |  ev:
        |    type: parquet
        |    table: events
        |sinks:
        |  out:
        |    type: parquet
        |    inputs: [ev]
        |""".stripMargin, "/root/testdata/sf0.001")
    val bloom = graft.functions.VrlCompiler.filterTables("allow")
      .asInstanceOf[MemoryFilters.BloomTable]
    val cuckoo = graft.functions.VrlCompiler.filterTables("seen")
      .asInstanceOf[MemoryFilters.CuckooTable]
    bloom.insert("alice"); cuckoo.insert("bob")
    // lookups bind the CURRENT filter state at plan build (the
    // reference's flush-interval analogue)
    val out = graft.functions.VrlCompiler.run(
      Seq(("alice"), ("bob"), ("carol")).toDF("user"),
      """
        |.allow_row = get_enrichment_table_record("allow", {"key": .user})
        |.seen_rows = find_enrichment_table_records("seen", {"key": .user})
        |""".stripMargin).primary
    val rows = out.select(col("user"),
        col("allow_row.key").as("ak"),
        element_at(col("seen_rows"), 1).getField("fingerprint").as("fp"))
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("alice")._1.contains("alice")) // bloom hit row {key,value}
    assert(rows("alice")._2.isEmpty == !cuckoo.contains("alice"))
    assert(rows("bob")._2.contains(cuckoo.fingerprintHex("bob")))
    assert(rows("carol")._1.isEmpty == !bloom.contains("carol"))
  }
}

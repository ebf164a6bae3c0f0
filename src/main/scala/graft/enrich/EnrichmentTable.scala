package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Enrichment tables — the reference's only join surface.
  *
  * Reference: /root/reference/lib/vector-vrl/enrichment/src/lib.rs:105-143
  * (Table trait: find_table_row(s) with ANDed conditions Equals /
  * BetweenDates / FromDate / ToDate, lib.rs:24-43; Case::Sensitive |
  * Insensitive :45-49); file-backed CSV table with a per-key hash index in
  * src/enrichment_tables/file.rs:149-165,510-528 and a wildcard fallback
  * row :340-341.
  *
  * Spark-first: the per-row VRL lookup call is rewritten as a JOIN — the
  * hash index the reference builds by hand is exactly a broadcast hash
  * join (dimension tables are small by construction); date-range
  * conditions become range-join predicates. This keeps the probe side
  * shuffle-free and lets Catalyst prune/pushdown through the join.
  */
object EnrichmentTable {

  /** Equality condition, optionally case-insensitive (join on lower()). */
  final case class Equals(eventCol: Column, tableCol: String,
                          caseInsensitive: Boolean = false)
  /** event ts BETWEEN table.from AND table.to (BetweenDates, lib.rs:30-36). */
  final case class BetweenDates(eventCol: Column, fromCol: String, toCol: String)

  /** `get_enrichment_table_record`-as-join: left join the (broadcast)
    * table; `select` picks which table columns survive.
    */
  def lookup(
      events: DataFrame,
      table: DataFrame,
      equals: Seq[Equals],
      between: Seq[BetweenDates] = Nil,
      select: Seq[String] = Nil): DataFrame = {
    val t = if (select.isEmpty) table
            else table.select((equalsCols(equals, between) ++ select).distinct.map(col): _*)
    val eqConds = equals.map { e =>
      if (e.caseInsensitive) lower(e.eventCol) === lower(t(e.tableCol))
      else e.eventCol === t(e.tableCol)
    }
    val rangeConds = between.map(b => b.eventCol.between(t(b.fromCol), t(b.toCol)))
    val cond = (eqConds ++ rangeConds).reduce(_ && _)
    events.join(broadcast(t), cond, "left")
  }

  private def equalsCols(equals: Seq[Equals], between: Seq[BetweenDates]): Seq[String] =
    equals.map(_.tableCol) ++ between.flatMap(b => Seq(b.fromCol, b.toCol))

  /** File table: CSV with headers (src/enrichment_tables/file.rs). */
  def fromCsv(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** `memory` table (src/enrichment_tables/memory/): a writable kv table
    * fed by a stream of updates; reads see the LATEST value per key,
    * entries older than `ttl` (relative to the newest update) expire.
    * Batch form: max_by per key + TTL filter — the narrow agg output is
    * the broadcastable table.
    */
  def memoryTable(
      updates: DataFrame,
      keyCol: String,
      orderCol: Column,
      payload: Seq[String],
      ttlOf: Option[(Column, String)] = None): DataFrame = {
    val aggs = payload.map(c => max_by(col(c), orderCol).as(c)) ++
      ttlOf.map { case (ts, _) => max_by(ts, orderCol).as("__ts") }
    val latest = updates.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    ttlOf match {
      case None => latest
      case Some((_, ttlExpr)) =>
        // expire keys whose newest update is older than ttl before the
        // table-wide newest update (processing-time analogue in batch)
        val maxTs = updates.agg(max(ttlOf.get._1)).head().get(0)
        latest.filter(
          col("__ts") >= lit(maxTs).cast("timestamp") - expr(ttlExpr))
          .drop("__ts")
    }
  }

  /** geoip/CIDR lookup (src/enrichment_tables/geoip.rs, mmdb.rs): the
    * mmdb is pre-exploded to (cidr, payload) rows; each CIDR becomes a
    * [start, end] uint32 range and the probe is a broadcast range join
    * on ip-as-long — no per-row reader UDF, and Catalyst can push the
    * band predicates down.
    */
  def cidrLookup(
      events: DataFrame,
      ipCol: Column,
      cidrTable: DataFrame,
      cidrCol: String = "cidr"): DataFrame = {
    // Longest-prefix-match semantics (mmdb.rs): overlapping CIDRs only
    // NEST (a /16 sits wholly inside a /8, never straddles), so the
    // most-specific match can be precomputed by DISJOINTIFYING the
    // ranges driver-side — each table row keeps only the parts of its
    // range not covered by a longer-prefix row. The probe then stays one
    // broadcast range join with at most one match per event: no
    // per-event window / row_number shuffle, which matters at scale.
    // Collect the (broadcast-sized by contract) table exactly ONCE and
    // derive everything — indices, ranges, and the final ranged rows —
    // from that snapshot. (An earlier version tagged rows with
    // monotonically_increasing_id and re-evaluated the tagged plan for
    // the final join; mii is non-deterministic across evaluations, so a
    // shuffled/sampled input could mis-align indices between the two
    // jobs.) Malformed CIDR rows (no '/', garbage octets, prefix outside
    // 0..32) are dropped rather than failing the whole job.
    val tableSchema = cidrTable.schema
    val tableRows = cidrTable.collect()
    val cidrAt = tableSchema.fieldIndex(cidrCol)
    val parsed = tableRows.iterator.zipWithIndex.flatMap { case (r, i) =>
      scala.util.Try {
        val Array(ipPart, prefStr) = r.getString(cidrAt).split("/")
        val o = ipPart.split("\\.").map(_.toLong)
        require(o.length == 4 && o.forall(x => x >= 0 && x <= 255))
        val base = o(0) * 16777216L + o(1) * 65536L + o(2) * 256L + o(3)
        val prefix = prefStr.trim.toInt
        require(prefix >= 0 && prefix <= 32)
        val size = 1L << (32 - prefix)
        val start = base - java.lang.Math.floorMod(base, size)
        (i.toLong, start, start + size - 1, prefix)
      }.toOption
    }.toArray
    // pieces of (idx's range) minus union of ranges that shadow it:
    // longer prefix, or same prefix with an earlier idx (dup tiebreak)
    val pieces = parsed.flatMap { case (idx, s, e, p) =>
      val shadows = parsed
        .filter { case (i2, s2, e2, p2) =>
          (p2 > p || (p2 == p && i2 < idx)) && s2 <= e && e2 >= s }
        .map { case (_, s2, e2, _) => (math.max(s2, s), math.min(e2, e)) }
        .sortBy(_._1)
      var cur = s
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      shadows.foreach { case (ss, se) =>
        if (ss > cur) out += ((idx, cur, ss - 1))
        cur = math.max(cur, se + 1)
      }
      if (cur <= e) out += ((idx, cur, e))
      out
    }
    val spark = events.sparkSession
    val rangedSchema = tableSchema
      .add("__start", org.apache.spark.sql.types.LongType)
      .add("__end", org.apache.spark.sql.types.LongType)
    val rangedRows = pieces.map { case (idx, s, e) =>
      org.apache.spark.sql.Row.fromSeq(
        tableRows(idx.toInt).toSeq :+ s :+ e)
    }
    val ranged = spark.createDataFrame(rangedRows.toSeq.asJava, rangedSchema)
    val ipNum = graft.functions.Vrl.ipAton(ipCol)
    events.join(broadcast(ranged),
        ipNum >= ranged("__start") && ipNum <= ranged("__end"), "left")
      .drop("__start", "__end")
  }

  /** Wildcard fallback (file.rs:340-341): rows where `wildcardCol` is the
    * wildcard match any key — implemented as a second (broadcast) join for
    * events that missed the exact match, then coalesced.
    */
  def lookupWithWildcard(
      events: DataFrame,
      table: DataFrame,
      eventKey: Column,
      tableKey: String,
      wildcard: String,
      payload: Seq[String]): DataFrame = {
    val exact = table.filter(col(tableKey) =!= wildcard)
    // at most ONE fallback row (reference: the wildcard row is a single
    // optional per-miss default, file.rs:340-341); left-join on TRUE so a
    // missing wildcard row degrades to nulls instead of deleting the stream
    val fallback = table.filter(col(tableKey) === wildcard)
      .select(payload.map(c => col(c).as(c + "__wc")): _*)
      .limit(1)
    val joined = events
      .join(broadcast(exact), eventKey === exact(tableKey), "left")
      .join(broadcast(fallback), lit(true), "left")
    payload.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), col(c + "__wc")))
    }.drop(payload.map(_ + "__wc"): _*).drop(tableKey)
  }
}

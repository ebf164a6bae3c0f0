package graft.enrich

/** The memory enrichment table's exact kv form as a LIVE, sink-fed
  * object — reference src/enrichment_tables/memory/table.rs:
  * `handle_value` inserts every top-level (field-name → value) pair of
  * each event routed into the table (the table doubles as a sink via
  * its own `inputs:`); `find_table_rows` takes a single Equals
  * condition and a hit returns `{key, value, ttl}` where value is the
  * stored JSON value and ttl the remaining seconds (table.rs:68
  * `as_object_map`). Entries expire `ttl` seconds after their LAST
  * update (config default 600, config.rs `default_ttl`).
  *
  * The batch-analytics analogue of this table already exists
  * (EnrichmentTable.memoryTable — max_by per key + TTL window as one
  * aggregation); THIS class is the YAML/runtime surface: a mutable
  * driver-side store fed by `inputs:`, with VRL lookups binding a
  * snapshot at plan build (the reference's flush-interval analogue).
  * Size is bounded by `max_byte_size` when configured — a bounded
  * driver artifact, not a data-volume structure.
  */
final class MemoryKv(val ttlSecs: Long = 600L,
                     val maxByteSize: Option[Long] = None,
                     clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(valueJson: String, updateMs: Long,
                                 ttl: Long)
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  private val bytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** UTF-8 byte length — the reference's ByteSizeOf counts bytes, not
    * UTF-16 chars.
    */
  private def utf8Len(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong

  /** Insert one (key → value-as-JSON) pair; rejected past max_byte_size
    * (table.rs: "Reject new entries"). Overwrites credit the replaced
    * entry's size first, so shrinking an existing value near the cap is
    * never wrongly rejected.
    */
  def put(key: String, valueJson: String): Boolean = synchronized {
    val kLen = utf8Len(key)
    val sz = kLen + utf8Len(valueJson)
    val existing = entries.get(key)
    val prevSz = if (existing == null) 0L else kLen + utf8Len(existing.valueJson)
    if (maxByteSize.exists(m => bytes.get() - prevSz + sz > m)) return false
    entries.put(key, Entry(valueJson, clock(), ttlSecs))
    bytes.addAndGet(sz - prevSz)
    true
  }

  /** handle_value: every top-level field of the event becomes an entry. */
  def insertEvent(fields: Seq[(String, String)]): Unit =
    fields.foreach { case (k, vj) => put(k, vj) }

  private def removeEntry(key: String): Unit = {
    val prev = entries.remove(key)
    if (prev != null)
      bytes.addAndGet(-(utf8Len(key) + utf8Len(prev.valueJson)))
  }

  /** Live lookup: None when absent or expired; Some((valueJson,
    * remaining-ttl-secs)) otherwise.
    */
  def get(key: String): Option[(String, Long)] = {
    val e = entries.get(key)
    if (e == null) None
    else {
      val age = (clock() - e.updateMs) / 1000
      if (age > e.ttl) { removeEntry(key); None }
      else Some((e.valueJson, math.max(0L, e.ttl - age)))
    }
  }

  /** Snapshot of the live (unexpired) entries for plan-build binding. */
  def snapshot(): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    entries.keySet.asScala.toSeq.sorted.flatMap(k =>
      get(k).map { case (v, ttl) => (k, v, ttl) })
  }

  def size: Int = entries.size

  /** Snapshot AND clear (source.rs `remove_after_export`). */
  def drain(): Seq[(String, String, Long)] = {
    val snap = snapshot()
    snap.foreach { case (k, _, _) => removeEntry(k) }
    snap
  }

  /** Collect-and-remove entries past their ttl — the feed for the
    * `expired` output port (source.rs EXPIRED_ROUTE /
    * `export_expired_items`). Remaining ttl reports 0.
    */
  def drainExpired(): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    val now = clock()
    entries.keySet.asScala.toSeq.sorted.flatMap { k =>
      val e = entries.get(k)
      if (e == null) None
      else if ((now - e.updateMs) / 1000 > e.ttl) {
        removeEntry(k)
        Some((k, e.valueJson, 0L))
      } else None
    }
  }
}

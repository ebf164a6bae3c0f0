package graft.enrich

import java.nio.charset.StandardCharsets.UTF_8

/** MaxMind DB (`.mmdb`) binary format reader + micro writer.
  *
  * The reference loads `.mmdb` files directly for its `geoip` and `mmdb`
  * enrichment-table types (src/enrichment_tables/geoip.rs,
  * src/enrichment_tables/mmdb.rs via the maxminddb crate). This is a
  * from-scratch implementation of the PUBLIC MaxMind DB file format
  * spec (binary search tree of IP prefixes + type-tagged data section +
  * trailing metadata map): https://maxmind.github.io/MaxMind-DB/ .
  *
  * Decoded values map to: String, Long (uint16/32/64, int32), Double
  * (double/float), Boolean, Array[Byte] (bytes), BigInt (uint128),
  * Vector[Any] (array), Map[String, Any] (map).
  *
  * Scale note: a Reader is a thin wrapper over the raw byte array and is
  * Serializable — broadcast the bytes once per executor and walk the
  * tree per row (O(32) byte reads per IPv4 lookup), exactly the
  * reference's runtime shape. The alternative explode-to-CIDR-rows path
  * ([[networks]] → [[EnrichmentTable.cidrLookup]]) keeps lookups inside
  * codegen'd join operators and is preferred when the database is
  * broadcast-sized after explosion.
  */
object Mmdb {

  private val Marker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes(UTF_8)

  final class Reader(val bytes: Array[Byte]) extends Serializable {
    private def u(i: Int): Int = bytes(i) & 0xff

    /** Offset of the metadata section (after the marker). The marker is
      * searched from the END — the spec allows it to also appear in data.
      */
    private val metaStart: Int = {
      var i = bytes.length - Marker.length
      var found = -1
      while (found < 0 && i >= 0) {
        var j = 0
        while (j < Marker.length && bytes(i + j) == Marker(j)) j += 1
        if (j == Marker.length) found = i else i -= 1
      }
      require(found >= 0, "not an mmdb file: metadata marker absent")
      found + Marker.length
    }

    val metadata: Map[String, Any] =
      decode(metaStart, metaStart)._1.asInstanceOf[Map[String, Any]]

    val nodeCount: Int = metadata("node_count").asInstanceOf[Long].toInt
    val recordSize: Int = metadata("record_size").asInstanceOf[Long].toInt
    val ipVersion: Int = metadata("ip_version").asInstanceOf[Long].toInt
    val databaseType: String =
      metadata.getOrElse("database_type", "").asInstanceOf[String]
    require(recordSize == 24 || recordSize == 28 || recordSize == 32,
      s"unsupported record_size $recordSize")
    private val searchTreeSize: Long = nodeCount.toLong * recordSize * 2 / 8
    private val dataStart: Int = (searchTreeSize + 16).toInt

    /** record `side` (0=left, 1=right) of search-tree `node`. */
    private def record(node: Int, side: Int): Int = recordSize match {
      case 24 =>
        val b = node * 6 + side * 3
        (u(b) << 16) | (u(b + 1) << 8) | u(b + 2)
      case 28 =>
        val b = node * 7
        if (side == 0)
          ((u(b + 3) >>> 4) << 24) | (u(b) << 16) | (u(b + 1) << 8) | u(b + 2)
        else
          ((u(b + 3) & 0x0f) << 24) | (u(b + 4) << 16) | (u(b + 5) << 8) | u(b + 6)
      case _ =>
        val b = node * 8 + side * 4
        (u(b) << 24) | (u(b + 1) << 16) | (u(b + 2) << 8) | u(b + 3)
    }

    /** Decode the value at `off`; pointers resolve relative to `base`
      * (the data section for data, the metadata section for metadata).
      * Returns (value, offset just past the encoded form).
      */
    private def decode(off: Int, base: Int): (Any, Int) = {
      val c = u(off)
      var t = c >>> 5
      var p = off + 1
      if (t == 0) { t = u(p) + 7; p += 1 }
      if (t == 1) { // pointer: 001 ss vvv
        val ss = (c >>> 3) & 0x3
        val v = c & 0x7
        val (target, next) = ss match {
          case 0 => ((v << 8) | u(p), p + 1)
          case 1 => (((v << 16) | (u(p) << 8) | u(p + 1)) + 2048, p + 2)
          case 2 => (((v << 24) | (u(p) << 16) | (u(p + 1) << 8) | u(p + 2))
                       + 526336, p + 3)
          case _ => ((u(p) << 24) | (u(p + 1) << 16) | (u(p + 2) << 8)
                       | u(p + 3), p + 4)
        }
        return (decode(base + target, base)._1, next)
      }
      var size = c & 0x1f
      if (t != 14) size match { // boolean keeps size-as-value
        case 29 => size = 29 + u(p); p += 1
        case 30 => size = 285 + (u(p) << 8) + u(p + 1); p += 2
        case 31 =>
          size = 65821 + (u(p) << 16) + (u(p + 1) << 8) + u(p + 2); p += 3
        case _ =>
      }
      def uintBE(n: Int): Long = {
        var v = 0L; var i = 0
        while (i < n) { v = (v << 8) | u(p + i); i += 1 }
        v
      }
      t match {
        case 2 => (new String(bytes, p, size, UTF_8), p + size)
        case 3 =>
          (java.lang.Double.longBitsToDouble(uintBE(8)), p + 8)
        case 4 => (bytes.slice(p, p + size), p + size)
        case 5 | 6 | 9 =>
          if (size <= 8) (uintBE(size), p + size)
          else (BigInt(1, bytes.slice(p, p + size)), p + size)
        case 7 =>
          var o = p
          val b = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val (k, o1) = decode(o, base)
            val (v, o2) = decode(o1, base)
            b += (k.asInstanceOf[String] -> v)
            o = o2; i += 1
          }
          (b.result(), o)
        case 8 =>
          val raw = uintBE(size)
          val shift = 64 - size * 8
          (if (size == 0) 0L else (raw << shift) >> shift, p + size)
        case 10 => (BigInt(1, bytes.slice(p, p + size)), p + size)
        case 11 =>
          var o = p
          val b = Vector.newBuilder[Any]
          var i = 0
          while (i < size) {
            val (v, o1) = decode(o, base); b += v; o = o1; i += 1
          }
          (b.result(), o)
        case 14 => (size == 1, p)
        case 15 =>
          (java.lang.Float.intBitsToFloat(uintBE(4).toInt).toDouble, p + 4)
        case other =>
          throw new IllegalArgumentException(s"mmdb: unsupported type $other")
      }
    }

    private def dataAt(rec: Int): Any =
      decode((searchTreeSize + (rec - nodeCount)).toInt, dataStart)._1

    /** Node reached by following 96 zero bits — where IPv4 space lives
      * inside an IPv6 tree (the spec's v4-in-v6 embedding).
      */
    private lazy val ipv4Start: Int = {
      var node = 0
      var i = 0
      while (i < 96 && node < nodeCount) { node = record(node, 0); i += 1 }
      node
    }

    /** Longest-prefix lookup of a dotted-quad IPv4 string. Returns the
      * matched network CIDR (geoip.rs exposes it as `network`) and the
      * decoded record map; None on miss or malformed input.
      */
    def lookupV4(ip: String): Option[(String, Map[String, Any])] = {
      val parts = ip.trim.split("\\.")
      if (parts.length != 4) return None
      var addr = 0L
      var i = 0
      while (i < 4) {
        val o = try parts(i).toInt catch { case _: Exception => return None }
        if (o < 0 || o > 255) return None
        addr = (addr << 8) | o
        i += 1
      }
      var node = if (ipVersion == 6) ipv4Start else 0
      var depth = 0
      while (depth < 32 && node < nodeCount) {
        val bit = ((addr >>> (31 - depth)) & 1).toInt
        node = record(node, bit)
        depth += 1
      }
      if (node <= nodeCount) None // ran out of tree, or the no-data node
      else {
        val mask = if (depth == 0) 0L else -1L << (32 - depth) & 0xffffffffL
        val net = addr & mask
        val cidr = s"${net >> 24 & 255}.${net >> 16 & 255}." +
          s"${net >> 8 & 255}.${net & 255}/$depth"
        Some((cidr, dataAt(node).asInstanceOf[Map[String, Any]]))
      }
    }

    /** Enumerate every IPv4 network in the tree as (cidr, record). DFS
      * over the v4 subtree only — MaxMind's ::ffff:0:0/96 / 2002::/16
      * alias nodes live outside it, so no network is visited twice.
      */
    def networks(): Seq[(String, Map[String, Any])] = {
      val out = Seq.newBuilder[(String, Map[String, Any])]
      def walk(node: Int, addr: Long, depth: Int): Unit = {
        if (node > nodeCount) {
          val net = addr << (32 - depth) & 0xffffffffL
          val cidr = s"${net >> 24 & 255}.${net >> 16 & 255}." +
            s"${net >> 8 & 255}.${net & 255}/$depth"
          out += ((cidr, dataAt(node).asInstanceOf[Map[String, Any]]))
        } else if (node < nodeCount && depth < 33) {
          walk(record(node, 0), addr << 1, depth + 1)
          walk(record(node, 1), addr << 1 | 1, depth + 1)
        }
      }
      walk(if (ipVersion == 6) ipv4Start else 0, 0L, 0)
      out.result()
    }
  }

  def apply(bytes: Array[Byte]): Reader = new Reader(bytes)

  def fromFile(path: String): Reader =
    new Reader(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  // -------------------------------------------------------------------
  // Micro writer — deterministic fixture builder so tests and oracle
  // queries exercise the REAL binary decode path without shipping any
  // third-party binary. Emits a spec-conformant IPv4 db with 24-bit
  // records; payload maps are deduplicated by value (shared data-section
  // entries, like real builders), strings are NOT pointer-compressed
  // (the reader handles pointers; the reference test dbs cover them).
  // -------------------------------------------------------------------

  def build(networks: Seq[(String, Map[String, Any])],
            databaseType: String = "Test-DB"): Array[Byte] = {
    // search tree as growable nodes: records hold either a node index
    // (>= 0), Empty (-1), or -(2 + dataOffset) for data
    val left = scala.collection.mutable.ArrayBuffer(-1)
    val right = scala.collection.mutable.ArrayBuffer(-1)
    val data = new java.io.ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Map[String, Any], Int]

    def encode(v: Any, out: java.io.ByteArrayOutputStream): Unit = {
      def ctrl(t: Int, size: Int): Unit = {
        require(size < 285, "micro writer: size >= 285 unsupported")
        val marker = if (size < 29) size else 29
        if (t <= 7) out.write((t << 5) | marker)
        else { out.write(marker); out.write(t - 7) }
        if (size >= 29) out.write(size - 29)
      }
      v match {
        case s: String =>
          val b = s.getBytes(UTF_8); ctrl(2, b.length); out.write(b)
        case d: Double =>
          ctrl(3, 8)
          val bits = java.lang.Double.doubleToLongBits(d)
          var i = 7
          while (i >= 0) { out.write(((bits >>> (i * 8)) & 0xff).toInt); i -= 1 }
        case n: Long =>
          if (n >= 0) {
            var nb = 0; var x = n
            while (x != 0) { nb += 1; x >>>= 8 }
            ctrl(6, nb)
            var i = nb - 1
            while (i >= 0) { out.write(((n >>> (i * 8)) & 0xff).toInt); i -= 1 }
          } else {
            ctrl(8, 4)
            var i = 3
            while (i >= 0) { out.write(((n >> (i * 8)) & 0xff).toInt); i -= 1 }
          }
        case n: Int => encode(n.toLong, out)
        case b: Boolean => ctrl(14, if (b) 1 else 0)
        case m: Map[_, _] =>
          ctrl(7, m.size)
          m.asInstanceOf[Map[String, Any]].foreach { case (k, x) =>
            encode(k, out); encode(x, out)
          }
        case a: Seq[_] =>
          ctrl(11, a.size); a.foreach(encode(_, out))
        case other =>
          throw new IllegalArgumentException(
            s"micro writer: unsupported ${other.getClass}")
      }
    }

    def dataOffset(m: Map[String, Any]): Int = offsets.getOrElseUpdate(m, {
      val off = data.size(); encode(m, data); off
    })

    networks.foreach { case (cidr, payload) =>
      val Array(ipPart, prefStr) = cidr.split("/")
      val o = ipPart.split("\\.").map(_.toLong)
      require(o.length == 4 && o.forall(x => x >= 0 && x <= 255), cidr)
      val addr = (o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3)
      val prefix = prefStr.toInt
      require(prefix >= 1 && prefix <= 32, cidr)
      var node = 0
      var depth = 0
      while (depth < prefix - 1) {
        val bit = ((addr >>> (31 - depth)) & 1).toInt
        val recs = if (bit == 0) left else right
        if (recs(node) == -1) {
          recs(node) = left.length; left += -1; right += -1
        } else require(recs(node) >= 0,
          s"micro writer: nested networks unsupported ($cidr)")
        node = recs(node)
        depth += 1
      }
      val bit = ((addr >>> (31 - depth)) & 1).toInt
      val recs = if (bit == 0) left else right
      require(recs(node) == -1, s"overlapping network $cidr")
      recs(node) = -(2 + dataOffset(payload))
    }

    val nodeCount = left.length
    val tree = new java.io.ByteArrayOutputStream()
    def rec(r: Int): Int =
      if (r == -1) nodeCount
      else if (r < -1) nodeCount + 16 + (-r - 2)
      else r
    var i = 0
    while (i < nodeCount) {
      Seq(rec(left(i)), rec(right(i))).foreach { v =>
        tree.write((v >>> 16) & 0xff); tree.write((v >>> 8) & 0xff)
        tree.write(v & 0xff)
      }
      i += 1
    }

    val meta = new java.io.ByteArrayOutputStream()
    encode(Map[String, Any](
      "binary_format_major_version" -> 2L,
      "binary_format_minor_version" -> 0L,
      "node_count" -> nodeCount.toLong,
      "record_size" -> 24L,
      "ip_version" -> 4L,
      "database_type" -> databaseType,
      "languages" -> Seq("en"),
      "description" -> Map[String, Any]("en" -> "graft micro fixture"),
      "build_epoch" -> 0L), meta)

    val out = new java.io.ByteArrayOutputStream()
    tree.writeTo(out)
    out.write(new Array[Byte](16)) // data-section separator
    data.writeTo(out)
    out.write(Marker)
    meta.writeTo(out)
    out.toByteArray
  }
}

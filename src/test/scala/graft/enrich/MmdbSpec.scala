package graft.enrich

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MaxMind-DB binary reader: byte-level roundtrips against our own
  * micro writer, plus the reference's published geoip.rs unit-test
  * goldens run against MaxMind's test databases
  * (reference tests/data mmdb files, read in place when present).
  */
class MmdbSpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/tests/data"
  private def refDb(name: String): Option[Mmdb.Reader] = {
    val p = java.nio.file.Paths.get(refData, name)
    if (java.nio.file.Files.isReadable(p)) Some(Mmdb.fromFile(p.toString))
    else None
  }

  private def microDb: Array[Byte] = Mmdb.build(Seq(
    "10.0.0.0/8" -> Map[String, Any](
      "autonomous_system_number" -> 64512L,
      "autonomous_system_organization" -> "Alpha Net"),
    "192.168.0.0/16" -> Map[String, Any](
      "autonomous_system_number" -> 64513L,
      "autonomous_system_organization" -> "Beta Net"),
    "172.16.0.0/12" -> Map[String, Any](
      "autonomous_system_number" -> 64514L,
      "autonomous_system_organization" -> "Gamma Net",
      "flags" -> Map[String, Any]("hosting" -> true, "score" -> 0.25)),
    "8.8.8.0/24" -> Map[String, Any](
      "autonomous_system_number" -> 15169L,
      "autonomous_system_organization" -> "Example LLC")),
    databaseType = "GeoLite2-ASN")

  test("micro writer -> reader roundtrip: lookups, misses, prefixes") {
    val r = Mmdb(microDb)
    assert(r.databaseType == "GeoLite2-ASN")
    assert(r.ipVersion == 4)
    val hit = r.lookupV4("10.1.2.3")
    assert(hit.exists(_._1 == "10.0.0.0/8"))
    assert(hit.exists(_._2("autonomous_system_number") == 64512L))
    assert(r.lookupV4("8.8.8.8").exists(_._2("autonomous_system_organization") == "Example LLC"))
    // nested payloads decode structurally
    val gamma = r.lookupV4("172.20.0.1").get._2
    assert(gamma("flags").asInstanceOf[Map[String, Any]] ==
      Map("hosting" -> true, "score" -> 0.25))
    // misses: outside every network, malformed input
    assert(r.lookupV4("9.0.0.1").isEmpty)
    assert(r.lookupV4("not-an-ip").isEmpty)
    assert(r.lookupV4("1.2.3.4.5").isEmpty)
  }

  test("micro writer -> networks() enumerates exactly what was written") {
    val nets = Mmdb(microDb).networks().toMap
    assert(nets.keySet == Set(
      "10.0.0.0/8", "192.168.0.0/16", "172.16.0.0/12", "8.8.8.0/24"))
    assert(nets("8.8.8.0/24")("autonomous_system_number") == 15169L)
  }

  test("reference geoip.rs golden: City full lookup (2.125.160.216)") {
    refDb("GeoIP2-City-Test.mmdb").foreach { r =>
      val df = MmdbEnrich.lookup(Seq("2.125.160.216").toDF("ip"), col("ip"), r)
      val row = df.collect().head
      assert(row.getAs[String]("city_name") == "Boxford")
      assert(row.getAs[String]("country_code") == "GB")
      assert(row.getAs[String]("continent_code") == "EU")
      assert(row.getAs[String]("country_name") == "United Kingdom")
      assert(row.getAs[String]("region_code") == "WBK")
      assert(row.getAs[String]("region_name") == "West Berkshire")
      assert(row.getAs[String]("timezone") == "Europe/London")
      assert(row.getAs[Double]("latitude") == 51.75)
      assert(row.getAs[Double]("longitude") == -1.25)
      assert(row.getAs[String]("postal_code") == "OX1")
      assert(row.isNullAt(row.fieldIndex("metro_code")))
      assert(row.getAs[String]("network") == "2.125.160.216/29")
    }
  }

  test("reference geoip.rs golden: City partial record (67.43.156.9)") {
    refDb("GeoIP2-City-Test.mmdb").foreach { r =>
      val df = MmdbEnrich.lookup(Seq("67.43.156.9").toDF("ip"), col("ip"), r)
      val row = df.collect().head
      assert(row.isNullAt(row.fieldIndex("city_name")))
      assert(row.getAs[String]("country_code") == "BT")
      assert(row.getAs[String]("country_name") == "Bhutan")
      assert(row.getAs[String]("timezone") == "Asia/Thimphu")
      assert(row.getAs[Double]("latitude") == 27.5)
      assert(row.isNullAt(row.fieldIndex("region_code")))
      assert(row.getAs[String]("network") == "67.43.156.0/24")
    }
  }

  test("reference geoip.rs golden: City miss keeps the event, null fields") {
    refDb("GeoIP2-City-Test.mmdb").foreach { r =>
      val df = MmdbEnrich.lookup(Seq("10.1.12.1").toDF("ip"), col("ip"), r)
      val row = df.collect().head
      assert(row.getAs[String]("ip") == "10.1.12.1")
      assert(row.isNullAt(row.fieldIndex("network")))
    }
  }

  test("reference geoip.rs golden: ISP lookup (208.192.1.2)") {
    refDb("GeoIP2-ISP-Test.mmdb").foreach { r =>
      val df = MmdbEnrich.lookup(Seq("208.192.1.2").toDF("ip"), col("ip"), r)
      val row = df.collect().head
      assert(row.getAs[Long]("autonomous_system_number") == 701L)
      assert(row.getAs[String]("autonomous_system_organization") ==
        "MCI Communications Services, Inc. d/b/a Verizon Business")
      assert(row.getAs[String]("isp") == "Verizon Business")
      assert(row.getAs[String]("organization") == "Verizon Business")
      assert(row.getAs[String]("network") == "208.192.0.0/10")
    }
  }

  test("explode path agrees with tree-walk path on the City test db") {
    refDb("GeoIP2-City-Test.mmdb").foreach { r =>
      val nets = MmdbEnrich.networksDf(spark, r)
      assert(nets.count() > 0)
      // probe the first address of a handful of enumerated networks
      // through BOTH paths; payload fields must agree
      val probes = nets.select("cidr", "country_code").collect().toSeq
        .filter(!_.isNullAt(1)).take(8)
        .map(x => (x.getString(0).split("/")(0), x.getString(1)))
      val df = MmdbEnrich.lookup(
        probes.map(_._1).toDF("ip"), col("ip"), r)
      val byIp = df.select("ip", "country_code").collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
      probes.foreach { case (ip, cc) => assert(byIp(ip) == cc, ip) }
      // and the cidrLookup join path agrees too
      val joined = EnrichmentTable.cidrLookup(
        probes.map(_._1).toDF("ip"), col("ip"),
        nets.withColumnRenamed("country_code", "cc_joined")
          .select("cidr", "cc_joined"))
      val byIp2 = joined.select("ip", "cc_joined").collect()
        .map(x => x.getString(0) -> x.getString(1)).toMap
      probes.foreach { case (ip, cc) => assert(byIp2(ip) == cc, ip) }
    }
  }

  test("generic mmdb table type: custom record decodes to JSON") {
    refDb("custom-type.mmdb").foreach { r =>
      assert(MmdbEnrich.kindOf(r.databaseType) == MmdbEnrich.Generic)
      val nets = r.networks()
      assume(nets.nonEmpty)
      val ip = nets.head._1.split("/")(0)
      val df = MmdbEnrich.lookup(Seq(ip).toDF("ip"), col("ip"), r)
      val rec = df.collect().head.getAs[String]("record")
      assert(rec != null && rec.startsWith("{"))
      // JSON text matches the directly-decoded record
      assert(graft.functions.JsonLite.parse(rec) != null)
    }
  }

  test("anonymous-ip kind flattens boolean flags") {
    refDb("GeoIP2-Anonymous-IP-Test.mmdb").foreach { r =>
      assert(MmdbEnrich.kindOf(r.databaseType) == MmdbEnrich.AnonymousIp)
      val nets = MmdbEnrich.networksDf(spark, r)
      assert(nets.columns.contains("is_anonymous"))
      assert(nets.count() > 0)
      // at least one network carries a true flag in MaxMind's test data
      assert(nets.filter(col("is_anonymous") === true).count() > 0)
    }
  }
}

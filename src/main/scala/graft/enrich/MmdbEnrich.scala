package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's two mmdb-backed enrichment-table types on Spark:
  *
  *  - `geoip` (src/enrichment_tables/geoip.rs): kind-specific flattening
  *    keyed off the database_type metadata — City, ASN/ISP,
  *    Connection-Type, Anonymous-IP — with the matched network CIDR in a
  *    `network` field and localized name translation (`locale`, default
  *    "en", geoip.rs take_translation).
  *  - `mmdb` (src/enrichment_tables/mmdb.rs): the whole decoded record,
  *    schema-free — surfaced here as a JSON string column (dynamic
  *    schema; feed to parse_json / variant downstream).
  *
  * Scale: [[lookup]] broadcasts the raw database bytes once and walks
  * the search tree per row (O(32) reads/lookup, zero shuffle — the
  * reference's own runtime shape, a per-host reader). [[networksDf]] is
  * the alternative explode path: enumerate every IPv4 network into a
  * broadcast-sized (cidr, fields…) table and use
  * [[EnrichmentTable.cidrLookup]]'s codegen'd range join.
  */
object MmdbEnrich {

  sealed trait Kind
  case object City extends Kind
  case object Isp extends Kind // covers GeoLite2-ASN + GeoIP2-ISP
  case object ConnectionType extends Kind
  case object AnonymousIp extends Kind
  case object Generic extends Kind // `mmdb` table type: raw record

  /** geoip.rs DatabaseKind::try_from — exact database_type strings. */
  def kindOf(databaseType: String): Kind = databaseType match {
    case "GeoLite2-ASN" | "GeoIP2-ISP" => Isp
    case "GeoIP2-City" | "GeoLite2-City" => City
    case "GeoIP2-Connection-Type" => ConnectionType
    case "GeoIP2-Anonymous-IP" => AnonymousIp
    case _ => Generic
  }

  /** Flattened output schema per kind (geoip.rs lookup(), field order as
    * emitted there). All fields nullable — partial records are the norm.
    */
  def schemaOf(kind: Kind): StructType = kind match {
    case City => StructType(Seq(
      StructField("city_name", StringType),
      StructField("continent_code", StringType),
      StructField("country_code", StringType),
      StructField("country_name", StringType),
      StructField("timezone", StringType),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("metro_code", LongType),
      StructField("region_name", StringType),
      StructField("region_code", StringType),
      StructField("postal_code", StringType),
      StructField("network", StringType)))
    case Isp => StructType(Seq(
      StructField("autonomous_system_number", LongType),
      StructField("autonomous_system_organization", StringType),
      StructField("isp", StringType),
      StructField("organization", StringType),
      StructField("network", StringType)))
    case ConnectionType => StructType(Seq(
      StructField("connection_type", StringType),
      StructField("network", StringType)))
    case AnonymousIp => StructType(Seq(
      StructField("is_anonymous", BooleanType),
      StructField("is_anonymous_vpn", BooleanType),
      StructField("is_hosting_provider", BooleanType),
      StructField("is_public_proxy", BooleanType),
      StructField("is_residential_proxy", BooleanType),
      StructField("is_tor_exit_node", BooleanType),
      StructField("network", StringType)))
    case Generic => StructType(Seq(
      StructField("record", StringType),
      StructField("network", StringType)))
  }

  private def sub(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k) match {
      case Some(x: Map[_, _]) => x.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
  private def str(m: Map[String, Any], k: String): Any =
    m.get(k).collect { case s: String => s }.orNull
  private def names(m: Map[String, Any], locale: String): Any =
    str(sub(m, "names"), locale)

  /** One decoded record -> flattened field values in [[schemaOf]] order
    * (geoip.rs lookup(); missing anywhere -> null, metro_code kept
    * numeric, the LAST subdivision is the most specific).
    */
  def flatten(kind: Kind, rec: Map[String, Any], network: String,
              locale: String): Seq[Any] = kind match {
    case City =>
      val country = sub(rec, "country")
      val location = sub(rec, "location")
      val subdivision = rec.get("subdivisions") match {
        case Some(v: Vector[_]) if v.nonEmpty =>
          v.last.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      Seq(
        names(sub(rec, "city"), locale),
        str(sub(rec, "continent"), "code"),
        str(country, "iso_code"),
        names(country, locale),
        str(location, "time_zone"),
        location.get("latitude").collect { case d: Double => d }.orNull,
        location.get("longitude").collect { case d: Double => d }.orNull,
        location.get("metro_code").collect { case l: Long => l }.orNull,
        names(subdivision, locale),
        str(subdivision, "iso_code"),
        str(sub(rec, "postal"), "code"),
        network)
    case Isp =>
      Seq(
        rec.get("autonomous_system_number").collect { case l: Long => l }.orNull,
        str(rec, "autonomous_system_organization"),
        str(rec, "isp"),
        str(rec, "organization"),
        network)
    case ConnectionType => Seq(str(rec, "connection_type"), network)
    case AnonymousIp =>
      def b(k: String): Any =
        rec.get(k).collect { case x: Boolean => x }.orNull
      Seq(b("is_anonymous"), b("is_anonymous_vpn"), b("is_hosting_provider"),
        b("is_public_proxy"), b("is_residential_proxy"),
        b("is_tor_exit_node"), network)
    case Generic => Seq(graft.functions.JsonLite.render(toJava(rec)), network)
  }

  /** Scala decode tree -> JsonLite's Java value model for rendering. */
  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .foreach { case (k, x) => out.put(k, toJava(x)) }
      out
    case s: Vector[_] =>
      val out = new java.util.ArrayList[Any](s.size)
      s.foreach(x => out.add(toJava(x)))
      out
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case bi: BigInt => bi.toString()
    case other => other
  }

  /** Per-row tree-walk lookup: adds `prefix`-named columns (the flattened
    * kind fields) to `events`. The Reader rides the closure — Spark
    * broadcasts it once per executor with the task binary; lookups are
    * pure byte-array reads, no shuffle, misses yield all-null fields
    * (the reference emits no fields on a miss; a left-join shape keeps
    * the event regardless, matching enrichment-transform usage).
    */
  /** The tree-walk lookup as a bare struct Column + its schema — used
    * directly by the VRL compiler for get_enrichment_table_record on a
    * geoip/mmdb table (reference enrichment.cue lookups key on "ip").
    */
  def lookupCol(ipCol: Column, reader: Mmdb.Reader,
                locale: String = "en"): (Column, StructType) = {
    val kind = kindOf(reader.databaseType)
    val schema = schemaOf(kind)
    val f = udf(
      new org.apache.spark.sql.api.java.UDF1[String, Row] {
        override def call(ip: String): Row =
          if (ip == null) null
          else reader.lookupV4(ip) match {
            case Some((net, rec)) =>
              Row.fromSeq(flatten(kind, rec, net, locale))
            case None => null
          }
      }, schema)
    (f(ipCol.cast("string")), schema)
  }

  def lookup(events: DataFrame, ipCol: Column, reader: Mmdb.Reader,
             locale: String = "en", prefix: String = ""): DataFrame = {
    val (lookedCol, schema) = lookupCol(ipCol, reader, locale)
    val looked = events.withColumn("__mmdb", lookedCol)
    schema.fieldNames.foldLeft(looked) { (df, n) =>
      df.withColumn(prefix + n, col("__mmdb").getField(n))
    }.drop("__mmdb")
  }

  /** Explode path: every IPv4 network as one row (`cidr` + flattened
    * fields), ready for [[EnrichmentTable.cidrLookup]]'s broadcast range
    * join — keeps the probe inside codegen'd operators when the exploded
    * table is broadcast-sized.
    */
  def networksDf(spark: SparkSession, reader: Mmdb.Reader,
                 locale: String = "en"): DataFrame = {
    val kind = kindOf(reader.databaseType)
    val schema = StructType(StructField("cidr", StringType) +:
      schemaOf(kind).fields.filterNot(_.name == "network"))
    val rows = reader.networks().map { case (cidr, rec) =>
      Row.fromSeq(cidr +: flatten(kind, rec, cidr, locale).dropRight(1))
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toList.asJava, schema)
  }
}

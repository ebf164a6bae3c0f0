package graft.streaming

import graft.functions.JsonLite

/** `aws_ec2_metadata` (src/transforms/aws_ec2_metadata.rs) — a real
  * IMDSv2 client: PUT `/latest/api/token` with the TTL header, then
  * token-authenticated GETs of the instance-identity document
  * (`/latest/dynamic/instance-identity/document` → instance-id/type,
  * ami-id, account-id, region, availability-zone) plus the hostname /
  * ip / mac-scoped network paths and the IAM role name. Fetched
  * driver-side on the refresh interval — the values are per-host
  * constants, so enrichment stays literal columns (broadcast by
  * construction; at 1000 executors each worker would run its own
  * sidecar fetch, which is exactly the reference's per-instance model).
  */
object Ec2Metadata {

  final case class Fetched(fields: Map[String, String])

  def fetch(endpoint: String,
            allow: Set[String] = Set.empty): Fetched = {
    def http(method: String, path: String,
             headers: Map[String, String]): Option[String] =
      try {
        val conn = new java.net.URI(endpoint.stripSuffix("/") + path)
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod(method)
        conn.setConnectTimeout(2000); conn.setReadTimeout(2000)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        if (method == "PUT") { conn.setDoOutput(true); conn.getOutputStream.close() }
        if (conn.getResponseCode == 200)
          Some(new String(conn.getInputStream.readAllBytes(), "UTF-8"))
        else None
      } catch { case _: Exception => None }

    // IMDSv2 session token (:426 — 6h TTL header)
    val token = http("PUT", "/latest/api/token",
      Map("X-aws-ec2-metadata-token-ttl-seconds" -> "21600"))
      .getOrElse(throw new java.io.IOException("imds: no token"))
    val auth = Map("X-aws-ec2-metadata-token" -> token)
    def get(path: String): Option[String] =
      http("GET", path, auth).map(_.trim).filter(_.nonEmpty)

    val out = scala.collection.mutable.Map.empty[String, String]
    def put(k: String, v: Option[String]): Unit =
      v.foreach { x => if (allow.isEmpty || allow.contains(k)) out(k) = x }

    // identity document carries the id/account/region block in one GET
    get("/latest/dynamic/instance-identity/document").foreach { doc =>
      try {
        val m = JsonLite.parse(doc).asInstanceOf[java.util.Map[String, Any]]
        def f(k: String): Option[String] = Option(m.get(k)).map(_.toString)
        put("instance-id", f("instanceId"))
        put("instance-type", f("instanceType"))
        put("ami-id", f("imageId"))
        put("account-id", f("accountId"))
        put("region", f("region"))
        put("availability-zone", f("availabilityZone"))
      } catch { case _: Exception => () }
    }
    put("availability-zone",
      get("/latest/meta-data/placement/availability-zone"))
    put("local-hostname", get("/latest/meta-data/local-hostname"))
    put("local-ipv4", get("/latest/meta-data/local-ipv4"))
    put("public-hostname", get("/latest/meta-data/public-hostname"))
    put("public-ipv4", get("/latest/meta-data/public-ipv4"))
    put("role-name",
      get("/latest/meta-data/iam/security-credentials/")
        .map(_.linesIterator.next()))
    get("/latest/meta-data/mac").foreach { mac =>
      put("vpc-id",
        get(s"/latest/meta-data/network/interfaces/macs/$mac/vpc-id"))
      put("subnet-id",
        get(s"/latest/meta-data/network/interfaces/macs/$mac/subnet-id"))
    }
    Fetched(out.toMap)
  }
}

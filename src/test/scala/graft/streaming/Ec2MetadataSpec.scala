package graft.streaming

import graft.SparkSpec

/** aws_ec2_metadata against a fake IMDSv2 endpoint: token dance,
  * identity document, mac-scoped network paths, field allowlist.
  */
class Ec2MetadataSpec extends SparkSpec {
  import spark.implicits._

  private def imds(): (com.sun.net.httpserver.HttpServer, String) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, body: String,
              code: Int = 200): Unit = {
      val out = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, out.length)
      ex.getResponseBody.write(out); ex.close()
    }
    def authed(ex: com.sun.net.httpserver.HttpExchange): Boolean =
      Option(ex.getRequestHeaders.getFirst("X-aws-ec2-metadata-token"))
        .contains("tok-imds")
    server.createContext("/latest/api/token", { ex =>
      // IMDSv2: token only via PUT with the TTL header
      if (ex.getRequestMethod == "PUT" && Option(ex.getRequestHeaders
          .getFirst("X-aws-ec2-metadata-token-ttl-seconds")).isDefined)
        reply(ex, "tok-imds")
      else reply(ex, "nope", 403)
    })
    server.createContext("/latest/", { ex =>
      if (!authed(ex)) reply(ex, "unauthorized", 401)
      else ex.getRequestURI.getPath match {
        case "/latest/dynamic/instance-identity/document" =>
          reply(ex,
            """{"instanceId":"i-0abc","instanceType":"m5.large",
              |"imageId":"ami-123","accountId":"999","region":"us-east-1",
              |"availabilityZone":"us-east-1b"}""".stripMargin
              .replace("\n", ""))
        case "/latest/meta-data/local-hostname" => reply(ex, "ip-10-0-0-1")
        case "/latest/meta-data/local-ipv4" => reply(ex, "10.0.0.1")
        case "/latest/meta-data/iam/security-credentials/" =>
          reply(ex, "my-role\n")
        case "/latest/meta-data/mac" => reply(ex, "0a:ff:ee:00:00:01")
        case "/latest/meta-data/network/interfaces/macs/0a:ff:ee:00:00:01/vpc-id" =>
          reply(ex, "vpc-77")
        case "/latest/meta-data/network/interfaces/macs/0a:ff:ee:00:00:01/subnet-id" =>
          reply(ex, "subnet-42")
        case _ => reply(ex, "", 404)
      }
    })
    server.start()
    (server, s"http://localhost:${server.getAddress.getPort}")
  }

  test("fetch: token dance + identity document + network paths") {
    val (srv, url) = imds()
    try {
      val f = Ec2Metadata.fetch(url)
      assert(f.fields("instance-id") == "i-0abc")
      assert(f.fields("instance-type") == "m5.large")
      assert(f.fields("account-id") == "999")
      assert(f.fields("region") == "us-east-1")
      assert(f.fields("availability-zone") == "us-east-1b")
      assert(f.fields("local-ipv4") == "10.0.0.1")
      assert(f.fields("role-name") == "my-role")
      assert(f.fields("vpc-id") == "vpc-77")
      assert(f.fields("subnet-id") == "subnet-42")
    } finally srv.stop(0)
  }

  test("fields allowlist restricts enrichment; YAML transform wires it") {
    val (srv, url) = imds()
    try {
      val f = Ec2Metadata.fetch(url, allow = Set("instance-id", "region"))
      assert(f.fields.keySet == Set("instance-id", "region"))
      val built = graft.plans.ConfigLoader.load(spark,
        s"""
          |sources:
          |  in:
          |    type: parquet
          |    table: events
          |transforms:
          |  meta:
          |    type: aws_ec2_metadata
          |    inputs: [in]
          |    endpoint: $url
          |    fields: [instance-id, availability-zone]
          |sinks:
          |  out:
          |    type: memory
          |    inputs: [meta]
          |""".stripMargin, "/root/testdata/sf0.001")
      val df = built.outputs("out")
      val row = df.limit(1).collect().head
      assert(row.getAs[String]("instance-id") == "i-0abc")
      assert(row.getAs[String]("availability-zone") == "us-east-1b")
      assert(!df.columns.contains("region")) // allowlisted out
    } finally srv.stop(0)
  }
}

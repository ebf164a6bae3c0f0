package graft.streaming

import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory,
  X509TrustManager}

/** TLS config subset — the reference wires a `tls:` block into virtually
  * every source and sink (src/tls/settings.rs TlsConfig:
  * `enabled / crt_file / key_file / ca_file / verify_certificate`).
  * This is the JDK-SSLContext equivalent over the same config shape:
  * PEM in, SSLContext out; transports stay unchanged above the socket
  * factory, exactly like the reference's MaybeTls wrapping.
  *
  * Supported PEM forms: X.509 certificates (CertificateFactory reads
  * PEM natively) and PKCS#8 private keys (`BEGIN PRIVATE KEY`) for RSA
  * or EC — the forms every modern issuance tool emits.
  */
object Tls {

  final case class Config(enabled: Boolean = false,
                          crtFile: Option[String] = None,
                          keyFile: Option[String] = None,
                          caFile: Option[String] = None,
                          verifyCertificate: Boolean = true,
                          verifyHostname: Boolean = true)

  /** Parse the YAML `tls:` block (absent block = disabled). */
  def configOf(m: Map[String, Any]): Config =
    Config(
      enabled = m.getOrElse("enabled", "false").toString.toBoolean,
      crtFile = m.get("crt_file").map(_.toString),
      keyFile = m.get("key_file").map(_.toString),
      caFile = m.get("ca_file").map(_.toString),
      verifyCertificate =
        m.getOrElse("verify_certificate", "true").toString.toBoolean,
      verifyHostname =
        m.getOrElse("verify_hostname", "true").toString.toBoolean)

  private def readPem(path: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))

  private def certsOf(path: String): Seq[java.security.cert.Certificate] = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    import scala.jdk.CollectionConverters._
    cf.generateCertificates(new java.io.ByteArrayInputStream(readPem(path)))
      .asScala.toSeq
  }

  /** PKCS#8 PEM private key → PrivateKey (RSA, then EC, then Ed25519). */
  private def privateKeyOf(path: String): java.security.PrivateKey = {
    val pem = new String(readPem(path), "US-ASCII")
    val b64 = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.trim.isEmpty)
      .mkString
    val der = java.util.Base64.getDecoder.decode(b64)
    val spec = new java.security.spec.PKCS8EncodedKeySpec(der)
    val algos = Seq("RSA", "EC", "Ed25519")
    algos.view.flatMap { a =>
      try Some(java.security.KeyFactory.getInstance(a).generatePrivate(spec))
      catch { case _: Exception => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"tls: unsupported private key in $path (PKCS#8 RSA/EC expected)"))
  }

  /** Server-side context: identity from crt_file + key_file. */
  def serverContext(cfg: Config): SSLContext = {
    val crt = cfg.crtFile.getOrElse(throw new IllegalArgumentException(
      "tls: crt_file is required for a TLS server"))
    val key = cfg.keyFile.getOrElse(throw new IllegalArgumentException(
      "tls: key_file is required for a TLS server"))
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("identity", privateKeyOf(key), Array.emptyCharArray,
      certsOf(crt).toArray)
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client-side context: trust from ca_file (or the JDK default roots);
    * `verify_certificate: false` trusts anything — same escape hatch as
    * the reference (settings.rs verify_certificate).
    */
  def clientContext(cfg: Config): SSLContext = {
    val ctx = SSLContext.getInstance("TLS")
    val tms: Array[javax.net.ssl.TrustManager] =
      if (!cfg.verifyCertificate) Array(new X509TrustManager {
        def checkClientTrusted(c: Array[java.security.cert.X509Certificate],
                               a: String): Unit = ()
        def checkServerTrusted(c: Array[java.security.cert.X509Certificate],
                               a: String): Unit = ()
        def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      })
      else cfg.caFile match {
        case Some(ca) =>
          val ts = KeyStore.getInstance("PKCS12")
          ts.load(null, null)
          certsOf(ca).zipWithIndex.foreach { case (c, i) =>
            ts.setCertificateEntry(s"ca$i", c) }
          val tmf = TrustManagerFactory.getInstance(
            TrustManagerFactory.getDefaultAlgorithm)
          tmf.init(ts)
          tmf.getTrustManagers
        case None => null // JDK default trust roots
      }
    ctx.init(null, tms, null)
    ctx
  }

  /** Enable RFC 6125 hostname verification on an SSLSocket before its
    * handshake — without this, any certificate signed by a trusted CA
    * for a *different* host would pass (MITM). The reference's
    * TlsConfig has `verify_hostname` defaulting to true
    * (src/tls/settings.rs).
    */
  private def withEndpointId(s: java.net.Socket): java.net.Socket = s match {
    case ssl: javax.net.ssl.SSLSocket =>
      val p = ssl.getSSLParameters
      p.setEndpointIdentificationAlgorithm("HTTPS")
      ssl.setSSLParameters(p)
      ssl
    case other => other
  }

  /** SocketFactory decorator applying hostname verification to every
    * socket it hands out.
    */
  private final class VerifyingFactory(inner: javax.net.SocketFactory)
      extends javax.net.SocketFactory {
    override def createSocket(): java.net.Socket =
      withEndpointId(inner.createSocket())
    def createSocket(h: String, p: Int): java.net.Socket =
      withEndpointId(inner.createSocket(h, p))
    def createSocket(h: String, p: Int, lh: java.net.InetAddress,
                     lp: Int): java.net.Socket =
      withEndpointId(inner.createSocket(h, p, lh, lp))
    def createSocket(a: java.net.InetAddress, p: Int): java.net.Socket =
      withEndpointId(inner.createSocket(a, p))
    def createSocket(a: java.net.InetAddress, p: Int,
                     la: java.net.InetAddress, lp: Int): java.net.Socket =
      withEndpointId(inner.createSocket(a, p, la, lp))
  }

  /** The socket-factory hook for client transports: plain or TLS.
    * TLS sockets get endpoint identification unless the config opts out
    * via `verify_hostname: false` (and verification is meaningless when
    * the chain itself isn't verified).
    */
  def clientSocketFactory(cfg: Config): javax.net.SocketFactory =
    if (cfg.enabled) {
      val base = clientContext(cfg).getSocketFactory
      if (cfg.verifyHostname && cfg.verifyCertificate)
        new VerifyingFactory(base)
      else base
    } else javax.net.SocketFactory.getDefault
}

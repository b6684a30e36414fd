package graft.engine

import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket, X509TrustManager}

/** Self-signed TLS for the server transport — the analogue of the
  * reference's optional `TLS_DOMAIN` path, which mints a self-signed
  * certificate for the domain at boot and serves the same protocol over
  * it (iceberg-datafusion-arrow-flight-sql/src/main.rs:83-94; rest
  * main.rs:96-111).
  *
  * The certificate comes from the JDK's own `keytool` (RSA-2048,
  * CN=domain + SAN dns:domain, PKCS12) — the only offline-clean way to
  * mint X.509 on a stock JVM: the programmatic path needs either
  * BouncyCastle (not on the classpath) or `sun.security.x509.*`
  * (encapsulated since JDK 16). One subprocess at boot, zero per-
  * connection cost. The keystore lives in a temp dir with a random
  * one-time password and is deleted on JVM exit.
  */
object Tls {

  /** SSLContext serving a fresh self-signed certificate for `domain`. */
  def selfSignedContext(domain: String): SSLContext = {
    require(domain.nonEmpty && domain.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '-' || c == '*'),
      s"bad TLS domain: $domain")
    val dir = Files.createTempDirectory("graft_tls")
    val ksPath = dir.resolve("server.p12")
    val pass = java.util.UUID.randomUUID().toString
    keytool(ksPath, pass, domain)
    ksPath.toFile.deleteOnExit()
    dir.toFile.deleteOnExit()
    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(ksPath)
    try ks.load(in, pass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  private def keytool(ksPath: Path, pass: String, domain: String): Unit = {
    val bin = Path.of(System.getProperty("java.home"), "bin", "keytool")
    val cmd = Seq(bin.toString, "-genkeypair",
      "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048",
      "-dname", s"CN=$domain",
      "-ext", s"SAN=dns:$domain",
      "-validity", "365",
      "-storetype", "PKCS12",
      "-keystore", ksPath.toString,
      "-storepass", pass)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes())
    if (p.waitFor() != 0)
      throw new IllegalStateException(s"keytool failed for $domain: $log")
  }

  /** Server socket over the self-signed context. */
  def serverSocket(domain: String, port: Int): SSLServerSocket =
    selfSignedContext(domain).getServerSocketFactory
      .createServerSocket(port, 50,
        java.net.InetAddress.getByName("0.0.0.0"))
      .asInstanceOf[SSLServerSocket]

  /** Client socket that accepts any certificate — what a reference
    * client does against the self-signed endpoint (test/tooling use;
    * production clients pin or install the cert). */
  def trustAllSocket(host: String, port: Int): SSLSocket = {
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](new X509TrustManager {
      override def checkClientTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
        Array.empty
    }), null)
    ctx.getSocketFactory.createSocket(host, port).asInstanceOf[SSLSocket]
  }
}

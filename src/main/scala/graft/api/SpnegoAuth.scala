package graft.api

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Kerberos/SPNEGO auth transport — the reference's remaining auth path
  * (`security/SecurityContext.java` wires Hadoop's `HttpServer2` SPNEGO
  * filter from `DFS_NAMENODE_KERBEROS_INTERNAL_SPNEGO_PRINCIPAL_KEY` +
  * keytab conf, `NameNodeAnalyticsHttpServer.java:181,249-268`, and
  * `security/KeytabReloader.java:50-70` re-logs-in from the keytab every
  * 10 minutes so the process credential never expires).
  *
  * Re-expressed without the Hadoop runtime:
  *
  *  - [[Keytab]] parses the MIT keytab file format (0x0502) directly —
  *    the on-disk artifact both the SPNEGO acceptor and the reloader
  *    consume; public format, loud failures on corrupt input (the same
  *    contract round 9 pinned for binary fsimages).
  *  - [[SpnegoAuth]] implements the HTTP Negotiate handshake (RFC 4559):
  *    challenge, token parse, acceptor call, mutual-auth response
  *    header. The GSS acceptor sits behind [[NegotiateValidator]]: the
  *    production impl [[GssNegotiateValidator]] is pure-JDK JGSS over a
  *    keytab JAAS login (exercisable only against a live KDC, like the
  *    reference's — its MiniKDC tests don't run in this sandbox either);
  *    the HTTP handshake, header grammar, tier mapping, and failure
  *    modes are spec-driven through a stub validator.
  *  - [[KeytabReloader]] is the reference's refresh thread: tick every
  *    `intervalMs`, re-read + re-validate the keytab, hand the fresh
  *    entries to the consumer; a failed reload reports and STOPS (the
  *    reference breaks its loop and logs "keytab will expire" —
  *    credential death is made visible, not retried silently).
  */
object Keytab {

  /** One keytab entry: a service principal's key material. */
  final case class Entry(components: Seq[String], realm: String,
                         nameType: Int, timestamp: Long, kvno: Int,
                         encType: Int, key: Array[Byte]) {
    def principal: String = components.mkString("/") + "@" + realm
  }

  /** Parse an MIT-format keytab (version 0x0502, big-endian). Structure:
    * 2-byte magic, then records of `int32 length` + body; negative
    * lengths are holes (deleted entries) and are skipped. Record body:
    * uint16 component count (realm NOT included in 0x0502), realm and
    * components as {uint16 len, bytes}, uint32 name type, uint32
    * timestamp, uint8 kvno, key {uint16 enctype, uint16 len, bytes},
    * optional uint32 kvno extension (used when non-zero: kvno > 255).
    * Corrupt input fails loudly with the offset — never a partial
    * credential set. */
  def parse(bytes: Array[Byte]): Seq[Entry] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"corrupt keytab at offset ${buf.position()}: $msg")
    def need(n: Int, what: String): Unit =
      if (buf.remaining() < n) fail(s"truncated $what (need $n bytes, " +
        s"${buf.remaining()} remain)")
    need(2, "magic")
    val magic = buf.getShort & 0xffff
    if (magic == 0x0501) fail("keytab version 0x0501 (old big-endian " +
      "format) is not supported; re-export with ktutil as 0x0502")
    if (magic != 0x0502) fail(f"bad magic 0x$magic%04x (expected 0x0502)")
    val out = Seq.newBuilder[Entry]
    while (buf.remaining() >= 4) {
      val len = buf.getInt
      if (len < 0) { // hole: skip |len| bytes of dead entry
        need(-len, "hole")
        buf.position(buf.position() - len)
      } else if (len == 0) {
        fail("zero-length record (would loop forever)")
      } else {
        need(len, "record")
        val end = buf.position() + len
        def str(what: String): String = {
          need(2, s"$what length"); val n = buf.getShort & 0xffff
          if (buf.position() + n > end) fail(s"$what overruns its record")
          val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
        }
        need(2, "component count")
        val nComp = buf.getShort & 0xffff
        val realm = str("realm")
        val comps = (0 until nComp).map(i => str(s"component $i"))
        if (buf.position() + 9 > end) fail("truncated principal trailer")
        val nameType = buf.getInt
        val ts = (buf.getInt.toLong & 0xffffffffL) * 1000L
        val kvno8 = buf.get & 0xff
        if (buf.position() + 4 > end) fail("truncated key block")
        val encType = buf.getShort & 0xffff
        val keyLen = buf.getShort & 0xffff
        if (buf.position() + keyLen > end) fail("key overruns its record")
        val key = new Array[Byte](keyLen); buf.get(key)
        // 32-bit kvno extension: present iff ≥4 bytes remain in-record
        val kvno =
          if (end - buf.position() >= 4) { val v = buf.getInt; if (v != 0) v else kvno8 }
          else kvno8
        buf.position(end) // tolerate future in-record extensions
        if (nComp == 0) fail("entry with zero principal components")
        out += Entry(comps, realm, nameType, ts, kvno, encType, key)
      }
    }
    val entries = out.result()
    if (entries.isEmpty)
      throw new IllegalArgumentException("keytab holds no live entries")
    entries
  }

  def read(path: String): Seq[Entry] =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}

/** The GSS acceptor seam: turns one client Negotiate token into an
  * authenticated principal (+ optional mutual-auth token to send back).
  * Production: [[GssNegotiateValidator]]. Specs: a stub, so the HTTP
  * handshake and authorization tiers are tested without a KDC. */
trait NegotiateValidator {
  /** Left(reason) = reject; Right((principal, mutualToken)). */
  def accept(token: Array[Byte]): Either[String, (String, Option[Array[Byte]])]
}

/** Pure-JDK JGSS acceptor: JAAS `Krb5LoginModule` login from the keytab
  * (programmatic config — no jaas.conf file), then `acceptSecContext`
  * under the service subject. SPNEGO (1.3.6.1.5.5.2) is negotiated by
  * the JDK provider; the keytab itself is pre-validated through
  * [[Keytab.read]] so a corrupt file fails at construction with a
  * decode error instead of an opaque GSS one at first request. */
final class GssNegotiateValidator(keytabPath: String, principal: String)
    extends NegotiateValidator {
  // fail-fast parse: also yields the kvno/enctype set for diagnostics
  val entries: Seq[Keytab.Entry] = {
    val all = Keytab.read(keytabPath)
    val mine = all.filter(_.principal == principal)
    require(mine.nonEmpty,
      s"keytab $keytabPath holds no key for $principal " +
        s"(has: ${all.map(_.principal).distinct.mkString(", ")})")
    mine
  }

  private val subject: javax.security.auth.Subject = {
    import javax.security.auth.login.{AppConfigurationEntry, Configuration, LoginContext}
    import AppConfigurationEntry.LoginModuleControlFlag.REQUIRED
    val opts = new java.util.HashMap[String, String]()
    opts.put("useKeyTab", "true"); opts.put("keyTab", keytabPath)
    opts.put("principal", principal); opts.put("storeKey", "true")
    opts.put("doNotPrompt", "true"); opts.put("isInitiator", "false")
    val conf = new Configuration {
      override def getAppConfigurationEntry(name: String) = Array(
        new AppConfigurationEntry(
          "com.sun.security.auth.module.Krb5LoginModule", REQUIRED, opts))
    }
    val lc = new LoginContext("graft-spnego", null, null, conf)
    lc.login()
    lc.getSubject
  }

  def accept(token: Array[Byte])
      : Either[String, (String, Option[Array[Byte]])] =
    try {
      import org.ietf.jgss._
      @annotation.nowarn("cat=deprecation") // Subject.doAs: Java 17 path
      val r = javax.security.auth.Subject.doAs(subject,
        new java.security.PrivilegedExceptionAction[
            Either[String, (String, Option[Array[Byte]])]] {
          def run() = {
            val mgr = GSSManager.getInstance
            val cred = mgr.createCredential(null,
              GSSCredential.INDEFINITE_LIFETIME,
              new Oid("1.3.6.1.5.5.2"), GSSCredential.ACCEPT_ONLY)
            val ctx = mgr.createContext(cred)
            val out = ctx.acceptSecContext(token, 0, token.length)
            // HTTP Negotiate is single-round-trip: multi-leg mechs
            // (NTLMSSP inside SPNEGO) are out of contract
            if (!ctx.isEstablished)
              Left("SPNEGO context not established in one round trip")
            else Right((ctx.getSrcName.toString, Option(out)))
          }
        })
      r
    } catch {
      case e: Exception =>
        Left(s"GSS accept failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
}

/** RFC 4559 HTTP Negotiate over a [[NegotiateValidator]]:
  *
  *  - absent/foreign `Authorization` → `None` (caller answers 401 with
  *    a `WWW-Authenticate: Negotiate` challenge);
  *  - `Negotiate <b64>` → decode (malformed → rejection, not an
  *    exception), acceptor call, short-name mapping (strip `@REALM`
  *    and any host component — `HTTP/host@REALM` is the service, the
  *    CLIENT principal `alice@REALM` maps to `alice`, matching the
  *    reference's `auth_to_local`-style shortening).
  *
  * Authorization stays in [[Security.Context]]: SPNEGO authenticates,
  * the tier walk decides, same as every other transport. */
object SpnegoAuth {
  sealed trait Result
  /** No Negotiate attempt in the request — challenge the client. */
  case object NoAttempt extends Result
  final case class Rejected(reason: String) extends Result
  final case class Authenticated(user: String, mutual: Option[String])
      extends Result
}

final class SpnegoAuth(validator: NegotiateValidator,
                       stripRealm: Boolean = true) {
  import SpnegoAuth._

  val challengeHeader: String = "Negotiate"

  def shortName(principal: String): String =
    if (stripRealm) principal.takeWhile(_ != '@').takeWhile(_ != '/')
    else principal

  def authenticate(authorization: Option[String]): Result =
    authorization match {
      case Some(h) if h.regionMatches(true, 0, "Negotiate ", 0, 10) =>
        val b64 = h.drop(10).trim
        val tok =
          try Right(Base64.getDecoder.decode(b64))
          catch { case _: IllegalArgumentException =>
            Left("malformed base64 in Negotiate header") }
        tok.flatMap(validator.accept) match {
          case Left(reason) => Rejected(reason)
          case Right((principal, mutual)) =>
            Authenticated(shortName(principal),
              mutual.map(Base64.getEncoder.encodeToString))
        }
      case _ => NoAttempt
    }
}

/** The reference's keytab refresh loop (`KeytabReloader.java:50-70`):
  * re-read the keytab on a fixed cadence and hand the fresh entries to
  * the consumer (there: `checkTGTAndReloginFromKeytab`; here: whatever
  * owns the acceptor credential). Failure semantics preserved: report
  * once and STOP — "keytab will expire" must surface as a dead reloader
  * + error, never as a silent stale-credential loop. Daemon-threaded;
  * `tick()` is the spec seam. */
final class KeytabReloader(path: String,
                           onReload: Seq[Keytab.Entry] => Unit,
                           intervalMs: Long = 10L * 60 * 1000,
                           onFailure: Throwable => Unit = _ => ()) {
  @volatile private var stopped = false
  @volatile private var failed: Option[Throwable] = None

  def lastFailure: Option[Throwable] = failed
  def running: Boolean = !stopped

  /** One reload attempt. Returns true = keep ticking. */
  def tick(): Boolean =
    try { onReload(Keytab.read(path)); true }
    catch {
      case e: Exception =>
        failed = Some(e); stopped = true; onFailure(e); false
    }

  private val thread = new Thread("graft-keytab-reloader") {
    override def run(): Unit = {
      while (!stopped) {
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
        if (!stopped && !tick()) return
      }
    }
  }
  thread.setDaemon(true)

  def start(): Unit = thread.start()
  def shutdown(): Unit = { stopped = true; thread.interrupt() }
}

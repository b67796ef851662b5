package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Authentication + authorization for the HTTP surface, mirroring the
  * reference's `security/SecurityContext.java` semantics:
  *
  *  - `/login` with username+password issues a signed session token carried
  *    in the `nna-jwt-token` cookie (reference `SecurityContext.java:209-232`
  *    — pac4j JWT there; here a plain HMAC-SHA256 token over
  *    `user|expiry`, which is the part of a JWT this server actually
  *    verifies: integrity + expiry. No external deps.)
  *  - every request validates (and re-issues) the token
  *    (`SecurityContext.java:349-369`);
  *  - authorization walks endpoint classes in the reference's precedence
  *    order — UNSECURED, ADMIN, WRITER, READER, CACHE, else deny
  *    (`SecurityContext.java:416-466`) — with per-class user lists replaced
  *    by a per-user tier set (a reference user appearing in several lists ≡
  *    a user holding several tiers).
  *
  * Disabled mode (no users configured) matches the reference's
  * `authenticationEnabled=false`: every caller is `default` with all tiers
  * (`SecurityContext.java:318-330`).
  */
object Security {

  sealed abstract class Tier(val name: String)
  case object Admin extends Tier("ADMIN")
  case object Writer extends Tier("WRITER")
  case object Reader extends Tier("READER")
  case object Cache extends Tier("CACHE")
  val AllTiers: Set[Tier] = Set(Admin, Writer, Reader, Cache)

  final case class User(name: String, password: String, tiers: Set[Tier])

  /** Endpoint access classes — verbatim from `Constants.java:298-362`. */
  val UnsecuredEndpoints: Set[String] = Set(
    "login", "logout", "endpoints", "credentials", "sets", "filters",
    "filterOps", "histograms", "histogramOutputs", "sums", "transforms",
    "operations", "finds",
    // beyond-reference: operator-registry name enumeration
    "queries",
    // the static dashboard page itself ("" = GET /); its DATA calls
    // still authenticate per tier — serving the shell unauthenticated
    // mirrors the reference webapp's login flow
    "", "ui")
  val CacheReaderEndpoints: Set[String] = Set(
    "suggestions", "history", "sketchHistory", "token", "directories",
    "users", "quotas", "fileAge", "info", "config", "getCachedQuery",
    "cachedMaps", "fileTypes")
  val ReaderEndpoints: Set[String] = Set(
    "contentSummary", "filter", "histogram", "histogram2", "histogram3",
    "divide", "top", "bottom", "dump", "sql",
    // beyond-reference: the generic operator-registry runner
    "query")
  val WriterEndpoints: Set[String] = Set(
    "listOperations", "submitOperation", "abortOperation")
  val AdminEndpoints: Set[String] = Set(
    "saveNamespace", "fetchNamespace", "reloadNamespace", "log",
    "loadingStatus", "system", "threads", "refresh", "drop", "truncate",
    "addDirectory", "removeDirectory", "metrics", "setCachedQuery",
    "removeCachedQuery", "queryGuard")

  val AllEndpoints: Seq[String] =
    // full Endpoint enum, `Constants.java:241-296`
    (UnsecuredEndpoints ++ CacheReaderEndpoints ++ ReaderEndpoints ++
      WriterEndpoints ++ AdminEndpoints).toSeq.sorted

  val CookieName = "nna-jwt-token"

  /** @param ldap optional LDAP bind transport (reference
    *   `SecurityContext.java:189-222`): tried only when the username is
    *   NOT a local user — a known local name with a wrong password fails
    *   hard with no LDAP fallthrough (`localLogin` at `:226-243` throws
    *   before `ldapLogin` runs).
    * @param ldapTiers authorization tiers granted to LDAP-authenticated
    *   users (the reference resolves tiers from per-class user lists
    *   independent of the auth transport; same walk here). A user in
    *   neither map holds no tiers → every secured endpoint denies.
    * @param spnegoTiers tiers for SPNEGO-authenticated principals (short
    *   names, post-realm-strip). Kerberos only authenticates — the tier
    *   walk still decides, like every other transport. Non-empty ⇒ auth
    *   counts as enabled even with no local/LDAP users (a Kerberos-only
    *   deployment, the reference's secured-cluster mode). */
  final class Context(users: Seq[User],
                      secret: Array[Byte],
                      tokenTtlMs: Long = 24L * 3600 * 1000,
                      clock: () => Long = () => System.currentTimeMillis(),
                      ldap: Option[LdapAuth] = None,
                      ldapTiers: Map[String, Set[Tier]] = Map.empty,
                      spnegoTiers: Map[String, Set[Tier]] = Map.empty) {

    private val byName: Map[String, User] = users.map(u => u.name -> u).toMap

    /** No users AND no LDAP AND no SPNEGO principals ≡ reference
      * `authenticationEnabled=false`. */
    def enabled: Boolean =
      byName.nonEmpty || ldap.nonEmpty || spnegoTiers.nonEmpty

    private def hmac(payload: String): String = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(secret, "HmacSHA256"))
      Base64.getUrlEncoder.withoutPadding.encodeToString(
        mac.doFinal(payload.getBytes(UTF_8)))
    }

    def issueToken(user: String): String = {
      val payload = Base64.getUrlEncoder.withoutPadding
        .encodeToString(s"$user|${clock() + tokenTtlMs}".getBytes(UTF_8))
      s"$payload.${hmac(payload)}"
    }

    /** Token → username iff signature verifies and not expired. */
    def validate(token: String): Option[String] = token.split('.') match {
      case Array(payload, sig) if constantTimeEq(sig, hmac(payload)) =>
        new String(Base64.getUrlDecoder.decode(payload), UTF_8).split('|') match {
          case Array(user, exp) if exp.toLong > clock() => Some(user)
          case _ => None
        }
      case _ => None
    }

    // timing-safe compare — same reason the reference delegates to pac4j
    private def constantTimeEq(a: String, b: String): Boolean =
      java.security.MessageDigest.isEqual(a.getBytes(UTF_8), b.getBytes(UTF_8))

    /** Local first, LDAP second — and a KNOWN local username with a wrong
      * password fails immediately (no LDAP fallthrough), per the
      * reference's `localLogin`-throws-before-`ldapLogin` order. */
    def login(name: String, password: String): Option[String] =
      byName.get(name) match {
        case Some(u) =>
          if (constantTimeEq(u.password, password)) Some(issueToken(u.name))
          else None
        case None =>
          ldap.filter(_.bind(name, password)).map(_ => issueToken(name))
      }

    def tiersOf(user: String): Set[Tier] =
      if (!enabled) AllTiers
      else byName.get(user).map(_.tiers)
        .orElse(ldapTiers.get(user))
        .orElse(spnegoTiers.get(user))
        .getOrElse(Set.empty)

    /** First-match walk in the reference's precedence order
      * (`SecurityContext.java:424-466`). Returns true = allowed. */
    def authorize(endpoint: String, user: String): Boolean = {
      if (!enabled) return true
      val tiers = tiersOf(user)
      if (UnsecuredEndpoints(endpoint)) true
      else if (AdminEndpoints(endpoint)) tiers(Admin)
      else if (WriterEndpoints(endpoint)) tiers(Writer)
      else if (ReaderEndpoints(endpoint)) tiers(Reader)
      else if (CacheReaderEndpoints(endpoint)) tiers(Cache)
      else false
    }
  }
}

package graft.api

import java.util.Hashtable
import javax.naming.Context
import javax.naming.directory.InitialDirContext

/** LDAP simple-bind authentication transport, mirroring the reference's
  * `security/SecurityContext.java:189-222` + `WebServerMain.java:223-260`
  * semantics (pac4j/ldaptive there; plain JNDI — pure JDK — here):
  *
  *  - the user's DN is produced by substituting `%u` into each configured
  *    base-DN template (`ApplicationConfiguration.java:128-136`'s
  *    `ldap.base.dn.N` list, reference `FormatDnResolver`);
  *  - templates are attempted IN ORDER; the first successful simple bind
  *    authenticates the user (`SecurityContext.java:195-212`);
  *  - connect/response timeouts are bounded
  *    (`ApplicationConfiguration.java:144-151`, defaults 1000 ms).
  *
  * Hard rule beyond the reference's library defaults: an EMPTY password is
  * rejected locally and never sent to the server. RFC 4513 §5.1.2 defines
  * name-plus-empty-password as an UNAUTHENTICATED bind, which most
  * directory servers accept with resultCode success — forwarding it would
  * turn "any valid username" into a login bypass.
  *
  * TLS: `ldaps://` URLs ride JNDI's built-in SSL socket factory with the
  * JVM's trust store (the reference's `ldap.trust.store.path` maps to
  * standard `javax.net.ssl.trustStore` system properties here).
  */
final class LdapAuth(
    url: String,
    baseDnTemplates: Seq[String],
    connectTimeoutMs: Int = 1000,
    responseTimeoutMs: Int = 1000) {

  require(baseDnTemplates.nonEmpty, "at least one ldap.base.dn template")

  /** DNs attempted for a username, in configuration order. */
  def dnsFor(username: String): Seq[String] =
    baseDnTemplates.map(_.replace("%u", username))

  /** True iff some templated DN simple-binds with this password. */
  def bind(username: String, password: String): Boolean = {
    if (username == null || username.isEmpty ||
        password == null || password.isEmpty) return false
    // bind DNs are assembled from a server-side template; the only
    // user-controlled part is the username, which must not be able to
    // splice extra RDNs into the DN
    if (username.exists(c => ",=+;\\<>\"".indexOf(c.toInt) >= 0 ||
        c.isWhitespace || c.isControl))
      return false
    // RFC 4514: a leading '#' introduces a hex-encoded BER attribute
    // value — a username like "#0403..." substituted into the template
    // would bind as an attacker-chosen effective DN
    if (username.startsWith("#")) return false
    dnsFor(username).exists(bindDn(_, password))
  }

  private def bindDn(dn: String, password: String): Boolean = {
    val env = new Hashtable[String, String]()
    env.put(Context.INITIAL_CONTEXT_FACTORY, "com.sun.jndi.ldap.LdapCtxFactory")
    env.put(Context.PROVIDER_URL, url)
    env.put(Context.SECURITY_AUTHENTICATION, "simple")
    env.put(Context.SECURITY_PRINCIPAL, dn)
    env.put(Context.SECURITY_CREDENTIALS, password)
    env.put("com.sun.jndi.ldap.connect.timeout", connectTimeoutMs.toString)
    env.put("com.sun.jndi.ldap.read.timeout", responseTimeoutMs.toString)
    // no connection pooling for bind-only auth: a pooled connection is
    // authenticated as the LAST bound principal — reusing it across users
    // would be a cross-user privilege mixup
    try {
      new InitialDirContext(env).close()
      true
    } catch {
      case _: javax.naming.NamingException => false
    }
  }
}

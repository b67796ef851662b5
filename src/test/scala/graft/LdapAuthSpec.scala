package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{LdapAuth, Security}

/** [[graft.api.LdapAuth]] against [[LdapStubServer]] — a real socket +
  * real BER simple-bind exchange, mirroring what the reference's
  * `TestLdapAuth.java` drives through pac4j/ldaptive. */
class LdapAuthSpec extends AnyFunSuite {

  private val PeopleDn = "uid=%u,ou=people,dc=example,dc=com"
  private val SvcDn = "uid=%u,ou=services,dc=example,dc=com"

  private def withServer(creds: Map[String, String])(
      f: LdapStubServer => Unit): Unit = {
    val srv = new LdapStubServer(creds)
    try f(srv) finally srv.close()
  }

  test("simple bind succeeds via the templated DN; wrong password is 49") {
    withServer(Map("uid=ada,ou=people,dc=example,dc=com" -> "pw1")) { srv =>
      val auth = new LdapAuth(srv.url, Seq(PeopleDn))
      assert(auth.bind("ada", "pw1"))
      assert(!auth.bind("ada", "nope"))
      assert(!auth.bind("ghost", "pw1"))
      assert(srv.bindAttempts.contains(
        "uid=ada,ou=people,dc=example,dc=com" -> "pw1"))
    }
  }

  test("base-DN templates are attempted in order until one binds") {
    withServer(Map("uid=svc1,ou=services,dc=example,dc=com" -> "s3cret")) {
      srv =>
        val auth = new LdapAuth(srv.url, Seq(PeopleDn, SvcDn))
        assert(auth.bind("svc1", "s3cret"))
        // the failed people-branch attempt happened first, then services
        val dns = srv.bindAttempts.map(_._1)
        assert(dns === Seq(
          "uid=svc1,ou=people,dc=example,dc=com",
          "uid=svc1,ou=services,dc=example,dc=com"))
    }
  }

  test("empty password never reaches the wire (unauthenticated-bind bypass)") {
    // the stub FAITHFULLY grants RFC 4513 §5.1.2 unauthenticated binds —
    // so the only safe behavior is the client refusing to send them
    withServer(Map("uid=ada,ou=people,dc=example,dc=com" -> "pw1")) { srv =>
      val auth = new LdapAuth(srv.url, Seq(PeopleDn))
      assert(!auth.bind("ada", ""))
      assert(!auth.bind("", "pw1"))
      assert(srv.bindAttempts.isEmpty, "no bind request may be sent")
    }
  }

  test("DN metacharacters in the username are rejected before any bind") {
    withServer(Map.empty) { srv =>
      val auth = new LdapAuth(srv.url, Seq(PeopleDn))
      // leading '#' is the RFC 4514 hex-form introducer: "#0403..." in
      // the template position is a full attacker-chosen BER value —
      // a bind as a different effective DN
      for (u <- Seq("a,ou=admins", "a=b", "a+b", "a;b", "a\\b", "a b",
          "a\"b", "#040361646d", "#61"))
        assert(!auth.bind(u, "pw"), s"'$u' must be refused client-side")
      assert(srv.bindAttempts.isEmpty)
    }
  }

  test("Security.Context: local-first, no LDAP fallthrough for known " +
      "local users, directory tiers authorize") {
    withServer(Map(
      "uid=dirk,ou=people,dc=example,dc=com" -> "ldappw",
      "uid=local1,ou=people,dc=example,dc=com" -> "sneaky")) { srv =>
      val auth = new LdapAuth(srv.url, Seq(PeopleDn))
      val ctx = new Security.Context(
        users = Seq(Security.User("local1", "localpw", Set(Security.Admin))),
        secret = "k".getBytes(UTF_8),
        ldap = Some(auth),
        ldapTiers = Map("dirk" -> Set(Security.Reader, Security.Cache)))
      assert(ctx.enabled)
      // unknown-local user authenticates via the directory
      val tok = ctx.login("dirk", "ldappw")
      assert(tok.isDefined && ctx.validate(tok.get).contains("dirk"))
      assert(ctx.authorize("histogram", "dirk"))       // Reader
      assert(ctx.authorize("suggestions", "dirk"))     // Cache
      assert(!ctx.authorize("drop", "dirk"))           // not Admin
      // a known LOCAL user with a wrong password fails HARD: the
      // directory also holds a (different) credential for local1, but
      // the reference's localLogin throws before ldapLogin runs
      assert(ctx.login("local1", "sneaky").isEmpty)
      assert(!srv.bindAttempts.exists(_._1.contains("local1")),
        "local-user login must never fall through to LDAP")
      assert(ctx.login("local1", "localpw").isDefined)
      // directory user absent from ldapTiers authenticates but holds
      // no tiers → every secured endpoint denies
      assert(ctx.login("dirk", "ldappw").isDefined)
      assert(!ctx.authorize("histogram", "nobody"))
    }
  }

  test("ldap-only context (no local users) is auth-enabled") {
    withServer(Map("uid=ada,ou=people,dc=example,dc=com" -> "pw1")) { srv =>
      val ctx = new Security.Context(Nil, "k".getBytes(UTF_8),
        ldap = Some(new LdapAuth(srv.url, Seq(PeopleDn))),
        ldapTiers = Map("ada" -> Security.AllTiers))
      assert(ctx.enabled, "ldap alone must enable authentication")
      assert(ctx.login("ada", "pw1").isDefined)
      assert(ctx.login("ada", "bad").isEmpty)
      assert(ctx.authorize("drop", "ada"))
    }
  }

  test("unreachable directory fails closed within the connect timeout") {
    // a refused port: bind must return false, not hang or throw
    val dead = new java.net.ServerSocket(0)
    val port = dead.getLocalPort
    dead.close()
    val auth = new LdapAuth(s"ldap://127.0.0.1:$port", Seq(PeopleDn),
      connectTimeoutMs = 300, responseTimeoutMs = 300)
    val t0 = System.nanoTime()
    assert(!auth.bind("ada", "pw1"))
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
  }
}

package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Keytab, KeytabReloader, NegotiateValidator, SpnegoAuth}

/** Keytab decode + reloader + Negotiate grammar — the auth-transport
  * parity with the reference's `KeytabReloader.java` / SPNEGO-filtered
  * HTTP server. The binary fixtures are hand-assembled MIT 0x0502
  * keytabs (public format), so decode is pinned bit-for-bit and every
  * corrupt-input class fails loudly — the same contract the binary
  * fsimage door carries. */
class KeytabSpec extends AnyFunSuite {

  // ---- binary keytab assembly (big-endian 0x0502) ----------------------
  private def entryBytes(realm: String, comps: Seq[String], nameType: Int,
                         tsSec: Int, kvno8: Int, encType: Int,
                         key: Array[Byte], kvnoExt: Option[Int] = None)
      : Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeShort(comps.size)
    def str(s: String): Unit = {
      val x = s.getBytes(UTF_8); d.writeShort(x.length); d.write(x)
    }
    str(realm); comps.foreach(str)
    d.writeInt(nameType); d.writeInt(tsSec); d.writeByte(kvno8)
    d.writeShort(encType); d.writeShort(key.length); d.write(key)
    kvnoExt.foreach(d.writeInt)
    b.toByteArray
  }

  private def keytab(records: Array[Byte]*): Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeShort(0x0502)
    records.foreach(d.write)
    b.toByteArray
  }

  private def rec(body: Array[Byte]): Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeInt(body.length); d.write(body); b.toByteArray
  }

  private def hole(n: Int): Array[Byte] = {
    val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
    d.writeInt(-n); d.write(new Array[Byte](n)); b.toByteArray
  }

  val aesKey: Array[Byte] = Array.tabulate(32)(i => (i * 7 + 3).toByte)
  val rc4Key: Array[Byte] = Array.tabulate(16)(i => (i * 11 + 1).toByte)
  val http = entryBytes("EXAMPLE.COM", Seq("HTTP", "nna.example.com"),
    nameType = 1, tsSec = 1700000000, kvno8 = 5, encType = 18, key = aesKey)
  val alice = entryBytes("EXAMPLE.COM", Seq("alice"),
    nameType = 1, tsSec = 1700000100, kvno8 = 2, encType = 23, key = rc4Key)

  test("round-trips a two-entry keytab: principals, kvno, enctype, keys") {
    val es = Keytab.parse(keytab(rec(http), rec(alice)))
    assert(es.map(_.principal) ===
      Seq("HTTP/nna.example.com@EXAMPLE.COM", "alice@EXAMPLE.COM"))
    assert(es(0).kvno === 5 && es(0).encType === 18)
    assert(es(0).key.toSeq === aesKey.toSeq)
    assert(es(0).timestamp === 1700000000000L)
    assert(es(1).kvno === 2 && es(1).encType === 23)
    assert(es(1).key.toSeq === rc4Key.toSeq)
  }

  test("32-bit kvno extension overrides the 8-bit field when non-zero") {
    val e300 = entryBytes("EXAMPLE.COM", Seq("svc"), 1, 1700000000,
      kvno8 = 300 % 256, encType = 18, key = aesKey, kvnoExt = Some(300))
    assert(Keytab.parse(keytab(rec(e300))).head.kvno === 300)
    // a zero extension (kadmind pads one out) falls back to the 8-bit vno
    val ePad = entryBytes("EXAMPLE.COM", Seq("svc"), 1, 1700000000,
      kvno8 = 7, encType = 18, key = aesKey, kvnoExt = Some(0))
    assert(Keytab.parse(keytab(rec(ePad))).head.kvno === 7)
  }

  test("holes (negative-length deleted slots) are skipped, not decoded") {
    val es = Keytab.parse(keytab(rec(http), hole(40), rec(alice)))
    assert(es.size === 2)
    assert(es(1).principal === "alice@EXAMPLE.COM")
  }

  test("corrupt inputs fail loudly: bad magic, 0x0501, truncation, " +
      "overrun, empty") {
    val badMagic = intercept[IllegalArgumentException] {
      Keytab.parse(Array[Byte](0x06, 0x02, 0, 0))
    }
    assert(badMagic.getMessage.contains("bad magic"))
    val v501 = intercept[IllegalArgumentException] {
      Keytab.parse(Array[Byte](0x05, 0x01))
    }
    assert(v501.getMessage.contains("0x0501"))
    // record length says 500 but the file ends
    val trunc = intercept[IllegalArgumentException] {
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeShort(0x0502); d.writeInt(500); d.write(http)
      Keytab.parse(b.toByteArray)
    }
    assert(trunc.getMessage.contains("truncated"))
    // key length overruns its own record
    val overrun = intercept[IllegalArgumentException] {
      val body = entryBytes("R", Seq("x"), 1, 0, 1, 18, new Array[Byte](4))
      // lie: shrink the declared record by 2 so the key spills past it
      val b = new ByteArrayOutputStream(); val d = new DataOutputStream(b)
      d.writeShort(0x0502); d.writeInt(body.length - 2); d.write(body)
      Keytab.parse(b.toByteArray)
    }
    assert(overrun.getMessage.contains("overruns") ||
      overrun.getMessage.contains("truncated"))
    val empty = intercept[IllegalArgumentException] {
      Keytab.parse(Array[Byte](0x05, 0x02))
    }
    assert(empty.getMessage.contains("no live entries"))
  }

  test("reloader hands fresh entries to the consumer; a failed reload " +
      "reports once and STOPS (the reference's keytab-will-expire exit)") {
    val f = java.nio.file.Files.createTempFile("kt", ".keytab")
    java.nio.file.Files.write(f, keytab(rec(http)))
    @volatile var seen: Seq[Keytab.Entry] = Nil
    @volatile var failures = 0
    val r = new KeytabReloader(f.toString, es => seen = es,
      onFailure = _ => failures += 1)
    assert(r.tick() && r.running)
    assert(seen.map(_.principal) === Seq("HTTP/nna.example.com@EXAMPLE.COM"))
    // rotated keytab (kvno bump) flows through on the next tick
    val rotated = entryBytes("EXAMPLE.COM", Seq("HTTP", "nna.example.com"),
      1, 1700009999, kvno8 = 6, encType = 18, key = rc4Key ++ rc4Key)
    java.nio.file.Files.write(f, keytab(rec(http), rec(rotated)))
    assert(r.tick())
    assert(seen.map(_.kvno) === Seq(5, 6))
    // corrupt rotation: tick fails, reloader stops, failure surfaced
    java.nio.file.Files.write(f, "garbage".getBytes(UTF_8))
    assert(!r.tick() && !r.running && failures === 1)
    assert(r.lastFailure.exists(_.getMessage.contains("bad magic")))
  }

  test("Negotiate header grammar: scheme match is case-insensitive, " +
      "foreign schemes are no-attempt, bad base64 is a rejection") {
    val v = new NegotiateValidator {
      def accept(t: Array[Byte]) =
        if (new String(t, UTF_8) == "tok")
          Right(("svc/alice@R", None)) else Left("nope")
    }
    val a = new SpnegoAuth(v)
    val b64 = java.util.Base64.getEncoder.encodeToString("tok".getBytes(UTF_8))
    assert(a.authenticate(None) === SpnegoAuth.NoAttempt)
    assert(a.authenticate(Some("Bearer abc")) === SpnegoAuth.NoAttempt)
    assert(a.authenticate(Some(s"negotiate $b64")) ===
      SpnegoAuth.Authenticated("svc", None))
    a.authenticate(Some("Negotiate %%%")) match {
      case SpnegoAuth.Rejected(r) => assert(r.contains("base64"))
      case other => fail(s"expected Rejected, got $other")
    }
    a.authenticate(Some("Negotiate " +
        java.util.Base64.getEncoder.encodeToString("bad".getBytes(UTF_8)))) match {
      case SpnegoAuth.Rejected(r) => assert(r === "nope")
      case other => fail(s"expected Rejected, got $other")
    }
    // realm-preserving mode for auth_to_local-style downstream mapping
    val keep = new SpnegoAuth(v, stripRealm = false)
    assert(keep.authenticate(Some(s"Negotiate $b64")) ===
      SpnegoAuth.Authenticated("svc/alice@R", None))
  }
}

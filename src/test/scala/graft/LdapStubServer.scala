package graft

import java.io.{DataInputStream, EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Minimal RFC 4511 bind-only LDAP server for exercising
  * [[graft.api.LdapAuth]] against a real socket + real BER wire format
  * (what pac4j/ldaptive speak to in the reference's `TestLdapAuth.java`).
  *
  * Speaks exactly the subset a simple-bind client emits:
  *   LDAPMessage ::= SEQUENCE { messageID INTEGER, protocolOp }
  *   BindRequest [APPLICATION 0] ::= { version INTEGER, name OCTET STRING,
  *     authentication [0] simple OCTET STRING }
  *   BindResponse [APPLICATION 1] ::= { resultCode ENUMERATED,
  *     matchedDN OCTET STRING, diagnosticMessage OCTET STRING }
  *   UnbindRequest [APPLICATION 2] → connection close.
  *
  * Deliberately FAITHFUL to RFC 4513 §5.1.2: a bind with a name and an
  * EMPTY password is an *unauthenticated bind* and returns SUCCESS — like
  * most real directory servers. The client must refuse to send it; the
  * spec asserts `binds` stays empty for that case.
  */
final class LdapStubServer(creds: Map[String, String]) extends AutoCloseable {

  /** Every (dn, password) bind attempt the server actually received. */
  val binds = new CopyOnWriteArrayList[(String, String)]()

  private val server = new ServerSocket(0, 8,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  def url: String = s"ldap://127.0.0.1:$port"

  @volatile private var closed = false
  private val acceptor = new Thread(() => {
    try while (!closed) {
      val sock = server.accept()
      new Thread(() => handle(sock), s"ldap-stub-conn").start()
    } catch { case _: SocketException => () } // close() path
  }, "ldap-stub-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  override def close(): Unit = { closed = true; server.close() }

  // ---- BER plumbing ----

  private def readLength(in: DataInputStream): Int = {
    val first = in.readUnsignedByte()
    if (first < 0x80) first
    else {
      var n = 0
      for (_ <- 0 until (first & 0x7f)) n = (n << 8) | in.readUnsignedByte()
      n
    }
  }

  private def readTlv(in: DataInputStream): (Int, Array[Byte]) = {
    val tag = in.readUnsignedByte()
    val len = readLength(in)
    val buf = new Array[Byte](len)
    in.readFully(buf)
    (tag, buf)
  }

  private def berLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else if (n < 0x100) Array(0x81.toByte, n.toByte)
    else Array(0x82.toByte, (n >> 8).toByte, n.toByte)

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    Array(tag.toByte) ++ berLen(content.length) ++ content

  private def handle(sock: Socket): Unit =
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = sock.getOutputStream
      var open = true
      while (open) {
        val (msgTag, msgBody) = readTlv(in)
        require(msgTag == 0x30, s"expected LDAPMessage SEQUENCE, got $msgTag")
        val body = new DataInputStream(
          new java.io.ByteArrayInputStream(msgBody))
        val (idTag, idBytes) = readTlv(body)
        require(idTag == 0x02, s"expected messageID INTEGER, got $idTag")
        val (opTag, opBody) = readTlv(body)
        opTag match {
          case 0x60 => respondBind(out, idBytes, opBody)
          case 0x42 => open = false // UnbindRequest
          case other =>
            // protocolError for anything else this stub doesn't model
            out.write(envelope(idBytes, result(0x61, 2))); out.flush()
        }
      }
    } catch {
      case _: EOFException | _: SocketException => ()
    } finally sock.close()

  private def respondBind(out: OutputStream, idBytes: Array[Byte],
                          opBody: Array[Byte]): Unit = {
    val b = new DataInputStream(new java.io.ByteArrayInputStream(opBody))
    val (_, _) = readTlv(b)             // version INTEGER
    val (nameTag, nameBytes) = readTlv(b)
    require(nameTag == 0x04, s"expected bind name OCTET STRING, got $nameTag")
    val (authTag, pwBytes) = readTlv(b) // [0] simple
    val dn = new String(nameBytes, UTF_8)
    val pw = new String(pwBytes, UTF_8)
    binds.add(dn -> pw)
    val code =
      if (authTag != 0x80) 7            // authMethodNotSupported
      else if (pw.isEmpty) 0            // RFC 4513 unauthenticated bind!
      else if (creds.get(dn).contains(pw)) 0
      else 49                           // invalidCredentials
    out.write(envelope(idBytes, result(0x61, code)))
    out.flush()
  }

  /** BindResponse body: resultCode + empty matchedDN + empty diagnostic. */
  private def result(appTag: Int, code: Int): Array[Byte] =
    tlv(appTag, tlv(0x0a, Array(code.toByte)) ++
      tlv(0x04, Array.empty) ++ tlv(0x04, Array.empty))

  private def envelope(idBytes: Array[Byte], op: Array[Byte]): Array[Byte] =
    tlv(0x30, tlv(0x02, idBytes) ++ op)

  def bindAttempts: Seq[(String, String)] = binds.asScala.toSeq
}

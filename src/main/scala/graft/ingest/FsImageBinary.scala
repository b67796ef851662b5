package graft.ingest

import java.io.RandomAccessFile
import org.apache.hadoop.thirdparty.protobuf.CodedInputStream

/** SPIKE: read the BINARY fsimage container directly — the reference's true
  * front door (`NameNodeLoader.java:319-396` boots an embedded NameNode
  * from it) — without the OIV preprocessing step.
  *
  * The on-disk format is public (Hadoop `FSImageFormatProtobuf` /
  * `fsimage.proto`): the file starts with the `HDFSIMG1` magic, ends with
  * a protobuf `FileSummary` (delimited) followed by a 4-byte big-endian
  * summary length, and the summary's section index gives (name, offset,
  * length) for each section; the `INODE` section is an `INodeSection`
  * header message followed by `numInodes` delimited `INode` messages.
  *
  * The generated `FsImageProto` classes ship in `hadoop-hdfs` (server
  * side), which is NOT on a Spark cluster's classpath — but Hadoop's
  * shaded protobuf runtime IS (`hadoop-client-runtime`), so this reader
  * walks the messages by FIELD NUMBER with `CodedInputStream` alone:
  *   FileSummary: 1=ondiskVersion, 2=layoutVersion, 3=codec, 4=section
  *   Section:     1=name, 2=length, 3=offset
  *   INodeSection: 1=lastInodeId, 2=numInodes
  *   INode:       1=type (1=FILE, 2=DIRECTORY, 3=SYMLINK), 2=id, 3=name
  *
  * DESIGN DECISION (why this stays a spike and XML stays the recommended
  * distributed front door): the binary image is NOT splittable — sections
  * are sequential, optionally compressed, and inode boundaries are only
  * discoverable by decoding from the section start — so a faithful reader
  * is a single sequential stream, not a partition-parallel scan. That is
  * fine for the NameNode's own boot (it reads sequentially too) and fine
  * here for counts/audits of multi-GB images, but ingesting billions of
  * inodes into a cluster wants the splittable renderings: `oiv -p XML`
  * (lossless, [[FsImageXmlSource]]) or Delimited ([[FsImageSource]]).
  * A production binary path would stream THIS decode into parquet once,
  * then analyze columnar — the shape [[FsImageSource.exportParquet]]
  * already provides.
  */
object FsImageBinary {

  val Magic: Array[Byte] = "HDFSIMG1".getBytes("UTF-8")

  final case class Section(name: String, offset: Long, length: Long)
  final case class Summary(ondiskVersion: Int, layoutVersion: Int,
                           codec: Option[String], sections: Seq[Section])
  final case class InodeStub(id: Long, name: String, isFile: Boolean)

  /** Parse the tail FileSummary: last 4 bytes = summary length, the
    * delimited summary message sits immediately before them. */
  def readSummary(path: String): Summary = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val magic = new Array[Byte](Magic.length)
      raf.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"$path: not an fsimage (bad magic)")
      val fileLen = raf.length()
      raf.seek(fileLen - 4)
      val summaryLen = raf.readInt()
      raf.seek(fileLen - 4 - summaryLen)
      val bytes = new Array[Byte](summaryLen)
      raf.readFully(bytes)
      val in = CodedInputStream.newInstance(bytes)
      val msgLen = in.readRawVarint32() // writeDelimitedTo prefix
      val lim = in.pushLimit(msgLen)
      var (ondisk, layout) = (0, 0)
      var codec: Option[String] = None
      val sections = Seq.newBuilder[Section]
      var tag = in.readTag()
      while (tag != 0) {
        tag >> 3 match {
          case 1 => ondisk = in.readUInt32()
          case 2 => layout = in.readUInt32()
          case 3 => codec = Some(in.readString())
          case 4 =>
            val sLen = in.readRawVarint32()
            val sLim = in.pushLimit(sLen)
            var (nm, off, len) = ("", 0L, 0L)
            var sTag = in.readTag()
            while (sTag != 0) {
              sTag >> 3 match {
                case 1 => nm = in.readString()
                case 2 => len = in.readUInt64()
                case 3 => off = in.readUInt64()
                case _ => in.skipField(sTag)
              }
              sTag = in.readTag()
            }
            in.popLimit(sLim)
            sections += Section(nm, off, len)
          case _ => in.skipField(tag)
        }
        tag = in.readTag()
      }
      in.popLimit(lim)
      Summary(ondisk, layout, codec, sections.result())
    } finally raf.close()
  }

  /** Stream the INODE section: header (lastInodeId, numInodes), then
    * `numInodes` delimited INode stubs (id, name, FILE/DIRECTORY).
    * Sequential by format design — see the design note above. Refuses
    * compressed images (codec set) to stay an honest spike. */
  def readInodes(path: String): (Long, Seq[InodeStub]) = {
    val summary = readSummary(path)
    require(summary.codec.isEmpty,
      s"$path: compressed fsimage (${summary.codec.get}) — spike reads uncompressed only")
    val sec = summary.sections.find(_.name == "INODE")
      .getOrElse(throw new IllegalArgumentException(s"$path: no INODE section"))
    val raf = new RandomAccessFile(path, "r")
    try {
      raf.seek(sec.offset)
      val bytes = new Array[Byte](sec.length.toInt)
      raf.readFully(bytes)
      val in = CodedInputStream.newInstance(bytes)
      // INodeSection header (delimited)
      val hLen = in.readRawVarint32()
      val hLim = in.pushLimit(hLen)
      var numInodes = 0L
      var hTag = in.readTag()
      while (hTag != 0) {
        hTag >> 3 match {
          case 2 => numInodes = in.readUInt64()
          case _ => in.skipField(hTag)
        }
        hTag = in.readTag()
      }
      in.popLimit(hLim)
      val stubs = Seq.newBuilder[InodeStub]
      var i = 0L
      while (i < numInodes) {
        val mLen = in.readRawVarint32()
        val mLim = in.pushLimit(mLen)
        var (tpe, id, nm) = (0, 0L, "")
        var tag = in.readTag()
        while (tag != 0) {
          tag >> 3 match {
            case 1 => tpe = in.readEnum()
            case 2 => id = in.readUInt64()
            case 3 => nm = new String(in.readBytes().toByteArray, "UTF-8")
            case _ => in.skipField(tag)
          }
          tag = in.readTag()
        }
        in.popLimit(mLim)
        stubs += InodeStub(id, nm, isFile = tpe == 1)
        i += 1
      }
      (numInodes, stubs.result())
    } finally raf.close()
  }
}

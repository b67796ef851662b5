package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native Catalyst aggregate — the
  * heavy-hitters operator with BOUNDED memory (`k` counters per partial,
  * regardless of stream length or cardinality).
  *
  * The exact top-terms path (`text_top_terms`) shuffles every distinct
  * token's count; at 100 TB the distinct-token table IS a corpus-sized
  * shuffle. This sketch is the production twin: each task keeps ≤ k
  * counters, partials merge by count-addition followed by the
  * (k+1)-th-largest subtraction (the mergeable-summaries construction of
  * Agarwal et al., PODS'12), and only `k`-entry maps ever move. The
  * result guarantee, preserved under arbitrary merge trees: every
  * reported count `ĉ` satisfies `c − N/(k+1) ≤ ĉ ≤ c` (true count c,
  * stream length N), so every item with `c > N/(k+1)` MUST be reported.
  * Queries assert exactly that bound in-engine against the exact twin
  * (the oracle pins the booleans TRUE, failing the round if the sketch
  * ever drifts).
  *
  * Update path: classic MG — hit increments; miss inserts while fewer
  * than k counters live, else decrements every counter (dropping zeros),
  * which is where the undercount comes from. Output: (item, cnt) structs
  * sorted by (cnt desc, item asc) for deterministic downstream use.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[JHashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string column, got ${other.sql}")
  }

  override def createAggregationBuffer(): JHashMap[String, Long] =
    new JHashMap[String, Long]()

  private def add(buf: JHashMap[String, Long], item: String, c: Long): Unit = {
    val cur = buf.get(item)
    if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + c)
    else if (buf.size() < k) buf.put(item, c)
    else {
      // miss with k live counters: decrement all by 1 (c times would be
      // wrong — update() only ever adds 1; merge() never lands here)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(buf: JHashMap[String, Long],
                      input: InternalRow): JHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(b1: JHashMap[String, Long],
                     b2: JHashMap[String, Long]): JHashMap[String, Long] = {
    // count-addition...
    b2.forEach { (item, c) =>
      val cur = b1.get(item)
      b1.put(item, cur + c)
    }
    // ...then shrink back to k: subtract the (k+1)-th largest count from
    // every counter and drop the non-positive (Agarwal et al. merge —
    // keeps total undercount ≤ N/(k+1) across any merge tree)
    if (b1.size() > k) {
      val counts = new Array[Long](b1.size())
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - k - 1) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: JHashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size())
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  override def serialize(buf: JHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { (item, c) =>
      val b = item.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new JHashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  def misra_gries(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(MisraGries(toExpression(c), k).toAggregateExpression())
  }
}

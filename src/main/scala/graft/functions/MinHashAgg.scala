package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a custom aggregate function: aggregates one
  * shingle string per input row into the k-permutation signature —
  * the `TypedImperativeAggregate` path for sketch-style aggregations
  * (SURVEY.md §2.8), complementing the per-row array expression
  * [[HashExpressions.MinHashSigs]]. Same bits: min over salted md5
  * digests, hex-rendered.
  *
  * The buffer is k 16-byte digests; partial aggregation and merge are
  * element-wise unsigned minima, so the shuffle carries k digests per
  * group — not the shingles.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"

  // ThreadLocal: expression instances can be shared across local-mode
  // executor threads
  @transient private lazy val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private def md = mdLocal.get()
  @transient private lazy val salts =
    Array.tabulate(k)(p => (p.toString + ":").getBytes("UTF-8"))

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](k)

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      val digest = md
      var p = 0
      while (p < k) {
        digest.reset(); digest.update(salts(p)); digest.update(bytes)
        val d = digest.digest()
        if (buf(p) == null || unsignedLess(d, buf(p))) buf(p) = d
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var p = 0
    while (p < k) {
      if (a(p) == null || (b(p) != null && unsignedLess(b(p), a(p)))) a(p) = b(p)
      p += 1
    }
    a
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >>> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    if (buf(0) == null) null
    else new GenericArrayData(buf.map(d => UTF8String.fromString(hex(d))))

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](k * 17)
    var p = 0
    while (p < k) {
      if (buf(p) == null) out(p * 17) = 0
      else {
        out(p * 17) = 1
        System.arraycopy(buf(p), 0, out, p * 17 + 1, 16)
      }
      p += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](k)
    var p = 0
    while (p < k) {
      if (bytes(p * 17) == 1) {
        val d = new Array[Byte](16)
        System.arraycopy(bytes, p * 17 + 1, d, 0, 16)
        buf(p) = d
      }
      p += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashAgg =
    copy(child = c)
}

object MinHashAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate Column: minhash signature over one-shingle-per-row input. */
  def minhashAgg(shingle: Column, k: Int): Column =
    column(MinHashAgg(expression(shingle), k).toAggregateExpression())
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-sketch operators.
  *
  * The declarative formulations (higher-order `transform`/`filter` over
  * md5 hex strings) are semantically right but evaluate one interpreted
  * lambda call per array element — tens of millions of boxed calls per
  * partition at corpus scale. These expressions compute the identical
  * bits in one tight JVM loop per row: same md5, same nibble/lexicographic
  * semantics, so the DuckDB oracles that mirror the declarative form still
  * match exactly. (CodegenFallback is fine here: the per-row work is
  * hundreds of digest calls, dwarfing the per-row virtual call.)
  */
object HashExpressions {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >>> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte-wise compare — equals lexicographic compare of the
    * lowercase hex rendering.
    */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** k-permutation MinHash signature of an array<string> of shingles:
    * element p = min over shingles of md5("p:" + shingle) as lowercase
    * hex. Bit-identical to
    * `array_min(transform(shingles, s -> md5(concat('p:', s))))`.
    */
  case class MinHashSigs(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "minhash_sigs"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md = md5Local.get()
      val mins = new Array[Array[Byte]](k)
      val salts = Array.tabulate(k)(p => (p.toString + ":").getBytes("UTF-8"))
      var i = 0
      while (i < n) {
        val shingle = arr.getUTF8String(i).getBytes
        var p = 0
        while (p < k) {
          md.reset()
          md.update(salts(p))
          md.update(shingle)
          val d = md.digest()
          if (mins(p) == null || unsignedLess(d, mins(p))) mins(p) = d
          p += 1
        }
        i += 1
      }
      if (n == 0) null
      else new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))))
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 32-bit SimHash of an array<string> of tokens: bit j is the majority
    * vote of md5-hex-nibble j's high bit over all token occurrences.
    * Bit-identical to the declarative nibble/filter formulation in
    * [[graft.llm.SimHash]].
    */
  case class SimHash32(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val md = md5Local.get()
      val votes = new Array[Int](32)
      var i = 0
      while (i < n) {
        val d = {
          md.reset()
          md.update(arr.getUTF8String(i).getBytes)
          md.digest()
        }
        var j = 0
        while (j < 32) {
          // hex char j = high nibble of byte j/2 when j even, else low
          val nib =
            if ((j & 1) == 0) (d(j >> 1) >>> 4) & 0xf
            else d(j >> 1) & 0xf
          if (nib >= 8) votes(j) += 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 32) {
        if (2 * votes(j) - n > 0) out |= (1L << j)
        j += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct word n-gram shingles of an array<string> of tokens:
    * `[tokens[i..i+n-1].mkString(" ")]` for all i, first-occurrence order;
    * when fewer than n tokens, the single all-tokens join. Bit-identical
    * to the declarative `transform(sequence(...), i -> concat_ws(' ',
    * slice(...)))` + `array_distinct` form — but one pass per row, where
    * the nested-lambda form re-evaluates the embedded token-split per
    * shingle index (O(tokens²) regex splits per document).
    */
  case class WordNgrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val cnt = arr.numElements()
      val toks = new Array[String](cnt)
      var i = 0
      while (i < cnt) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
      val out = new java.util.LinkedHashSet[String]()
      if (cnt >= n) {
        i = 0
        while (i <= cnt - n) {
          out.add(toks.slice(i, i + n).mkString(" "))
          i += 1
        }
      } else {
        out.add(toks.mkString(" "))
      }
      val res = new Array[AnyRef](out.size)
      val it = out.iterator()
      i = 0
      while (it.hasNext) { res(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(res)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Cosine similarity of two float vectors in one fused loop (dot and
    * both norms together), accumulating products left-to-right in double —
    * the same element order as the `zip_with`+`aggregate` fold, so results
    * match the declarative form bit-for-bit.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var nx = 0.0
      var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi
        nx += xi * xi
        ny += yi * yi
        i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom > 0) dot / denom else 0.0
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Content-defined-chunking boundary scan of an array<string> of
    * tokens: the chunk END positions (1-based, inclusive, final
    * position always included) under the [[graft.llm.CdcChunks]] cut
    * rule — position i ≥ k ends a chunk when the md5 of the
    * space-joined k-token window ending at i has
    * `first-15-hex-digits mod modulus == 0`. Bit-identical to the
    * declarative
    * `concat(filter(sequence(k, n), i -> cut(i) && i != n), array(n))`
    * formulation, which evaluates one INTERPRETED lambda (slice +
    * array_join + md5 + conv) per token — the measured 6× throughput
    * gap of the streaming CDC rung (BENCH_STREAMING r11: 949 rows/s vs
    * 5.6k for fixed segments on identical input and state shape) was
    * exactly that per-element interpretation, not state or planning.
    * Here: one rolling UTF-8 window buffer and one digest per
    * position, all in a tight JVM loop per row.
    */
  case class CdcCutEnds(child: Expression, k: Int, modulus: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 2, s"k=$k")
    require(modulus >= 2, s"modulus=$modulus")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "cdc_cut_ends"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Long])
      val toks = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
      val md = md5Local.get()
      val sp = ' '.toByte
      val ends = scala.collection.mutable.ArrayBuffer.empty[Long]
      i = k
      while (i < n) { // i == n is never a cut-emitted end; appended below
        md.reset()
        var j = i - k
        while (j < i) {
          if (j > i - k) md.update(sp)
          md.update(toks(j))
          j += 1
        }
        val d = md.digest()
        // first 15 hex digits = high 7.5 bytes, non-negative in 60 bits
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        if (v % modulus == 0) ends += i.toLong
        i += 1
      }
      ends += n.toLong
      new GenericArrayData(ends.toArray)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-window gram hashes of an array<string> of tokens: element i
    * (0-based output index, 1-based `pos`) is
    * `(pos = i+1, h = first hexDigits hex digits of md5 of the
    * space-joined w-token window starting at pos)` — bit-identical to
    * `transform(sequence(1, n-w+1), i -> struct(i, conv(substring(
    * md5(array_join(slice(toks, i, w), ' ')), 1, hexDigits), 16, 10)))`,
    * the shape both [[graft.llm.SubstringDedup.shingleHashes]]
    * (hexDigits = 15) and `TextStats.winnowFingerprints`
    * (hexDigits = 10) explode. The declarative lambda evaluates one
    * INTERPRETED slice+join+md5 per window — the same CodegenFallback
    * higher-order-function cost class as the CDC cut rule, at corpus
    * grain on the exact-substring family's hottest path (5M docs ×
    * ~96 windows at the sf100 rung). One rolling buffer + one digest
    * per window in a tight JVM loop per row.
    */
  case class WindowGramHashes(child: Expression, w: Int, hexDigits: Int)
      extends UnaryExpression with CodegenFallback {
    require(w >= 1, s"w=$w")
    require(hexDigits >= 1 && hexDigits <= 15, s"hexDigits=$hexDigits")
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("pos", LongType, nullable = false),
        StructField("h", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "window_gram_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < w) return new GenericArrayData(Array.empty[Any])
      val toks = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
      val md = md5Local.get()
      val sp = ' '.toByte
      val out = new Array[Any](n - w + 1)
      i = 0
      while (i <= n - w) {
        md.reset()
        var j = i
        while (j < i + w) {
          if (j > i) md.update(sp)
          md.update(toks(j))
          j += 1
        }
        val d = md.digest()
        // first hexDigits nibbles of the hex rendering, as a long
        var v = 0L
        var nib = 0
        while (nib < hexDigits) {
          val b = d(nib >> 1)
          val x = if ((nib & 1) == 0) (b >> 4) & 0xf else b & 0xf
          v = (v << 4) | x
          nib += 1
        }
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any]((i + 1).toLong, v))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // Column wrappers (classic-API Column <-> Expression bridge) ----------

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSigs(shingles: Column, k: Int): Column =
    column(MinHashSigs(expression(shingles), k))

  def wordNgrams(tokens: Column, n: Int): Column =
    column(WordNgrams(expression(tokens), n))

  def simhash32(tokens: Column): Column =
    column(SimHash32(expression(tokens)))

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def cdcCutEnds(tokens: Column, k: Int, modulus: Int): Column =
    column(CdcCutEnds(expression(tokens), k, modulus))

  def windowGramHashes(tokens: Column, w: Int, hexDigits: Int): Column =
    column(WindowGramHashes(expression(tokens), w, hexDigits))
}

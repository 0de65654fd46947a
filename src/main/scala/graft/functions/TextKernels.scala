package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernels for the natively code-generated text
  * expressions ([[TermFreqs]], [[Ngrams]], [[CharBigrams]]). ONE body
  * serves both execution modes — `nullSafeEval` (interpreted) and the
  * generated code's static call from `doGenCode` — so the two paths
  * cannot drift. A top-level object gets JVM static forwarders, which
  * is what the generated Java calls
  * (`graft.functions.TextKernels.ngrams(...)`). */
object TextKernels {

  private val sep = UTF8String.fromString(" ")

  /** [[TermFreqs]] kernel: one byte scan for 0x20 delimiters; each
    * token compared in place against the precomputed term byte arrays
    * (zero per-row allocation beyond the output). */
  def termFreqs(text: UTF8String, termBytes: Array[Array[Byte]]): InternalRow = {
    val k = termBytes.length
    val tf = new Array[Long](k)
    val bytes = text.getBytes
    val n = bytes.length
    var dl = 1L // m delimiters => m+1 tokens, like string_split
    var start = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || bytes(pos) == ' ') {
        val tokLen = pos - start
        var j = 0
        while (j < k) {
          val tb = termBytes(j)
          if (tb.length == tokLen) {
            var eq = true
            var b = 0
            while (eq && b < tokLen) {
              if (bytes(start + b) != tb(b)) eq = false
              b += 1
            }
            if (eq) tf(j) += 1
          }
          j += 1
        }
        if (pos < n) dl += 1
        start = pos + 1
      }
      pos += 1
    }
    new GenericInternalRow(Array[Any](dl, ArrayData.toArrayData(tf)))
  }

  /** [[Ngrams]] kernel: one `UTF8String.concatWs` per window. */
  def ngrams(arr: ArrayData, ng: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - ng + 1
    if (ng < 1 || m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) UTF8String.EMPTY_UTF8 else s
      i += 1
    }
    val out = new Array[Any](m)
    val window = new Array[UTF8String](ng)
    i = 0
    while (i < m) {
      var j = 0
      while (j < ng) { window(j) = toks(i + j); j += 1 }
      out(i) = if (ng == 1) toks(i) else UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[CharBigrams]] kernel: one byte walk recording code-point
    * boundaries, then direct byte-range slices. */
  def charBigrams(v: UTF8String): ArrayData = {
    val bytes = v.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var i = 0; var c = 0
    val starts = new Array[Int](n + 1)
    while (i < n) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(c) = n
    val m = c - 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      out(k) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(k), starts(k + 2)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

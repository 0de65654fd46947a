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

  /** [[RepeatStats]] kernel: build n-grams, sort, one run-length scan. */
  def repeatStats(arr: ArrayData, ng: Int): InternalRow = {
    val n = arr.numElements()
    val m = n - ng + 1
    if (ng < 1 || m <= 0) return new GenericInternalRow(Array[Any](0L, 0L))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      toks(i) = if (s == null) UTF8String.EMPTY_UTF8 else s
      i += 1
    }
    val a = new Array[AnyRef](m)
    if (ng == 1) {
      System.arraycopy(toks, 0, a, 0, m)
    } else {
      val window = new Array[UTF8String](ng)
      i = 0
      while (i < m) {
        var j = 0
        while (j < ng) { window(j) = toks(i + j); j += 1 }
        a(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
    }
    java.util.Arrays.sort(a)
    var top = 1L
    var dup = 0L
    var run = 1L
    i = 1
    while (i < m) {
      if ((a(i) eq a(i - 1)) || a(i).equals(a(i - 1))) {
        run += 1
        dup += (if (run == 2) 2L else 1L)
        if (run > top) top = run
      } else run = 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](top, dup))
  }

  /** [[GridSegments]] kernel: non-overlapping fixed-grid segments. */
  def gridSegments(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (w < 1 || n == 0) return new GenericArrayData(Array.empty[Any])
    val m = (n + w - 1) / w
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val start = i * w
      val len = math.min(w, n - start)
      val window = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        val s = arr.getUTF8String(start + j)
        window(j) = if (s == null) UTF8String.EMPTY_UTF8 else s
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](start + 1,
        if (len == 1) window(0) else UTF8String.concatWs(sep, window: _*)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[WindowHashes]] kernel: per-token XXH64 once, chained per window. */
  def windowHashes(arr: ArrayData, w: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = arr.numElements()
    val m = n - w + 1
    if (w < 1 || m <= 0) return new GenericArrayData(Array.empty[Any])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < w) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = new GenericInternalRow(Array[Any](i + 1, h))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[RemoveSpans]] kernel: merged-interval sweep, O(n + |starts|). */
  def removeSpans(arr: ArrayData, st: ArrayData, w: Int): UTF8String = {
    val n = arr.numElements()
    val m = st.numElements()
    // The sweep needs `starts` ascending. The internal caller
    // (Dedup.dedupSpans) emits sorted starts, but the function is
    // SQL-exposed — copy + validate, sorting if a caller hands us
    // unsorted input instead of silently keeping spans that should
    // have been removed. Null elements are rejected loudly.
    val starts = new Array[Int](m)
    var sorted = true
    var si = 0
    while (si < m) {
      if (st.isNullAt(si)) throw new IllegalArgumentException(
        "graft_remove_spans: starts array must not contain null elements")
      starts(si) = st.getInt(si)
      if (si > 0 && starts(si) < starts(si - 1)) sorted = false
      si += 1
    }
    if (!sorted) java.util.Arrays.sort(starts)
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var idx = 0
    var curEnd = 0L
    var pos = 1
    while (pos <= n) {
      while (idx < m && starts(idx) <= pos) {
        val end = starts(idx).toLong + w - 1
        if (end > curEnd) curEnd = end
        idx += 1
      }
      if (pos > curEnd) {
        val tok = arr.getUTF8String(pos - 1)
        kept(nKept) = if (tok == null) UTF8String.EMPTY_UTF8 else tok
        nKept += 1
      }
      pos += 1
    }
    UTF8String.concatWs(sep, java.util.Arrays.copyOf(kept, nKept): _*)
  }

  /** [[BpeEncodeExpr]] kernel: greedy left-to-right scan against the
    * precomputed merge-rank map. */
  def bpeEncode(v: UTF8String,
      mergeIds: java.util.HashMap[String, Integer]): ArrayData = {
    val s = v.toString
    val n = s.length
    val buf = new Array[Int](n) // <= one token per char
    var k = 0
    var i = 0
    while (i < n) {
      val cp1 = s.codePointAt(i)
      val l1 = Character.charCount(cp1)
      var advanced = false
      if (i + l1 < n) {
        val l2 = Character.charCount(s.codePointAt(i + l1))
        val id = mergeIds.get(s.substring(i, i + l1 + l2))
        if (id != null) {
          buf(k) = id.intValue(); k += 1
          i += l1 + l2
          advanced = true
        }
      }
      if (!advanced) {
        buf(k) = cp1; k += 1
        i += l1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
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

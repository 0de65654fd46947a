package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Shared per-row kernels for the natively code-generated vector
  * expressions ([[QuantizeVec]], [[DequantizeVec]], [[SignBits]]) —
  * the [[TextKernels]] discipline: one body serves both
  * `nullSafeEval` and the generated code's static call, so the
  * interpreted and generated paths cannot drift. */
object VectorKernels {

  /** [[QuantizeVec]] kernel: one pass for maxAbs, one clamped rounding
    * pass into int8. */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var maxAbs = 0.0f
    var i = 0
    while (i < n) {
      val x = math.abs(arr.getFloat(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = (maxAbs / 127.0).toFloat
    val q = new Array[Byte](n)
    if (scale != 0.0f) {
      i = 0
      while (i < n) {
        // clamp: float rounding of the scale can push maxAbs/scale a
        // hair past 127, and 128.toByte would wrap to -128
        val r = math.round(arr.getFloat(i) / scale.toDouble)
        q(i) = (if (r > 127L) 127L else if (r < -127L) -127L else r).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(q)))
  }

  /** [[DequantizeVec]] kernel. */
  def dequantize(arr: ArrayData, scale: Float): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = arr.getByte(i) * scale; i += 1 }
    new GenericArrayData(out)
  }

  /** [[SignBits]] kernel over the PRE-EXTRACTED plane matrix (the
    * foldable literal is unpacked once per expression instance, not
    * re-walked as ArrayData per row — the TermFreqs rule). */
  def signBits(arr: ArrayData, planes: Array[Array[Double]]): Long = {
    val nBits = planes.length
    var sig = 0L
    var i = 0
    while (i < nBits) {
      val plane = planes(i)
      val dim = math.min(arr.numElements(), plane.length)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += arr.getFloat(j).toDouble * plane(j); j += 1 }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

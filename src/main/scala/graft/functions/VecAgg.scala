package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY §2.7): element-wise mean of an
  * `array<double>` column as an [[Aggregator]] — the centroid step of
  * the IVF build (one map-side-combinable shuffle; the alternative,
  * posexplode + per-dimension groupBy, shuffles dim× the rows and
  * aggregates twice).
  *
  * The buffer is (elementwise sum, count); vectors of inconsistent
  * dimension throw rather than silently truncate.
  */
object VecAgg {

  final case class MeanBuf(var sum: Array[Double], var n: Long)

  class ArrayMean extends Aggregator[Seq[Double], MeanBuf, Seq[Double]] {
    def zero: MeanBuf = MeanBuf(Array.empty, 0L)
    def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf = {
      if (b.n == 0L) { b.sum = v.toArray; b.n = 1L; b }
      else {
        require(v.length == b.sum.length,
          s"dim mismatch: ${v.length} vs ${b.sum.length}")
        var i = 0
        while (i < b.sum.length) { b.sum(i) += v(i); i += 1 }
        b.n += 1L
        b
      }
    }
    def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.sum.length == b.sum.length,
          s"dim mismatch: ${a.sum.length} vs ${b.sum.length}")
        var i = 0
        while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
        a.n += b.n
        a
      }
    }
    def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty else b.sum.toSeq.map(_ / b.n)
    def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped column form: `vecMean(col)` in a `groupBy(...).agg(...)`. */
  def vecMean(c: Column): Column = udaf(new ArrayMean).apply(c)

  final case class MinMaxBuf(var mn: Array[Double], var mx: Array[Double])
  final case class MinMaxOut(mins: Seq[Double], maxs: Seq[Double])

  /** Element-wise (min, max) of an `array<double>` column — the
    * per-cell quantization-bounds step of the IVF+SQ build (one
    * map-side-combinable shuffle; exact input values, so any engine
    * reproduces the bounds and the codes bit-for-bit). */
  class ArrayMinMax extends Aggregator[Seq[Double], MinMaxBuf, MinMaxOut] {
    def zero: MinMaxBuf = MinMaxBuf(Array.empty, Array.empty)
    def reduce(b: MinMaxBuf, v: Seq[Double]): MinMaxBuf = {
      if (b.mn.isEmpty && b.mx.isEmpty) {
        b.mn = v.toArray; b.mx = v.toArray; b
      } else {
        require(v.length == b.mn.length,
          s"dim mismatch: ${v.length} vs ${b.mn.length}")
        var i = 0
        while (i < b.mn.length) {
          if (v(i) < b.mn(i)) b.mn(i) = v(i)
          if (v(i) > b.mx(i)) b.mx(i) = v(i)
          i += 1
        }
        b
      }
    }
    def merge(a: MinMaxBuf, b: MinMaxBuf): MinMaxBuf = {
      if (a.mn.isEmpty && a.mx.isEmpty) b
      else if (b.mn.isEmpty && b.mx.isEmpty) a
      else {
        require(a.mn.length == b.mn.length,
          s"dim mismatch: ${a.mn.length} vs ${b.mn.length}")
        var i = 0
        while (i < a.mn.length) {
          if (b.mn(i) < a.mn(i)) a.mn(i) = b.mn(i)
          if (b.mx(i) > a.mx(i)) a.mx(i) = b.mx(i)
          i += 1
        }
        a
      }
    }
    def finish(b: MinMaxBuf): MinMaxOut = MinMaxOut(b.mn.toSeq, b.mx.toSeq)
    def bufferEncoder: Encoder[MinMaxBuf] = Encoders.product[MinMaxBuf]
    def outputEncoder: Encoder[MinMaxOut] = Encoders.product[MinMaxOut]
  }

  /** Untyped column form: struct with fields (mins, maxs). */
  def vecMinMax(c: Column): Column = udaf(new ArrayMinMax).apply(c)
}

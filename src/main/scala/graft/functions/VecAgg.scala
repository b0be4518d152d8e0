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
}

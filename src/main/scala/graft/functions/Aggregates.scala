package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Custom typed aggregates (SURVEY.md §2.12).
  *
  * RMSSD — root mean square of successive differences — is the signature
  * heart-rate-variability feature: sqrt(mean(Δ²)) over consecutive
  * samples. The ordering-dependent part (the Δ between consecutive values)
  * is computed with a lag window; this Aggregator then reduces the deltas,
  * so the aggregate itself is commutative and map-side combinable, exactly
  * like a built-in. Cross-checkable against sqrt(avg(dv*dv)).
  */
object Aggregates {

  /** (sum of squares, count) buffer. */
  case class SqBuf(sumSq: Double, n: Long)

  /** RMSSD over a column of successive differences (nulls — the first row
    * of each series — are skipped by Spark before reaching the
    * aggregator's typed input when used via `udaf` on a non-nullable
    * projection; callers should filter nulls first). */
  object Rmssd extends Aggregator[Double, SqBuf, Double] {
    def zero: SqBuf = SqBuf(0.0, 0L)
    def reduce(b: SqBuf, dv: Double): SqBuf = SqBuf(b.sumSq + dv * dv, b.n + 1)
    def merge(a: SqBuf, b: SqBuf): SqBuf = SqBuf(a.sumSq + b.sumSq, a.n + b.n)
    def finish(b: SqBuf): Double = if (b.n > 0) math.sqrt(b.sumSq / b.n) else Double.NaN
    def bufferEncoder: Encoder[SqBuf] = Encoders.product[SqBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register rmssd for SQL / Column use on a session. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("rmssd", functions.udaf(Rmssd))

  def rmssd(c: Column): Column = functions.udaf(Rmssd).apply(c)
}

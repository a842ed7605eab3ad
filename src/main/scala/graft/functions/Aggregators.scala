package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11): `Aggregator[IN, BUF, OUT]` is
  * the escape hatch for aggregation logic built-ins can't express.
  * Shipped example: an exact money mean — accumulates integer cents, so
  * the merge is associative/commutative and the result is identical for
  * every partitioning (the property Welford-style double accumulation
  * lacks; cf. StatsQueries' variance note).
  */
object Aggregators {

  /** Exact mean of a dollars.cents double column via integer cents. */
  object ExactMoneyMean extends Aggregator[Double, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: Double): (Long, Long) =
      (b._1 + math.round(a * 100), b._2 + 1)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) 0.0 else r._1.toDouble / 100.0 / r._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

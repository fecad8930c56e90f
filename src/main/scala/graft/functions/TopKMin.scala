package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Top-k-smallest per group as a typed `Aggregator` — the sort-free
  * top-k the ANN serving path needs: ranking scored candidate pairs
  * with `row_number()` forces a FULL SORT of the scored stream (the
  * biggest intermediate of the serving path — WindowGroupLimit's
  * partial mode still sorts every partition before it can limit),
  * while this aggregator keeps a k-slot ordered buffer per group with
  * map-side partial merge: the shuffle carries `groups × k` rows
  * instead of the whole pair stream, and nothing is ever sorted beyond
  * k slots. Measured on a 1000-query × 2M-row IVFPQ batch (31M scored
  * pairs): 14.8 s → 5.2 s end-to-end (ScaleProbe).
  *
  * Total order is `(value, id)` ascending — ties impossible with
  * unique ids, so the result is partition-order independent and equals
  * `row_number() OVER (ORDER BY value ASC, id ASC) <= k` exactly
  * (spec-asserted). Inputs must be non-null and FINITE: `+Inf` is the
  * empty-slot sentinel and NaN has no place in the `(value, id)`
  * total order, so `reduce` REJECTS non-finite values loudly rather
  * than silently dropping them (the window form it replaces would
  * rank NaN first — a silent divergence is worse than a failure).
  * ADC distances and negated rounded cosines — the serving inputs —
  * are finite by construction; a zero-norm embedding's cosine is the
  * one upstream source of NaN, filter it before ranking.
  */
final class TopKMin(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]),
      Seq[(Double, Long)]] {
  require(k >= 1, s"TopKMin needs k >= 1, got $k")

  // fixed k slots, kept sorted ascending by (value, id); empty slots
  // hold the (+Inf, MaxValue) sentinel, which any real entry beats
  override def zero: (Array[Double], Array[Long]) =
    (Array.fill(k)(Double.PositiveInfinity), Array.fill(k)(Long.MaxValue))

  @inline private def beats(d: Double, id: Long, d2: Double,
      id2: Long): Boolean = d < d2 || (d == d2 && id < id2)

  private def insert(buf: (Array[Double], Array[Long]), d: Double,
      id: Long): Unit = {
    val (ds, ids) = buf
    if (!beats(d, id, ds(k - 1), ids(k - 1))) return
    var i = k - 1
    while (i > 0 && beats(d, id, ds(i - 1), ids(i - 1))) {
      ds(i) = ds(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    ds(i) = d; ids(i) = id
  }

  override def reduce(buf: (Array[Double], Array[Long]),
      x: (Double, Long)): (Array[Double], Array[Long]) = {
    require(java.lang.Double.isFinite(x._1),
      s"TopKMin requires finite values, got ${x._1} for id ${x._2} — " +
        "filter or score non-finite candidates (e.g. zero-norm " +
        "embeddings) before ranking")
    insert(buf, x._1, x._2)
    buf
  }

  override def merge(a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    var i = 0
    while (i < k && b._1(i) != Double.PositiveInfinity) {
      insert(a, b._1(i), b._2(i))
      i += 1
    }
    a
  }

  override def finish(buf: (Array[Double], Array[Long]))
      : Seq[(Double, Long)] =
    buf._1.indices.takeWhile(buf._1(_) != Double.PositiveInfinity)
      .map(i => (buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKMin {
  /** Column function over `(value, id)` (the tuple input flattens to
    * two UDAF parameters); returns the ascending top-k as
    * `array<struct<_1: value, _2: id>>`. Explode with `posexplode`
    * and use `pos + 1` as the rank.
    */
  def apply(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKMin(k))
    (v: Column, id: Column) => f(v, id)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` merging MinHash signatures by elementwise min —
  * the one operator family where a custom aggregator is justified
  * (SURVEY.md §7.4): sketch UNION. The elementwise min of two documents'
  * MinHash signatures is exactly the signature of the union of their
  * shingle sets, so a group's merged sketch estimates the group-level
  * Jaccard similarity against any other group in O(k) — no shuffle of
  * the underlying shingles.
  *
  * Scale: the buffer is k longs regardless of group size; partial
  * (map-side) merge applies, so each partition contributes one k-vector
  * to the shuffle — the same profile as a built-in min().
  */
final class MinHashMerge(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // LOUD on a short signature: silently skipping the missing slots
    // leaves Long.MaxValue sentinels in the merged output, and two
    // unrelated short-signature groups then "agree" on those
    // components — inflated Jaccard with no error anywhere
    require(sig.length >= k,
      s"MinHashMerge: signature has ${sig.length} components, " +
        s"need >= $k — was it built with a smaller k?")
    var i = 0
    while (i < k) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashMerge {
  /** Column function: `merged(sigArrayCol)` usable inside groupBy.agg. */
  def apply(k: Int): Column => Column = {
    val f = udaf(new MinHashMerge(k))
    (c: Column) => f(c)
  }
}

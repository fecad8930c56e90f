package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-Min sketch over pre-hashed items as a typed `Aggregator` —
  * the single-pass, fixed-memory frequency estimator a 100 TB token
  * stream needs where an exact (token → count) aggregation would
  * shuffle the full vocabulary. The buffer is d·w longs regardless of
  * input size; partial (map-side) merge is elementwise add, so each
  * partition ships one small array to the shuffle — the same profile
  * as a built-in sum().
  *
  * Determinism: rows use the engine's universal hash family
  * h_r(x) = (a_r·x + b_r) mod P over the shared 60-bit md5 base hash
  * ([[graft.operators.TextOps.hash15]]), so the sketch cells — and
  * therefore every estimate — are bit-identical across engines and
  * partitionings. The classic CMS guarantee holds: an estimate
  * (min over rows of the addressed cell) never under-counts.
  *
  * The reference has no sketches at all (its distinct/count queries are
  * exact, SURVEY.md §2.4); this is a §7.4 extension operator.
  */
final class CountMinSketch(d: Int, w: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  import graft.operators.DedupOps.{minHashA, minHashB, MinHashP}

  // The input hash is reduced mod P FIRST (floorMod: a negative Long is
  // legal under the Aggregator contract even though the hash15/pmod
  // call sites happen to be non-negative). This both prevents the
  // buffer-index-out-of-bounds of a sign-following % and keeps
  // a·h' + b ≤ 4097·d·2³¹ — no Long overflow, so the JVM cell equals
  // the ANSI-SQL estimate cell bit-for-bit.
  private def cell(r: Int, h: Long): Int = {
    val hm = Math.floorMod(h, MinHashP)
    (r * w + (minHashA(r) * hm + minHashB(r)) % MinHashP % w).toInt
  }

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var r = 0
    while (r < d) { buf(cell(r, h)) += 1; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMinSketch {
  /** Column function: `sketch(baseHashCol)` usable inside agg. */
  def apply(d: Int, w: Int): Column => Column = {
    val f = udaf(new CountMinSketch(d, w))
    (c: Column) => f(c)
  }

  /** Point-estimate lookup in a finished sketch array (1-based
    * element_at over the flattened d×w layout): min over rows of the
    * addressed cell.
    */
  def estimate(sketch: Column, baseHash: Column, d: Int, w: Int): Column = {
    import org.apache.spark.sql.functions._
    import graft.operators.DedupOps.{minHashA, minHashB, MinHashP}
    val hm = pmod(baseHash, lit(MinHashP)) // mirror cell(): reduce first
    (0 until d).map { r =>
      element_at(sketch,
        (lit(r * w) +
          (lit(minHashA(r)) * hm + lit(minHashB(r))) % MinHashP % w
          + 1).cast("int"))
    }.reduce(least(_, _))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom membership sketch over 64-bit keys: the fixed-memory semi-join
  * pruning primitive for 100 TB fact scans. Build the sketch over the
  * interesting dimension keys (a distributed aggregation whose buffer
  * is `numBits/8` bytes regardless of key count, map-side merged like a
  * sum), ship the finished bitset to every task as a reference object,
  * and drop fact rows whose key cannot possibly join BEFORE they reach
  * the shuffle. False positives only cost wasted shuffle rows — the
  * exact join downstream removes them — so correctness never depends on
  * the sketch, and the pruned plan hash-matches a plain join's results
  * by construction. No false negatives: every inserted key probes true
  * (spec-pinned).
  *
  * This is the membership analogue of [[CountMinSketch]] (frequency)
  * and complements broadcast pruning: an exact key SET stops fitting a
  * broadcast at ~10⁷ keys, while a 1% bloom of 10⁸ keys is ~120 MB and
  * of 10⁶ keys ~1.2 MB. Sizing: `bits = -n·ln(p)/ln²2`, `k = (bits/n)·ln 2`
  * ([[BloomSketch.sizing]]).
  *
  * Hashing is double hashing over a splitmix64 mix of the raw key:
  * bit_i = (h1 + i·h2) mod bits. The mix is a JVM-side choice (it never
  * needs a SQL twin — the sketch is invisible in results); splitmix64
  * passes avalanche tests and costs two multiplies per hash.
  *
  * The reference prunes per-site queries by exact key lists
  * (reference: src/GAMUTRawData/odmservices/series_service.py IN-list
  * construction); a bloom is the shape that survives when the key set
  * outgrows both an IN-list and a broadcast.
  */
object BloomSketch {

  /** (bits, k) for expected n keys at target false-positive rate p;
    * bits rounds up to a multiple of 64. The array-backed sketch tops
    * out just below 2³¹ bits (~256 MB); a key count that wants more is
    * CAPPED, and the cap is LOUD — the effective false-positive rate
    * is computed and logged (it can be orders of magnitude above the
    * requested p in the billion-key regime), so an operator never
    * ships a quietly-useless filter. Callers that must hold p at that
    * scale should partition the key space and build per-partition
    * sketches instead.
    */
  def sizing(n: Long, p: Double): (Int, Int) = {
    require(n > 0 && p > 0 && p < 1, s"bloom sizing: n=$n, p=$p")
    val ln2 = math.log(2.0)
    val bits0 = math.ceil(-n * math.log(p) / (ln2 * ln2)).toLong
    // cap below Int.MaxValue at a multiple of 64 — (1L<<31) itself
    // overflows .toInt to a NEGATIVE count exactly in the billion-key
    // regime the cap exists for
    val cap = (1L << 31) - 64
    val wanted = ((bits0 + 63) / 64) * 64
    val bits = math.min(wanted, cap).toInt
    val k = math.max(1, math.round((bits.toDouble / n) * ln2).toInt)
    if (wanted > cap) {
      val pEff = effectiveFpp(n, bits, k)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"bloom sizing: $n%,d keys at p=$p want $wanted%,d bits; " +
          f"capped at $cap%,d — effective false-positive rate " +
          f"$pEff%.4g (requested $p). Partition the key space for " +
          "per-partition sketches if the target rate must hold.")
    }
    (bits, k)
  }

  /** Expected false-positive rate of a (bits, k) sketch holding n
    * keys: (1 − e^(−kn/bits))^k — what [[sizing]]'s cap actually
    * delivers.
    */
  def effectiveFpp(n: Long, bits: Int, k: Int): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / bits.toDouble), k)

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def alloc(numBits: Int): Array[Long] = {
    require(numBits > 0 && numBits % 64 == 0,
      s"bloom bits must be a positive multiple of 64, got $numBits")
    new Array[Long](numBits / 64)
  }

  @inline private def setBit(bits: Array[Long], idx: Long): Unit =
    bits((idx >>> 6).toInt) |= (1L << (idx & 63))

  @inline private def getBit(bits: Array[Long], idx: Long): Boolean =
    (bits((idx >>> 6).toInt) & (1L << (idx & 63))) != 0

  def add(bits: Array[Long], key: Long, k: Int): Unit = {
    val numBits = bits.length.toLong * 64
    val h1 = mix(key)
    // force h2 odd: coprime to the power-of-two-free modulus walk, so
    // the k probe positions never collapse onto one bit
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      setBit(bits, java.lang.Long.remainderUnsigned(h1 + i * h2, numBits))
      i += 1
    }
  }

  /** Shared eval/codegen kernel (static forwarder — generated code
    * calls it directly, so both paths are literally one function).
    */
  def mightContain(bits: Array[Long], key: Long, k: Int): Boolean = {
    val numBits = bits.length.toLong * 64
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      if (!getBit(bits,
          java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)))
        return false
      i += 1
    }
    true
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // two sketches are mergeable only at identical geometry — the
    // probe positions are taken modulo numBits, so OR-ing
    // differently-sized bitsets silently DROPS the longer side's
    // extra words (lost keys = false negatives, the one guarantee a
    // bloom filter must never break) or crashes on the shorter one
    require(a.length == b.length,
      s"bloom merge: bitset sizes differ (${a.length * 64} vs " +
        s"${b.length * 64} bits) — sketches must be built with the " +
        "same numBits to merge")
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}

/** `bloom_might_contain(key, bits, k)` as a native expression: the bitset
  * rides along as a task-shared reference object (like the PQ
  * codebooks), NOT as a per-row array literal, and the probe stays
  * inside whole-stage codegen. NULL key → NULL (which a WHERE treats as
  * drop — a NULL key cannot equi-join anyway).
  */
case class BloomMightContain(child: Expression, bits: Seq[Long],
    numHashes: Int) extends UnaryExpression {
  // Seq, not Array: expression equality/canonicalization must be
  // structural (an Array field compares by reference, which would
  // defeat subexpression elimination and plan equality) — same
  // convention as PqAssign's codebook.
  require(bits.nonEmpty && numHashes >= 1,
    s"bloom_might_contain: empty bitset or k=$numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  private lazy val bitsArr: Array[Long] = bits.toArray

  // The bitset is data, not structure: default case-class rendering
  // would inline thousands of longs into every plan string (and trip
  // plan-string truncation).
  override def toString: String =
    s"bloom_might_contain($child, bits[${bits.length * 64}], k=$numHashes)"
  override def sql: String =
    s"bloom_might_contain(${child.sql}, bits[${bits.length * 64}], " +
      s"k=$numHashes)"

  // Equality/hashing go through a 128-bit content digest, not the Seq:
  // plan canonicalization and expression-set bookkeeping call
  // equals/hashCode repeatedly during analysis, and traversing a
  // 10⁸-key sketch's ~15M boxed elements per comparison would stall
  // the driver for seconds per plan transform. An md5 collision
  // (~2⁻¹²⁸) is negligible against the fp rate the sketch itself
  // carries by design.
  private lazy val bitsDigest: java.math.BigInteger = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    new java.math.BigInteger(1,
      java.security.MessageDigest.getInstance("MD5").digest(bb.array()))
  }
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContain =>
      numHashes == o.numHashes && bits.length == o.bits.length &&
        bitsDigest == o.bitsDigest && child == o.child
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[BloomMightContain], child,
      Integer.valueOf(numHashes), bitsDigest)

  override protected def nullSafeEval(key: Any): Any =
    BloomSketch.mightContain(bitsArr, key.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val bk = ctx.addReferenceObj("bloomBits", bitsArr, "long[]")
      s"${ev.value} = graft.functions.BloomSketch" +
        s".mightContain($bk, $key, $numHashes);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** Distributed bloom build as a typed Aggregator: buffer = the bitset,
  * reduce = set k bits, merge = bitwise OR (map-side combinable — each
  * partition ships one `numBits/8`-byte array to the shuffle, never the
  * keys).
  */
final class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = BloomSketch.alloc(numBits)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    BloomSketch.add(buf, key, numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BloomSketch.merge(a, b)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BloomAgg {
  /** Column function: `bloom(keyCol)` usable inside agg. */
  def apply(numBits: Int, numHashes: Int): Column => Column = {
    val f = udaf(new BloomAgg(numBits, numHashes))
    (c: Column) => f(c)
  }
}

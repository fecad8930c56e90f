package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared JVM helpers for the native text expressions — called from
  * BOTH interpreted eval and generated code, so the two paths cannot
  * drift. Character semantics are code points, matching Spark's
  * `substring`/`length`/`ascii` on UTF8String (a supplementary
  * character is ONE character).
  */
object TextExprOps {

  /** Number of DISTINCT n-character substrings — the native equivalent
    * of `array_distinct(transform(sequence(...), i -> substring(text,
    * i, n)))` sized, without materializing the gram array or running
    * an interpreted lambda per gram: one pass, one hash set.
    */
  def distinctNgrams(text: UTF8String, n: Int): Long = {
    // ASCII fast path (byte count == char count, gram fits a long):
    // pack each n-byte gram into a long, sort, count unique — zero
    // per-gram allocation (a String + HashSet node per gram made the
    // generic path allocation-bound at ~0.9 M rows/s in ScaleProbe)
    if (n <= 8 && text.numBytes() == text.numChars()) {
      val b = text.getBytes
      val m = b.length - n + 1
      if (m <= 0) return 0L
      val packed = new Array[Long](m)
      var i = 0
      while (i < m) {
        var v = 0L
        var j = 0
        while (j < n) { v = (v << 8) | (b(i + j) & 0xFFL); j += 1 }
        packed(i) = v
        i += 1
      }
      java.util.Arrays.sort(packed)
      var distinct = 1L
      i = 1
      while (i < m) {
        if (packed(i) != packed(i - 1)) distinct += 1
        i += 1
      }
      return distinct
    }
    val s = text.toString
    val set = new java.util.HashSet[String]()
    if (s.length == text.numChars()) {
      // no supplementary chars: UTF-16 index == character index
      var i = 0
      while (i + n <= s.length) {
        set.add(s.substring(i, i + n))
        i += 1
      }
    } else {
      // code-point stepping: offsets(k) = UTF-16 index of character k
      val cps = s.codePointCount(0, s.length)
      val offs = new Array[Int](cps + 1)
      var i = 0
      var k = 0
      while (k < cps) {
        offs(k) = i
        i += Character.charCount(s.codePointAt(i))
        k += 1
      }
      offs(cps) = s.length
      k = 0
      while (k + n <= cps) {
        set.add(s.substring(offs(k), offs(k + n)))
        k += 1
      }
    }
    set.size.toLong
  }

  /** Rabin–Karp rolling hash, base 31 mod 1e9+7, folded over the
    * CHARACTERS' code points in order — the native equivalent of
    * `aggregate(transform(sequence(1, greatest(length, 1)), i ->
    * ascii(substring(text, i, 1))), 0L, (h, c) -> pmod(h*31 + c, p))`.
    * Empty text folds the single clamped index over ascii('') = 0,
    * i.e. 0 — preserved here.
    */
  def rollingHash(text: UTF8String): Long = {
    val s = text.toString
    if (s.isEmpty) return 0L
    val P = 1000000007L
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Second half of [[TextExprOps]]: word-shingle hashing. */
object ShingleOps {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `hash15` of raw UTF-8 bytes: the numeric value of the first 15
    * hex chars of md5 = the digest's first 60 bits =
    * bigEndian(first 8 bytes) >>> 4. Matches
    * `conv(substring(md5(x), 1, 15), 16, 10)` exactly.
    */
  def hash15(bytes: Array[Byte]): Long = {
    val d = md5Local.get().digest(bytes)
    val packed =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    packed >>> 4
  }

  /** hash15 of every word n-shingle (n consecutive tokens joined by a
    * single space), optionally reduced mod `mod` (mod <= 0: none).
    * Equals `transform(shinglesFromTokens(toks, n), sh ->
    * hash15(sh) [% mod])` — one JVM pass, no interpreted lambda, no
    * intermediate shingle strings (token bytes are concatenated with
    * 0x20 directly; UTF-8 concatenation of tokens + spaces IS the
    * UTF-8 of the joined string). Empty array when fewer than n
    * tokens, mirroring the slice-clamped composed form. A NULL token
    * element contributes like concat_ws (null SKIPPED: that engine
    * quirk is why short-doc exclusion exists upstream) — tokens from
    * `split` are never null in practice, but the semantics match.
    */
  def shingleHashes(toks: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, mod: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val total = toks.numElements()
    val m = total - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val tokBytes = new Array[Array[Byte]](total)
    var i = 0
    while (i < total) {
      tokBytes(i) =
        if (toks.isNullAt(i)) null
        else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](m)
    var k = 0
    while (k < m) {
      // concat_ws semantics: null tokens are skipped, separators only
      // between PRESENT tokens
      var len = 0
      var present = 0
      var j = 0
      while (j < n) {
        val tb = tokBytes(k + j)
        if (tb != null) { len += tb.length; present += 1 }
        j += 1
      }
      if (present > 1) len += present - 1
      val buf = new Array[Byte](len)
      var pos = 0
      var first = true
      j = 0
      while (j < n) {
        val tb = tokBytes(k + j)
        if (tb != null) {
          if (!first) { buf(pos) = ' '; pos += 1 }
          System.arraycopy(tb, 0, buf, pos, tb.length)
          pos += tb.length
          first = false
        }
        j += 1
      }
      val h = hash15(buf)
      out(k) = if (mod > 0) h % mod else h
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `ngram_distinct_count(text, n)` — distinct character-n-gram count.
  *
  * Why native: the composed form runs an interpreted lambda per gram
  * slot (HOFs don't compile) AND materializes the full gram array just
  * to `array_distinct` + `size` it. This is the per-document kernel of
  * the trigram profile (t5), so it runs once per corpus row at 100 TB.
  * One pass, one hash set, no array, identical value (shared helper
  * with eval; spec'd against the composed form including unicode and
  * supplementary-character inputs).
  */
case class NgramDistinctCount(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "ngram_distinct_count: n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_distinct_count expects a string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_distinct_count"

  override protected def nullSafeEval(t: Any): Any =
    TextExprOps.distinctNgrams(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextExprOps.distinctNgrams($t, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramDistinctCount = copy(child = newChild)
}

/** `shingle_hashes(toks, n, mod)` — hash15 of every word n-shingle of
  * a token array, optionally mod-reduced. Why native: this is the
  * kernel of the whole minhash family (base hashes for d2/d3/d4/d7/d8
  * signatures, token hashes for d6/d9 simhash, gram hashes for t10) —
  * the composed `transform(shingles, sh -> hash15(sh) % p)` runs the
  * md5 pipeline as an interpreted lambda per shingle, the most per-row
  * work left after the t4/t5 kernels. One JVM pass; values identical
  * (shared hash15 helper spec'd against the SQL md5/conv form,
  * including concat_ws null-skipping and the empty-below-n clamp).
  */
case class ShingleHashes(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  require(n >= 1, "shingle_hashes: n >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    ShingleOps.shingleHashes(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, mod)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.ShingleOps.shingleHashes($t, $n, ${mod}L)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** JVM kernel for [[RedactPii]] — shared by eval and codegen. */
object RedactOps {

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  // [A-Za-z0-9._%+-] — the email pattern's local-part class
  private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  // [A-Za-z0-9.-] — the domain class
  private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  private val EMAIL = "<EMAIL>".getBytes
  private val NUM = "<NUM>".getBytes

  /** One byte-level pass producing (redacted, n_emails, n_nums) —
    * exactly the two-regex composition
    * `regexp_replace(regexp_replace(text, EMAIL_RE, '<EMAIL>'),
    * '[0-9]+', '<NUM>')` with the placeholder insertions counted.
    * The email automaton replays Java's leftmost-first greedy
    * backtracking for `LOCAL+@DOMAIN+\.[A-Za-z]{2,}` deterministically:
    * at a maximal local-class run followed by '@', take the maximal
    * domain-class run, pick the LAST '.' (with ≥1 domain char before
    * it) followed by ≥2 letters, and extend the TLD greedily — the
    * backtracking order a regex engine walks, without walking it.
    * A failed '@' cannot match from any later start inside the same
    * local run (the run boundary is fixed), so the scan resumes with
    * plain digit-run redaction — also what the engine's advancing
    * start positions conclude. All class bytes are ASCII, so UTF-8
    * continuation bytes (≥ 0x80) pass through verbatim and multi-byte
    * characters are never split. Property-spec'd against the composed
    * regex form on adversarial inputs.
    */
  def redactPii(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = text.getBytes
    val n = b.length
    // worst-case growth: a 1-byte digit run becomes the 5-byte <NUM>
    // (5×), and the shortest email (6 bytes, "a@b.cc") becomes the
    // 7-byte <EMAIL> (7/6×) — so 5n + 8 bounds the output. Guarded:
    // past ~(2^31)/5 input bytes the bound itself overflows Int, and
    // the true output could exceed the byte-array/UTF8String limit —
    // fail with a size error, not a NegativeArraySizeException.
    require(n <= (Int.MaxValue - 8) / 5,
      s"redact_pii: input of $n bytes could exceed the 2 GB string " +
        "limit after redaction")
    val out = new Array[Byte](5 * n + 8)
    var o = 0
    var nEmails = 0L
    var nNums = 0L

    def emitToken(tok: Array[Byte]): Unit = {
      System.arraycopy(tok, 0, out, o, tok.length)
      o += tok.length
    }
    // copy [from, to) replacing maximal digit runs with <NUM>
    def emitPlain(from: Int, to: Int): Unit = {
      var p = from
      while (p < to) {
        if (isDigit(b(p))) {
          while (p < to && isDigit(b(p))) p += 1
          emitToken(NUM); nNums += 1
        } else {
          out(o) = b(p); o += 1; p += 1
        }
      }
    }

    var i = 0
    while (i < n) {
      val c = b(i)
      if (isLocal(c)) {
        var j = i
        while (j < n && isLocal(b(j))) j += 1
        var matched = false
        if (j < n && b(j) == '@') {
          var k = j + 1
          while (k < n && isDomain(b(k))) k += 1
          // last '.' with a non-empty domain prefix and >= 2 letters
          // following (letters ⊆ domain class, so they sit inside the
          // run; bounds-check against n is still required)
          var q = k - 1
          var found = -1
          while (found < 0 && q >= j + 2) {
            if (b(q) == '.' && q + 2 < n && isAlpha(b(q + 1)) &&
                isAlpha(b(q + 2))) found = q
            q -= 1
          }
          if (found >= 0) {
            var e = found + 3
            while (e < n && isAlpha(b(e))) e += 1
            emitToken(EMAIL); nEmails += 1
            i = e
            matched = true
          }
        }
        if (!matched) { emitPlain(i, j); i = j }
      } else {
        out(o) = c; o += 1; i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromBytes(java.util.Arrays.copyOf(out, o)),
        nEmails, nNums))
  }
}

/** `redact_pii(text)` →
  * struct(redacted string, n_emails bigint, n_nums bigint) — the t8
  * redaction kernel. Why native: the composed form runs TWO java.regex
  * passes over every document (email then digit-run), each with
  * per-match StringBuilder churn; this is one allocation-light byte
  * pass that also yields the redaction counts the query re-derived
  * from the redacted text. Values identical to the composed regex form
  * (property-spec'd, oracle-gated).
  */
case class RedactPii(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"redact_pii expects a string, got ${t.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("redacted", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_emails", LongType,
        nullable = false),
      org.apache.spark.sql.types.StructField("n_nums", LongType,
        nullable = false)))
  override def prettyName: String = "redact_pii"

  override protected def nullSafeEval(t: Any): Any =
    RedactOps.redactPii(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.RedactOps.redactPii($t)")

  override protected def withNewChildInternal(
      newChild: Expression): RedactPii = copy(child = newChild)
}

/** `rolling_hash(text)` — Rabin–Karp content fingerprint (t4). Why
  * native: the composed `aggregate` fold evaluates an interpreted
  * lambda per CHARACTER (substring + ascii + pmod each as interpreted
  * expressions), the most per-row work of any scalar in the text
  * inventory. One primitive loop, identical value (shared helper,
  * spec'd against the fold).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(t: Any): Any =
    TextExprOps.rollingHash(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextExprOps.rollingHash($t)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash = copy(child = newChild)
}

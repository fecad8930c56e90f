package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication primitives for training-data pipelines: exact
  * content-hash dedup, MinHash signatures + banded LSH candidate
  * generation, SimHash, and n-gram Jaccard similarity.
  *
  * Scale design (100 TB): every step before the LSH bucket join is a
  * per-row codegen'd projection (no UDFs, no shuffle). The only shuffles
  * are (a) the groupBy on the 60-bit content hash for exact dedup —
  * which AQE handles like any high-cardinality aggregation — and (b) the
  * band-bucket self-join, whose key (bandId, bucketHash) is exactly the
  * LSH guarantee that bucket sizes stay tiny, so the join explodes only
  * genuinely-similar groups. Pairwise Jaccard is reserved for candidate
  * verification, never run all-pairs.
  */
object DedupOps {

  /** Exact dedup groups: one row per distinct normalized content hash
    * with the survivor id (min), duplicate count. Survivor choice is
    * deterministic.
    */
  def exactDupGroups(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    df.select(col(idCol),
        TextOps.hash15(TextOps.normalize(col(textCol))).as("content_fp"))
      .groupBy(col("content_fp"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** MinHash universal-hash family: h_i(x) = (a_i·x + b_i) mod P over a
    * base hash reduced mod P. One md5 per shingle total — the k
    * independent functions are integer mixes of the shared base hash,
    * not k separate cryptographic passes (4-10× cheaper at scale, same
    * MinHash guarantees). Constants are small enough that a·x stays
    * below 2^62 (no ANSI overflow).
    */
  val MinHashP = 2147483647L
  def minHashA(i: Int): Long = 4097L * i + 1
  def minHashB(i: Int): Long = 7919L * i + 3

  /** MinHash signature: k universal hashes minimized over the document's
    * word 3-shingles. Adds columns mh0..mh{k-1}.
    */
  def withMinHash(df: DataFrame, textCol: String, k: Int): DataFrame = {
    // Stage each intermediate as a real column: tokens → shingles →
    // base hashes. Expressions nested inside HOF lambdas get no CSE,
    // so an unstaged pipeline re-splits the text per shingle index.
    val staged = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("__bh",
        transform(TextOps.shinglesFromTokens(col("__toks"), 3),
          sh => TextOps.hash15(sh) % MinHashP))
    val out = (0 until k).foldLeft(staged) { (acc, i) =>
      acc.withColumn(s"mh$i",
        array_min(transform(col("__bh"),
          h => (lit(minHashA(i)) * h + lit(minHashB(i))) % MinHashP)))
    }
    out.drop("__toks", "__bh")
  }

  /** Banded LSH over a MinHash signature: bands of `rowsPerBand`
    * signature components are hashed to a bucket id. Two docs are
    * candidates iff they share (band, bucket) for any band.
    * Returns (idCol, band, bucket) in long form — the natural shuffle
    * key for the candidate join.
    *
    * Documents too short to produce any shingle have all-NULL signature
    * components and are excluded: `concat_ws` SKIPS nulls, so without
    * the filter every short doc would collapse into the hash("") bucket
    * and the candidate join would go quadratic on that one bucket at
    * scale — while a NULL-propagating engine (the oracle's `||`) never
    * joins them at all. Shingle-less docs are not LSH-bucketable; exact
    * dedup (d1) still covers them.
    */
  def lshBuckets(sig: DataFrame, idCol: String, k: Int,
      rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).cast("long").as("band"),
        TextOps.hash15(concat_ws(",", cols: _*)).as("bucket"))
    }
    sig.filter((0 until k).map(i => col(s"mh$i").isNotNull).reduce(_ && _))
      .select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs from LSH buckets: ids sharing any (band, bucket),
    * deduplicated across bands, ordered a < b.
    */
  def lshCandidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val a = buckets.select(col(idCol).as("a"), col("band"), col("bucket"))
    val b = buckets.select(col(idCol).as("b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** SimHash over whitespace tokens, `bits` wide (production would use
    * 64; oracle-checked tests use 16 to keep the generated expression
    * small). Bit j of the result is set iff the majority of token hashes
    * have bit j set.
    */
  def simHash(textCol: String, bits: Int): Column = {
    val ths = s"transform(split(trim($textCol), '\\\\s+'), t -> " +
      s"cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    val terms = (0 until bits).map { j =>
      s"(CASE WHEN 2 * size(filter($ths, h -> shiftright(h, $j) % 2 = 1))" +
        s" > size($ths) THEN ${1L << j}L ELSE 0L END)"
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  /** n-gram Jaccard similarity between two prepared distinct n-gram set
    * columns: |A∩B| / |A∪B|.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(a) + size(b) - size(array_intersect(a, b))
    inter / union.cast("double")
  }
}

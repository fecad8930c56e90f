package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity-search primitives over an
  * embedding column (`array<float>`).
  *
  * Scale design (100 TB corpus):
  *  - The query set is small and broadcast; the corpus is scanned once
  *    (brute-force baseline = one codegen'd projection per candidate
  *    pair, no shuffle of the corpus itself).
  *  - The bucketed variant prunes candidates by an LSH sign-code before
  *    any distance math; the bucket id is the equi-join key, so the
  *    candidate join is a plain shuffle/broadcast hash join and each
  *    bucket's pair explosion is bounded.
  *  - Top-k uses `row_number` over (rounded sim desc, id asc): rounding
  *    before ranking makes the ordering reproducible across engines and
  *    runs; the id tiebreak makes it total.
  *
  * All arithmetic is cast to double and folded sequentially
  * (`aggregate`) so results are deterministic and engine-portable.
  */
object SimilarityOps {

  /** Sequential dot product of two float-array columns, in double —
    * the native codegen'd [[graft.functions.FloatVecDot]] (`vec_dot`),
    * registered by GraftExtensions. Identical semantics (double
    * accumulation in index order) to the HOF fold it replaced, but it
    * compiles into whole-stage codegen instead of per-element lambda
    * interpretation.
    */
  def dotSql(a: String, b: String): String = s"vec_dot($a, $b)"

  /** L2 norm of a float-array column, in double. */
  def normSql(a: String): String = s"sqrt(vec_dot($a, $a))"

  /** Cosine similarity between two float-array columns. For pairwise
    * work prefer [[withNorm]] + [[pairCosine]]: norms are per-vector,
    * so computing them inside an n×m pair join repeats each one m (and
    * n) times — precomputing them once per side removes two thirds of
    * the pair-level arithmetic.
    */
  def cosine(a: String, b: String): Column =
    expr(s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})")

  /** Precompute a vector column's L2 norm once, before a pair join. */
  def withNorm(df: org.apache.spark.sql.DataFrame, vec: String,
      out: String): org.apache.spark.sql.DataFrame =
    df.withColumn(out, expr(normSql(vec)))

  /** Pair-level cosine from the dot product and precomputed norms.
    * Identical value to [[cosine]] (same expression shape: dot divided
    * by norm product).
    */
  def pairCosine(a: String, b: String, normA: String,
      normB: String): Column =
    expr(s"${dotSql(a, b)} / ($normA * $normB)")

  /** Random-hyperplane-style LSH sign code from the first `bits`
    * components: bit j set iff component j+1 > 0. Axis-aligned
    * hyperplanes keep the code engine-portable; production would rotate
    * by a seeded random matrix first.
    */
  def signBucket(vec: String, bits: Int): Column =
    expr((0 until bits)
      .map(j => s"(CASE WHEN element_at($vec, ${j + 1}) > 0" +
        s" THEN ${1L << j} ELSE 0 END)")
      .mkString("CAST((", " + ", ") AS BIGINT)"))
}

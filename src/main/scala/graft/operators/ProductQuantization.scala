package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression + fast asymmetric
  * distance (ADC) — the storage/compute scale path past int8: a 64-dim
  * float vector (256 bytes) becomes `subspaces` code bytes (8 here,
  * 32× compression) against per-subspace codebooks, and query-time
  * distance is `subspaces` table lookups instead of 64 multiply-adds.
  *
  * Training follows the same determinism scheme as the IVF quantizer
  * (SimilarityQueries s4): seeded initialization (first k distinct
  * vectors' slices) and Lloyd steps whose per-cell means come from
  * EXACT integer-scaled component sums — partition-order independent,
  * reproducible across runs. Codebooks are tiny (subspaces × k × dim
  * floats) and live on the driver / in literals; all per-row work
  * (encode, ADC) is codegen'd expressions over the vector column — no
  * UDFs, no shuffle beyond what the caller does.
  *
  * Spec-gated (`ProductQuantizationSpec`): mirroring 8 subspaces × k
  * centroids × Lloyd steps in oracle SQL adds a giant flake surface for
  * no gate value; determinism, compression, reconstruction-error and
  * recall properties are asserted instead.
  */
object ProductQuantization {

  /** codebooks(subspace)(centroid)(component) */
  type Codebooks = Array[Array[Array[Double]]]

  /** 1-based slice of the sub-vector for subspace j. */
  private def subVec(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Argmin centroid id for one subspace — the native
    * [[graft.functions.PqAssign]] expression (min squared L2, lowest
    * id on ties). The composed form (array_min over k structs of
    * unrolled distance chains) generated O(k·subDim) Java per use;
    * with `subspaces` uses in the encode projection the single
    * generated method crossed janino's hard 64 KB limit and Spark
    * disabled whole-stage codegen for the entire projection —
    * interpreted eval on the per-row hot path. The native expression
    * compiles to a constant-size nested loop over a referenced
    * codebook, keeping encode inside whole-stage codegen at any
    * codebook size.
    */
  private def assignCode(vec: Column, off: Int,
      cents: Array[Array[Double]]): Column =
    call_function("pq_assign", vec, typedLit(cents.flatten.toSeq),
      lit(off), lit(cents.head.length))

  /** Train per-subspace codebooks: seeded init from the first k
    * DISTINCT vectors (ordered by `idCol` — duplicate vectors among
    * the seeds would create identical centroids, and the lowest-code
    * assignment tiebreak then starves the higher twin FOREVER: it
    * never receives rows, never moves, and the effective codebook is
    * silently k-1; duplicates are routine in pre-dedup corpora).
    * Distinctness is resolved over a bounded 16k-row id prefix
    * (driver-side, k×16 vectors — seeds stay O(k), never a corpus
    * aggregation), then `steps` Lloyd iterations with integer-exact
    * means (floor(x*1e6+0.5) sums). Only the k×dim centroid tables
    * are collected to the driver; assignments and sums are
    * distributed aggregations.
    */
  def train(df: DataFrame, vecCol: String, idCol: String, subspaces: Int,
      subDim: Int, k: Int, steps: Int = 1): Codebooks = {
    val seedRows = df.orderBy(col(idCol)).limit(k * 16)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      .distinctBy(_.toSeq).take(k)
    require(seedRows.length == k,
      s"need >= $k DISTINCT vectors among the first ${k * 16} rows " +
        "to seed (duplicate seed vectors would dead-lock identical " +
        "centroids)")
    val books: Codebooks = Array.tabulate(subspaces)(j =>
      seedRows.map(_.slice(j * subDim, (j + 1) * subDim)))
    // ONE Spark job AND one input scan per Lloyd step for ALL
    // subspaces: every row explodes (inline) into its `subspaces`
    // (j, sv, code) rows in a single pass, and the shared groupBy
    // aggregates on (subspace, code). The previous union-of-branches
    // form was one JOB but `subspaces` independent SCANS of the
    // input per step — 8x the read at the default geometry, with the
    // input's lineage (norms, filters) recomputed per branch. The
    // aggregation input multiset is identical either way, and the
    // integer-scaled sums make the resulting means independent of
    // job structure and partition order — bit-equal codebooks.
    for (_ <- 1 to steps) {
      val perSub = df.select(inline(array((0 until subspaces).map(j =>
        struct(lit(j).as("j"),
          subVec(col(vecCol), j, subDim).as("sv"),
          assignCode(col(vecCol), j * subDim, books(j)).as("code"))
      ): _*)))
      val sums = count(lit(1)).as("cnt") +: (1 to subDim).map(i =>
        sum(floor(element_at(col("sv"), i).cast("double") * lit(1e6)
          + lit(0.5)).cast("long")).as(s"s$i"))
      val rows = perSub.groupBy(col("j"), col("code"))
        .agg(sums.head, sums.tail: _*).collect()
      // a NULL code group means some vector was shorter than
      // subspaces*subDim (pq_assign's mismatched-shape NULL) — fail
      // with the cause instead of the bare NPE getInt would throw
      require(rows.forall(r => !r.isNullAt(1)),
        s"ProductQuantization.train: some `$vecCol` vectors are " +
          s"shorter than ${subspaces * subDim} components (NULL " +
          "assignment) — filter or fix degenerate vectors upstream")
      val byCell = rows.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      for (j <- 0 until subspaces; c <- 0 until k)
        byCell.get((j, c)).foreach { r =>
          val n = r.getLong(2).toDouble
          books(j)(c) = (1 to subDim)
            .map(i => r.getLong(2 + i).toDouble / n / 1e6).toArray
        }
    }
    books
  }

  /** Encode: adds `outCol` = array<int> of `subspaces` code ids. */
  def encode(df: DataFrame, vecCol: String, books: Codebooks,
      subDim: Int, outCol: String): DataFrame =
    df.withColumn(outCol, array(books.toIndexedSeq.zipWithIndex.map { case (cents, j) =>
      assignCode(col(vecCol), j * subDim, cents)
    }: _*))

  /** Decode a code array back to the (approximate) vector — centroid
    * slices concatenated; used for reconstruction-error measurement.
    */
  def decodeExpr(codeCol: Column, books: Codebooks): Column =
    concat(books.toIndexedSeq.zipWithIndex.map { case (cents, j) =>
      // element_at over a literal k×subDim table indexed by the code
      element_at(
        array(cents.toIndexedSeq.map(c =>
          array(c.toIndexedSeq.map(lit): _*)): _*),
        element_at(codeCol, j + 1) + 1)
    }: _*)

  /** ADC as a two-COLUMN expression — the serving shape: the query
    * vector is an ordinary `array<float>` column (from a broadcast
    * query table), so ONE plan serves any query-batch size, vs
    * [[adcDistance]]'s per-query literal tables which force one union
    * branch per query vector. Backed by the native codegen'd
    * [[graft.functions.PqAdc]]; identical fp semantics (per-subspace
    * left fold of (q-c)^2, subspace partials summed in order).
    * Computes the full dim-component distance per PAIR — for batch
    * serving prefer [[adcTablesCol]] + [[adcLookupCol]], which is
    * bit-equal at `subspaces` loads per pair instead of `dim`
    * multiply-adds (measured 39.6 → 11.6 s on a 1000-query × 2M-row
    * batch in ScaleProbe).
    */
  def adcDistCol(codeCol: Column, qvecCol: Column, books: Codebooks,
      subDim: Int): Column =
    call_function("pq_adc", codeCol, qvecCol,
      typedLit(books.flatMap(_.flatMap(_.toSeq)).toSeq), lit(subDim),
      lit(books.head.length))

  /** The per-QUERY ADC lookup tables (`subspaces × k` squared
    * distances, native `pq_tables`) — stage this ONCE on the broadcast
    * query frame, then score pairs with [[adcLookupCol]]. Bit-equal to
    * [[adcDistCol]] (same per-subspace folds, same summing order).
    */
  def adcTablesCol(qvecCol: Column, books: Codebooks,
      subDim: Int): Column =
    call_function("pq_tables", qvecCol,
      typedLit(books.flatMap(_.flatMap(_.toSeq)).toSeq), lit(subDim),
      lit(books.head.length))

  /** The per-PAIR half: `subspaces` loads from the staged tables.
    * `k` (entries per codebook) is explicit — see
    * [[graft.functions.PqAdcLookup]]'s mis-inference rationale.
    */
  def adcLookupCol(codeCol: Column, tablesCol: Column, k: Int): Column =
    call_function("pq_adc_lookup", codeCol, tablesCol, lit(k))

  /** ADC: asymmetric distance from a DRIVER-side query vector to every
    * encoded row = sum over subspaces of a k-entry lookup table (the
    * precomputed distances query-subvector ↔ centroids). Kept for
    * single-query probing; batch serving should use [[adcDistCol]].
    */
  def adcDistance(codeCol: Column, query: Array[Double],
      books: Codebooks, subDim: Int): Column =
    books.zipWithIndex.map { case (cents, j) =>
      val q = query.slice(j * subDim, (j + 1) * subDim)
      val table = cents.map(c =>
        c.zip(q).map { case (ci, qi) => (qi - ci) * (qi - ci) }.sum)
      element_at(array(table.toIndexedSeq.map(lit): _*),
        element_at(codeCol, j + 1) + 1)
    }.reduce(_ + _)
}

package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.filter2.predicate.{FilterApi, Statistics, UserDefinedPredicate}
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.parquet.hadoop.util.SerializationUtil
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Set-membership parquet pushdown past Spark's or-chain stack bound.
  *
  * Spark lowers a pushed `In` to a LEFT-DEEP or-chain of parquet eq
  * predicates whose recursive visitor overflows the executor stack
  * past ~1.5k terms (measured: 1536 OK, 2048 SOE — see
  * [[graft.operators.DedupIndex.PushMaxValues]]); past its In
  * threshold it degrades to a min/max RANGE that skips nothing over
  * scattered hash values. Both alternatives for a LARGE value set
  * were prototyped and MEASURED OUT before this file settled on the
  * predicate it ships:
  *
  *  - '''parquet-mr's set-based `FilterApi.in`''' (PARQUET-1968) is
  *    stack-safe but its column-index visitor is a BOUNDING BOX —
  *    `ColumnIndexBase.visit(In)` intersects `gtEq(min(set))` with
  *    `ltEq(max(set))` — so over scattered hashes it reads every
  *    page between the set's global min and max (measured: 100
  *    values clustered in one 4M-row file read 3.86M rows — all
  *    pages up to the set max — instead of the ~205k the matching
  *    pages hold).
  *  - '''chunked or-chain scan unions''' (k scans of ≤1024 values
  *    each, unioned) stay exact but pay the footer/plan machinery
  *    per chunk: 2.4x slower than one scan at 10k values on a 128M-
  *    row store (1.13 s vs 0.47 s), worsening with store size.
  *
  * What ships instead: a [[LongSetPredicate]] —
  * `UserDefinedPredicate` carrying the SORTED value array. parquet
  * evaluates a UDP through `canDrop(Statistics)` at BOTH the
  * row-group and the column-index page level (one binary search per
  * page: any set element within the page's [min, max]?) and through
  * `keep(value)` per record on the record-filtered path — exact
  * per-value skipping, O(log set) per page, ZERO stack recursion,
  * cardinality bounded by memory and conf size alone. Spark never
  * emits UDPs, so nothing in its translation interferes; the class
  * rides the engine jar, which every executor already has.
  *
  * The predicate reaches the reader through the Hadoop conf key
  * `parquet.private.read.filter.predicate` (what
  * `ParquetInputFormat.setFilterPredicate` writes), pre-serialized
  * into the READ OPTIONS — Spark merges per-relation read options
  * into the scan's Hadoop conf. Two hazards the format subclass
  * fences (both measured before it existed):
  *
  *  - '''clobbering''': `ParquetFileFormat` overwrites the conf key
  *    with its own translation whenever catalyst pushes ANY data
  *    filter (an inner join infers `IsNotNull` on its keys, so the
  *    gates' probe scans always would). [[GraftParquetFileFormat]]
  *    passes `filters = Nil` to super when injecting, so the
  *    injected predicate is the only one — catalyst still evaluates
  *    every filter exactly above the scan (V1 keeps the Filter node;
  *    the pushed copy is advisory), so dropping Spark's push loses
  *    nothing the set predicate does not already skip.
  *  - '''column pruned out''': if the predicate's column is not in
  *    the read schema the parquet reader cannot evaluate it and
  *    returns ZERO rows (measured — not a superset, a wrong answer).
  *    The subclass injects only when `requiredSchema` carries the
  *    column, else serves a plain parquet read: a count-style plan
  *    over the frame is correct, just unpruned.
  *
  * Pruning semantics: the scan returns AT LEAST every row whose
  * column value is in the set (exact on the record-filtered path,
  * page-granular superset on the vectorized path) — callers that
  * need exactness must re-filter above the scan. The gates do not:
  * their (band, bucket) equi-join drops stragglers. Null rows are
  * dropped wherever the reader can prove them (`keep(null) = false`,
  * null-only pages skipped): push only on columns whose matching
  * rows are never null — the index artifacts' bucket columns by
  * construction.
  */
object NativeParquetIn {

  /** Read option carrying the base64-serialized FilterPredicate. */
  val PredicateKey = "graft.parquet.native.filter"

  /** Read option naming the predicate's column — the inject guard:
    * without it in the read schema the reader would return 0 rows.
    */
  val ColumnKey = "graft.parquet.native.filter.column"

  /** Ceiling on a pushed set's cardinality. NOT a stack bound (the
    * UDP has none) — a driver/conf budget: the sorted array is
    * collected to the driver, serialized into the broadcast Hadoop
    * conf (~2.5 bytes/value after gzip+base64 on close hashes, ~11
    * on scattered ones) and deserialized once per task, so the cap
    * keeps the conf payload under ~1 MB and the touched-set collect
    * driver-bounded.
    */
  val MaxValues = 65536

  /** Serialize a [[LongSetPredicate]] over `values` on `column` the
    * way the parquet reader deserializes it (gzip + base64 java
    * serialization), as read options for [[GraftParquetFileFormat]].
    */
  def inOptions(column: String,
      values: Iterable[Long]): Map[String, String] = {
    val sorted = values.toArray.distinct.sorted
    require(sorted.nonEmpty, "native set push over an empty set — " +
      "callers short-circuit an empty touched set before the scan")
    require(sorted.length <= MaxValues,
      s"native set push over ${sorted.length} values exceeds " +
        s"MaxValues=$MaxValues — fall back to the full scan")
    val pred = FilterApi.userDefined(FilterApi.longColumn(column),
      new LongSetPredicate(sorted))
    val c = new Configuration(false)
    SerializationUtil.writeObjectToConfAsBase64(
      ParquetInputFormat.FILTER_PREDICATE, pred, c)
    Map(PredicateKey -> c.get(ParquetInputFormat.FILTER_PREDICATE),
      ColumnKey -> column)
  }

  /** A partitioned-artifact read (the raw-dir or manifest-pinned
    * path-list shape) carrying the set predicate on `column`: the
    * scan returns only rows whose `column` can match `values`
    * (exact or page-superset; see object doc).
    */
  def read(s: SparkSession, basePath: String, paths: Seq[String],
      column: String, values: Iterable[Long]): DataFrame =
    s.read.format(classOf[GraftParquetFileFormat].getName)
      .option("basePath", basePath)
      .options(inOptions(column, values))
      .load(paths: _*)
}

/** Sorted-array set membership as a parquet `UserDefinedPredicate`:
  * `keep` is a binary search per record, `canDrop` a binary search
  * per row group / column-index page ("does any set element fall in
  * [min, max]?"). Serializable by the parquet conf contract; the
  * array is immutable after construction.
  */
final class LongSetPredicate(sorted: Array[Long])
    extends UserDefinedPredicate[java.lang.Long] with Serializable {

  override def keep(v: java.lang.Long): Boolean =
    v != null &&
      java.util.Arrays.binarySearch(sorted, v.longValue()) >= 0

  /** Drop a page/row group iff no set element lies in [min, max]. */
  override def canDrop(st: Statistics[java.lang.Long]): Boolean = {
    val lo = st.getMin.longValue()
    val hi = st.getMax.longValue()
    val i = java.util.Arrays.binarySearch(sorted, lo)
    if (i >= 0) false
    else {
      val ins = -i - 1
      ins >= sorted.length || sorted(ins) > hi
    }
  }

  /** For NOT(this): a page can be dropped iff EVERY row matches the
    * set — min==max and it is a member is the only provable case.
    */
  override def inverseCanDrop(st: Statistics[java.lang.Long]): Boolean = {
    val lo = st.getMin.longValue()
    val hi = st.getMax.longValue()
    lo == hi && java.util.Arrays.binarySearch(sorted, lo) >= 0
  }
}

/** ParquetFileFormat that injects a pre-serialized native parquet
  * FilterPredicate from the read options — see [[NativeParquetIn]]
  * for the contract and the two hazards the override fences. Write
  * side, schema inference, vectorization: inherited unchanged.
  */
class GraftParquetFileFormat extends ParquetFileFormat {

  override def shortName(): String = "graft-parquet"

  override def toString: String = "GraftParquet"

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val b64 = options.get(NativeParquetIn.PredicateKey)
    val injectable = b64.isDefined &&
      options.get(NativeParquetIn.ColumnKey)
        .exists(c => requiredSchema.fieldNames.contains(c))
    if (injectable) {
      hadoopConf.set(ParquetInputFormat.FILTER_PREDICATE, b64.get)
      // filters = Nil: super must not see a pushable filter, or it
      // overwrites the injected predicate with its own (stack-bound)
      // translation; catalyst evaluates `filters` above the scan
      // regardless, so correctness is untouched
      super.buildReaderWithPartitionValues(sparkSession, dataSchema,
        partitionSchema, requiredSchema, Nil, options, hadoopConf)
    } else
      super.buildReaderWithPartitionValues(sparkSession, dataSchema,
        partitionSchema, requiredSchema, filters, options, hadoopConf)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession construction for the engine's entry points
  * (Verify, Bench, tests). Centralizes the settings every session needs:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` — earlier driver data
  *    generations stored `events.ts` as TIMESTAMP(NANOS), which Spark
  *    reads only as a raw long under this flag (see [[Tables.events]],
  *    which normalizes whatever encoding the current generation uses).
  *    Kept so the loaders stay generation-agnostic; set once here so no
  *    DataFrame builder ever mutates session config as a side effect.
  *  - UTC session zone — the data model's timestamps are naive wall-clock
  *    values (SURVEY.md §1.3); pinning UTC keeps them stable.
  *  - shuffle partitions sized to the local core count rather than the
  *    200 default — on a real cluster this would instead be set to
  *    ~2-3× total executor cores (or left to AQE coalescing, which stays
  *    enabled).
  */
object Sessions {
  def builder(appName: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // native engine functions (vec_dot) — see graft.functions
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // keep managed-table data (bucketed tables) out of the repo dir
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      // don't truncate PushedFilters/ReadSchema in explain output —
      // plan-shape tests assert on them
      .config("spark.sql.maxMetadataStringLength", "500")
      // push genuine In predicates to parquet instead of the default
      // >10-values min/max-range rewrite: the ingest gates push a
      // batch's touched-bucket / candidate-id set into the stored
      // scan, and a min/max range over scattered keys covers
      // ~everything — zero skipping. The ceiling is a measured JVM
      // limit, not taste: Spark translates the In into a LEFT-DEEP
      // or-chain of parquet eq predicates whose recursive evaluation
      // blows the executor stack past ~1.5k terms (1536 OK, 2048
      // StackOverflowError on this JVM) — 1024 leaves margin, and the
      // engine caps its own pushed sets at the same value
      // (DedupIndex.PushMaxValues).
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")

  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

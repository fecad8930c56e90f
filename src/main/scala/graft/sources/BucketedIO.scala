package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed persistence for co-located joins — the 100 TB answer to
  * repeatedly joining big tables on the same key: write both sides
  * bucketed (and sorted) by the join key, and every subsequent join on
  * that key runs with NO shuffle exchange; Spark matches bucket files
  * pairwise.
  *
  * Bucket count guidance: ~(total size / target partition size), a
  * multiple of the cluster's parallelism; it is fixed at write time, so
  * choose for the table's full-scale size, not today's.
  */
object BucketedIO {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    // repartition by the SAME hash the bucketing uses first: without
    // it every input task emits a file per bucket (T×B files at
    // scale), and Spark only propagates the sortBy ordering to the
    // scan when a bucket holds exactly ONE file — multi-file buckets
    // silently re-sort both sides of every "co-located" sort-merge
    // join, wasting the write-time sort entirely
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}

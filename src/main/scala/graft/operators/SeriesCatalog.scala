package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Odm

/** The `SeriesCatalog` denormalized view — the reference materializes a
  * per-series summary table with begin/end timestamps, value count and
  * all dim attributes (reference: src/GAMUTRawData/odmdata/series.py:
  * 48-81), recomputed after every edit save (edit_service.py:430-434).
  *
  * Here it is a DERIVED DataFrame: one aggregation over the fact keyed
  * by the 5-column series identity, then broadcast joins to the dims —
  * recomputable on demand or persisted. At 100 TB the groupBy shuffles
  * once on the series key (the natural partitioning of all per-series
  * work); the dim joins stay broadcast.
  */
object SeriesCatalog {

  /** Per-series aggregate (A5): begin/end local + UTC, value count. */
  def seriesStats(dataValues: DataFrame): DataFrame =
    dataValues
      .groupBy(Odm.SeriesKey.map(col): _*)
      .agg(
        min(col("LocalDateTime")).as("BeginDateTime"),
        max(col("LocalDateTime")).as("EndDateTime"),
        min(col("DateTimeUTC")).as("BeginDateTimeUTC"),
        max(col("DateTimeUTC")).as("EndDateTimeUTC"),
        count(lit(1)).as("ValueCount"))
      .withColumn("odm_id", Odm.odmId)

  /** Full denormalized catalog: stats + dim attributes. */
  def build(dataValues: DataFrame, sites: DataFrame, variables: DataFrame,
      methods: DataFrame, sources: DataFrame,
      qcLevels: DataFrame): DataFrame =
    seriesStats(dataValues)
      .join(broadcast(sites), Seq("SiteID"))
      .join(broadcast(variables), Seq("VariableID"))
      .join(broadcast(methods), Seq("MethodID"))
      .join(broadcast(sources), Seq("SourceID"))
      .join(broadcast(qcLevels), Seq("QualityControlLevelID"))
}

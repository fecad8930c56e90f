package graft.schema

import java.time.LocalDateTime

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ODM 1.1.1 star schema as typed case classes — field names and
  * types from the reference's own DDL and ORM declarations
  * (reference: src/GAMUTRawData/odmdata/memory_database.py:126-188,
  * data_value.py:37-57, site.py:9-33, variable.py:8-27; see
  * FIXTURES.md §A). `LocalDateTime`/`DateTimeUTC` are naive wall-clock
  * values → `java.time.LocalDateTime` ⇔ Spark `TimestampNTZType`
  * (SURVEY.md §7.5 risk 3).
  */
object Odm {

  /** Fact row (`DataValues`). */
  final case class DataValue(
      ValueID: Int,
      DataValue: Double,
      ValueAccuracy: Option[Double],
      LocalDateTime: LocalDateTime,
      UTCOffset: Double,
      DateTimeUTC: LocalDateTime,
      SiteID: Int,
      VariableID: Int,
      OffsetValue: Option[Double],
      OffsetTypeID: Option[Int],
      CensorCode: String,
      QualifierID: Option[Int],
      MethodID: Int,
      SourceID: Int,
      SampleID: Option[Int],
      DerivedFromID: Option[Int],
      QualityControlLevelID: Int)

  final case class Site(SiteID: Int, SiteCode: String, SiteName: String,
      Latitude: Double, Longitude: Double, Elevation_m: Option[Double],
      State: Option[String], County: Option[String])

  final case class Variable(VariableID: Int, VariableCode: String,
      VariableName: String, VariableUnitsID: Int, SampleMedium: String,
      TimeUnitsID: Int, DataType: String, GeneralCategory: String,
      NoDataValue: Double)

  final case class Method(MethodID: Int, MethodDescription: String)

  final case class Source(SourceID: Int, Organization: String,
      SourceDescription: String, ContactName: String, Citation: String)

  final case class QualityControlLevel(QualityControlLevelID: Int,
      Code: String, Definition: String)

  final case class Qualifier(QualifierID: Int, Code: String,
      Description: String)

  /** The 5-column series identity (reference: series.py:83-91,
    * H2OSeries.py:27-51).
    */
  val SeriesKey: Seq[String] = Seq("SiteID", "VariableID", "MethodID",
    "SourceID", "QualityControlLevelID")

  /** Surrogate string id `site_var_method_source_qc`
    * (reference: series.py:99-102).
    */
  def odmId: Column =
    concat_ws("_", SeriesKey.map(col): _*)
}

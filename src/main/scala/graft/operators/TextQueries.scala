package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object TextQueries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}

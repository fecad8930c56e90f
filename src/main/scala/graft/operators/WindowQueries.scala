package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object WindowQueries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}

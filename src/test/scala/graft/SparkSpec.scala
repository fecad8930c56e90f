package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (forked test JVM). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = Sessions.builder("graft-test", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}

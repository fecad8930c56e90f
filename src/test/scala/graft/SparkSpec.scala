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

  /** Fresh temp directory for the test body, removed recursively
    * afterwards (symlinks deleted, never followed). The one shared
    * implementation — suites delegate instead of re-pasting the
    * recursive delete.
    */
  def withTempDir[A](prefix: String)(f: String => A): A = {
    import java.nio.file.{Files, Path}
    val dir = Files.createTempDirectory(prefix)
    try f(dir.toString) finally {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p) && !Files.isSymbolicLink(p)) {
          val s = Files.list(p)
          try s.forEach(rm) finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }
}

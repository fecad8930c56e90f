package graft

import java.nio.file.{Files, Paths}

import graft.io.{LocalDirUploader, ResourceMeta, Retry}
import graft.pipeline.Publish

/** K6 upload contract (delete-then-add, via the local-filesystem fake),
  * the §3.1 pipeline including the upload leg, the F7 metadata regex
  * parsers, and the driver retry policy.
  */
class UploadRetrySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-upload").toString

  test("upload replaces files (delete-then-add), never duplicates") {
    val root = tmpDir()
    val up = new LocalDirUploader(root)
    val work = tmpDir()
    val f = Paths.get(work, "a.csv")
    Files.writeString(f, "v1\n")
    up.uploadFiles("res1", Seq(f.toString))
    assert(up.listFiles("res1") === Seq("a.csv"))
    // re-publish with new content: same name, replaced content
    Files.writeString(f, "v2\n")
    up.uploadFiles("res1", Seq(f.toString))
    assert(up.listFiles("res1") === Seq("a.csv"))
    assert(Files.readString(Paths.get(root, "res1", "a.csv")) === "v2\n")
    // delete-all clears, delete of a missing file is a no-op
    up.deleteAllFiles("res1")
    assert(up.listFiles("res1").isEmpty)
    up.deleteFile("res1", "never-existed.csv")
  }

  test("publishAndUpload runs the §3.1 pipeline through the upload leg") {
    val fact = Seq(
      (1L, ts("2024-01-01 00:00:00"), "temp", 1.5),
      (1L, ts("2024-01-01 01:00:00"), "temp", 2.5),
      (2L, ts("2024-01-01 00:00:00"), "temp", 9.0)
    ).toDF("sid", "t", "metric", "v")
    val spec = Publish.ChunkSpec(
      chunkKeys = Seq("sid"), indexCol = "t", pivotKey = "metric",
      valueCol = "v", domain = Seq("temp"), sentinel = -9999.0)
    val out = tmpDir()
    val root = tmpDir()
    val up = new LocalDirUploader(root)
    val written = Publish.publishAndUpload(spark, fact, spec, out,
      cv => Seq(s"Series: ${cv.mkString("_")}"), up, "resA")
    assert(written.size === 2)
    assert(up.listFiles("resA") === Seq("1.csv", "2.csv"))
    assert(up.isPublic("resA"))
    // uploaded file content is the finished headered csv
    val body = Files.readString(Paths.get(root, "resA", "1.csv"))
    assert(body.startsWith("# Series: 1\n"))
    // second publication replaces, does not duplicate
    Publish.publishAndUpload(spark, fact, spec, out,
      cv => Seq("unused"), up, "resA")
    assert(up.listFiles("resA") === Seq("1.csv", "2.csv"))
  }

  test("chunk file names cannot collide across distinct chunk keys") {
    // the classic aliasing cases: separator inside a value, and a
    // trailing/leading separator shifting the boundary
    val cases = Seq(
      Seq[Any]("LR_Mendon", "Temp") -> Seq[Any]("LR", "Mendon_Temp"),
      Seq[Any]("a_", "b") -> Seq[Any]("a", "_b"),
      Seq[Any]("a%5F", "b") -> Seq[Any]("a_", "b"))
    cases.foreach { case (x, y) =>
      assert(Publish.chunkFileName(x) !== Publish.chunkFileName(y),
        s"$x vs $y")
    }
    // numeric keys keep their simple names (resume paths stay stable)
    assert(Publish.chunkFileName(Seq(1L)) === "1.csv")
    assert(Publish.chunkFileName(Seq(1L, 2L)) === "1_2.csv")
  }

  test("F7 title and coverage-period parsers") {
    assert(ResourceMeta.parseTitle("Logan River GAMUT data (ID ab12cd)")
      === Some(ResourceMeta.ResourceTitle("Logan River GAMUT data", "ab12cd")))
    // lazy title match keeps inner parentheses in the title
    assert(ResourceMeta.parseTitle("Creek (upper) data (ID x9)")
      === Some(ResourceMeta.ResourceTitle("Creek (upper) data", "x9")))
    assert(ResourceMeta.parseTitle("no id here").isEmpty)
    assert(ResourceMeta.parseCoverage(
      "start=2020-01-01T00:00:00; end=2020-12-31T23:59:59; scheme=W3C")
      === Some(ResourceMeta.CoveragePeriod(
        "2020-01-01T00:00:00", "2020-12-31T23:59:59", "W3C")))
    assert(ResourceMeta.parseCoverage("start=garbage").isEmpty)
  }

  test("retry policy retries timeouts once and rethrows other failures") {
    var calls = 0
    val got = Retry.withRetry() {
      calls += 1
      if (calls == 1) throw new java.util.concurrent.TimeoutException("t")
      42
    }
    assert(got === 42 && calls === 2)
    // exhausted retries → the timeout escapes
    intercept[java.util.concurrent.TimeoutException] {
      Retry.withRetry() {
        throw new java.util.concurrent.TimeoutException("always")
      }
    }
    // non-retryable fails immediately
    var n = 0
    intercept[IllegalStateException] {
      Retry.withRetry() { n += 1; throw new IllegalStateException("no") }
    }
    assert(n === 1)
  }
}

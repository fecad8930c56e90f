package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftParquetFileFormat, LongSetPredicate, NativeParquetIn}
import org.apache.parquet.filter2.predicate.Statistics

class NativeParquetInSpec extends SparkSpec {
  import spark.implicits._

  /** Bucket-sorted single-partition store: one file, ascending
    * bucket, small pages so page-level skipping is observable.
    */
  private def writeStore(dir: String, n: Long): Unit =
    spark.range(0, n, 1, 1)
      .select(col("id").as("doc_id"), (col("id") * 3).as("bucket"))
      .sortWithinPartitions("bucket")
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "2048")
      .parquet(dir)

  test("native set push returns exactly the catalyst-filtered rows " +
      "(superset contract closed by an exact filter above)") {
    withTempDir("graft-npi") { dir =>
      writeStore(dir, 200000L)
      val vals = (0 until 3000).map(i => i.toLong * 150) // multiples of 3 exist
      val expect = spark.read.parquet(dir)
        .filter(col("bucket").isin(vals.map(Long.box): _*))
        .select("doc_id", "bucket").collect().map(_.toSeq).toSet
      val got = NativeParquetIn.read(spark, dir, Seq(dir), "bucket", vals)
        .filter(col("bucket").isin(vals.map(Long.box): _*))
        .select("doc_id", "bucket").collect().map(_.toSeq).toSet
      assert(got === expect)
      assert(got.size === vals.count(_ % 3 == 0))
    }
  }

  test("the scan output is a SUPERSET of the matching rows and " +
      "skips pages (reads a fraction of the store)") {
    withTempDir("graft-npi") { dir =>
      writeStore(dir, 1000000L)
      // 50 scattered existing values -> at most ~50 matched pages + 1
      // boundary each of ~489 total
      val vals = (0 until 50).map(i => i.toLong * 60000)
      val scanned = NativeParquetIn
        .read(spark, dir, Seq(dir), "bucket", vals)
        .agg(count("bucket")).collect()(0).getLong(0)
      assert(scanned >= vals.size.toLong,
        s"scan must keep every matching row (got $scanned)")
      assert(scanned <= 60L * 2048,
        s"page skipping absent: $scanned rows left the scan of 1M")
    }
  }

  test("predicate column pruned out of the read schema disables the " +
      "injection instead of corrupting the count") {
    withTempDir("graft-npi") { dir =>
      writeStore(dir, 100000L)
      // count() prunes every column: the parquet reader cannot
      // evaluate the predicate -> measured raw behavior is ZERO rows;
      // the guard must serve the plain (full) scan instead
      val n = NativeParquetIn
        .read(spark, dir, Seq(dir), "bucket", Seq(300L))
        .count()
      assert(n === 100000L)
    }
  }

  test("catalyst-pushed filters on top (join-inferred IsNotNull, " +
      "extra predicates) do not clobber the injection or the result") {
    withTempDir("graft-npi") { dir =>
      writeStore(dir, 200000L)
      val vals = (0 until 500).map(i => i.toLong * 900)
      val dim = vals.toDF("bucket")
      val joined = NativeParquetIn
        .read(spark, dir, Seq(dir), "bucket", vals)
        .join(broadcast(dim), "bucket")
      assert(joined.count() === vals.count(_ % 3 == 0))
      // an extra pushable predicate above the native scan still
      // evaluates exactly (catalyst keeps the Filter node)
      val extra = NativeParquetIn
        .read(spark, dir, Seq(dir), "bucket", vals)
        .filter(col("doc_id") < 1000 &&
          col("bucket").isin(vals.map(Long.box): _*))
      assert(extra.count() === vals.count(v => v / 3 < 1000))
      // a downstream query that PRUNES the predicate column reads
      // the plain store (guard) — the hint never restricts it
      val pruned = NativeParquetIn
        .read(spark, dir, Seq(dir), "bucket", vals)
        .filter(col("doc_id") < 1000)
      assert(pruned.count() === 1000L)
    }
  }

  test("partitioned artifact read: basePath keeps partition columns " +
      "and partition pruning composes with the injection") {
    withTempDir("graft-npi") { dir =>
      spark.range(0, 100000, 1, 2)
        .select(col("id").as("doc_id"), (col("id") * 3).as("bucket"),
          (col("id") % 4).as("band"), lit(0L).as("ingest"))
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "2048")
        .partitionBy("ingest", "band").parquet(dir)
      val vals = (0 until 200).map(i => i.toLong * 1500)
      val df = NativeParquetIn.read(spark, dir,
          Seq(s"$dir/ingest=0"), "bucket", vals)
        .filter(col("band") === 1)
        .filter(col("bucket").isin(vals.map(Long.box): _*))
      val expect = spark.read.parquet(dir)
        .filter(col("band") === 1)
        .filter(col("bucket").isin(vals.map(Long.box): _*))
      assert(df.select("doc_id").collect().map(_.getLong(0)).sorted
        .toSeq === expect.select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq)
      assert(df.columns.contains("band"))
    }
  }

  test("LongSetPredicate canDrop/keep semantics at the boundaries") {
    val p = new LongSetPredicate(Array(10L, 50L, 90L))
    def stats(lo: Long, hi: Long) =
      new Statistics[java.lang.Long](Long.box(lo), Long.box(hi))
    assert(p.canDrop(stats(11, 49)))      // gap between members
    assert(!p.canDrop(stats(10, 10)))     // member at both edges
    assert(!p.canDrop(stats(0, 10)))      // member at hi edge
    assert(!p.canDrop(stats(90, 200)))    // member at lo edge
    assert(p.canDrop(stats(91, 1000)))    // past the last member
    assert(p.canDrop(stats(Long.MinValue, 9)))
    assert(!p.canDrop(stats(Long.MinValue, Long.MaxValue)))
    assert(p.keep(50L) && !p.keep(51L) && !p.keep(null))
    assert(p.inverseCanDrop(stats(50, 50)))
    assert(!p.inverseCanDrop(stats(50, 51)))
    assert(!p.inverseCanDrop(stats(40, 40)))
  }

  test("inOptions refuses an empty set and a set past MaxValues") {
    intercept[IllegalArgumentException] {
      NativeParquetIn.inOptions("bucket", Nil)
    }
    intercept[IllegalArgumentException] {
      NativeParquetIn.inOptions("bucket",
        (0 to NativeParquetIn.MaxValues).map(_.toLong))
    }
  }

  test("format registers by short name") {
    assert(new GraftParquetFileFormat().shortName() === "graft-parquet")
  }
}

package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

/** The staged (crash-isolated) takedown: result-identical to the
  * in-place path, live tree untouched until the staging tree commits,
  * every crash point either leaves the artifact wholly old or is
  * adopted/discarded by recovery so a clean re-run converges.
  */
class StagedTakedownSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new HPath("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def withDir[A](f: String => A): A =
    withTempDir("graft-staged-takedown")(f)

  /** Two-generation (ingest, band) artifact; k is a bijection of
    * 0..999 within each generation, band = id % 4.
    */
  private def buildArtifact(dir: String): Unit = {
    def gen(g: Long, seed: Long) = spark.range(0, 1000)
      .select(((col("id") * seed) % 1000).as("k"),
        (col("id") % 4).as("band"), lit(g).as("ingest"))
    gen(0L, 48271L).write.mode("overwrite")
      .partitionBy("ingest", "band").parquet(dir)
    gen(1L, 69621L).write.mode("append")
      .partitionBy("ingest", "band").parquet(dir)
  }

  /** Tombstones = every k present in band 2 of either generation
    * (with these seeds k ≡ 2 mod 4 ⇔ band 2 in BOTH generations, so
    * this empties the two band-2 partitions wholesale) plus three
    * stray keys living in other bands, so the swap branch (partition
    * rewritten, not dropped) is exercised too.
    */
  private def tombsFor(dir: String): DataFrame = {
    val ks = spark.read.parquet(dir).filter(col("band") === 2)
      .select("k").as[Long].collect().toSeq
    (ks ++ Seq(1L, 5L, 9L)).distinct
      .toDF("k") // materialized — external input, not a view over dir
  }

  private def content(dir: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(dir).select("k", "band", "ingest")
      .as[(Long, Long, Long)].collect().toSeq.sorted

  test("staged takedown is result-identical to the in-place path, " +
      "emptied partitions removed") {
    withDir { root =>
      val (a, b) = (s"$root/a", s"$root/b")
      buildArtifact(a); buildArtifact(b)
      val tombs = tombsFor(a)
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k", tombs,
        staged = true)
      LayoutOps.deleteKeysPartitioned(spark, b, "band", "k", tombs)
      assert(content(a) === content(b))
      assert(content(a).nonEmpty)
      for (g <- 0 to 1) {
        assert(!fs.exists(new HPath(s"$a/ingest=$g/band=2")))
      }
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }

  test("kill before the swap phase: live tree serves exactly the " +
      "old content; the re-run converges") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val before = content(a)
      val tombs = tombsFor(a)
      // phase 1 only — simulate a kill after staging committed
      val stagedOut = LayoutOps.stageTakedown(spark, a, "band", "k",
        tombs)
      assert(stagedOut.nonEmpty)
      assert(fs.exists(new HPath(s"${a}__takedown/_STAGED")))
      assert(content(a) === before) // not a row touched
      // clean re-run completes the takedown
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k", tombs,
        staged = true)
      assert(content(a) ===
        before.filterNot(r => tombs.as[Long].collect().contains(r._1)))
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }

  test("kill mid-swap (live deleted, staged not yet renamed): " +
      "recovery adopts the staged copy and the re-run converges") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val before = content(a)
      val tombs = tombsFor(a)
      val deadKeys = tombs.as[Long].collect().toSet
      val Some((staging, affected)) =
        LayoutOps.stageTakedown(spark, a, "band", "k", tombs)
      // crash between delete(live) and rename(staged): pick an
      // affected partition that HAS a staged twin (not fully emptied)
      val (g, p) = affected.find { case (g, p) =>
        fs.exists(new HPath(s"$staging/ingest=$g/band=$p"))
      }.get
      assert(fs.delete(new HPath(s"$a/ingest=$g/band=$p"), true))
      // the staged copy is the one complete copy of that partition;
      // the next staged run recovers it, then converges
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k", tombs,
        staged = true)
      assert(content(a) === before.filterNot(r => deadKeys(r._1)))
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }

  test("a crashed staged run's pending takedown is COMPLETED by the " +
      "next mutation — never left to resurrect over later rewrites") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val before = content(a)
      // T1 stages tombstones {1, 5, 9} and "crashes" after commit
      val t1Keys = Set(1L, 5L, 9L)
      assert(LayoutOps.stageTakedown(spark, a, "band", "k",
        t1Keys.toSeq.toDF("k")).nonEmpty)
      assert(fs.exists(new HPath(s"${a}__takedown/_STAGED")))
      // T2 runs a DIFFERENT, UNSTAGED takedown of {2}. The old
      // behavior ignored the marked staging tree, so a LATER staged
      // run's recovery would adopt T1's pre-crash partition copies —
      // which still contain key 2 — over T2's rewrite, silently
      // resurrecting a row a completed takedown promised to delete.
      // Now T2 completes T1 first: afterwards neither 1/5/9 nor 2
      // exist, and no staging tree remains.
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k",
        Seq(2L).toDF("k"))
      assert(!fs.exists(new HPath(s"${a}__takedown")),
        "the pending staged takedown was left behind")
      assert(content(a) ===
        before.filterNot(r => t1Keys(r._1) || r._1 == 2L))
      // a later STAGED takedown finds nothing stale to adopt
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k",
        Seq(6L).toDF("k"), staged = true)
      assert(content(a) === before.filterNot(r =>
        t1Keys(r._1) || r._1 == 2L || r._1 == 6L))
    }
  }

  test("apply swaps EVERY staged partition, not just the affected " +
      "list — a full-rewrite staging is applied, never discarded") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val tombs = tombsFor(a)
      val deadKeys = tombs.as[Long].collect().toSet
      val before = content(a)
      val Some((staging, affected)) =
        LayoutOps.stageTakedown(spark, a, "band", "k", tombs)
      // simulate the dropped partition-predicate restriction (past the
      // planner-safe bound stageTakedown stages survivors of EVERY
      // partition): plant a staged copy of an unaffected partition
      // with a marker row the swap must carry into place
      val affectedSet = affected.toSet
      val (ug, up) = (for (g <- 0 to 1; p <- 0 to 3
          if !affectedSet((g.toString, p.toString))) yield (g, p)).head
      spark.read.parquet(s"$a/ingest=$ug/band=$up")
        .unionByName(Seq((999999L)).toDF("k"))
        .write.parquet(s"$staging/ingest=$ug/band=$up")
      LayoutOps.applyStagedTakedown(spark, a, "band", staging,
        affected)
      val got = content(a)
      assert(got.contains((999999L, up.toLong, ug.toLong)))
      assert(got.filterNot(_._1 == 999999L) ===
        before.filterNot(r => deadKeys(r._1)))
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }

  test("kill that leaves a PARTIAL live remnant: recovery adopts " +
      "the staged copy, never the remnant — survivors intact") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val before = content(a)
      val tombs = tombsFor(a)
      val deadKeys = tombs.as[Long].collect().toSet
      val Some((staging, affected)) =
        LayoutOps.stageTakedown(spark, a, "band", "k", tombs)
      // simulate a non-atomic recursive delete of the live partition
      // killed halfway (the pre-round-10 swap's hazard): drop SOME of
      // the live partition's data files, keep the directory — a
      // remnant that exists but is incomplete
      val (g, p) = affected.find { case (g, p) =>
        fs.exists(new HPath(s"$staging/ingest=$g/band=$p"))
      }.get
      val livePart = new HPath(s"$a/ingest=$g/band=$p")
      val dataFiles = fs.listStatus(livePart)
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(dataFiles.nonEmpty)
      assert(fs.delete(dataFiles.head.getPath, false))
      // recovery must treat the marked staging tree as truth and
      // adopt it over the remnant; the re-run then converges
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k", tombs,
        staged = true)
      assert(content(a) === before.filterNot(r => deadKeys(r._1)))
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }

  test("an unmarked staging leftover (killed while writing) is " +
      "discarded; the live tree was never touched") {
    withDir { root =>
      val a = s"$root/a"
      buildArtifact(a)
      val tombs = tombsFor(a)
      val deadKeys = tombs.as[Long].collect().toSet
      val before = content(a)
      // a half-written staging tree with no _STAGED marker
      fs.mkdirs(new HPath(s"${a}__takedown/ingest=0/band=1"))
      LayoutOps.deleteKeysPartitioned(spark, a, "band", "k", tombs,
        staged = true)
      assert(content(a) === before.filterNot(r => deadKeys(r._1)))
      assert(!fs.exists(new HPath(s"${a}__takedown")))
    }
  }
}

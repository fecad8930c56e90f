package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ArtifactManifest, LayoutOps}

/** Randomized interleaving stress for the manifest's single-writer /
  * many-readers contract. `ArtifactManifestSpec` pins each property in
  * a scripted scenario (one pre-flip reader through one compaction);
  * this suite drives a seeded random schedule of
  * append / compact / vacuum / takedown cycles with a POOL of readers
  * pinned at different versions, and asserts after every mutation that
  * each reader still serves exactly its pinned version's rows — the
  * difference between "the property holds in the scripted case" and
  * "the lifecycle is safe under interleaving".
  *
  * Reader-lease model (the documented contract, exercised literally):
  *  - append and compact/vacuum=false are manifest flips — every
  *    pinned reader's generation directories survive them untouched;
  *  - vacuum ends the lease of readers whose pinned generations left
  *    the live set (their files are reaped) — those retire, the rest
  *    must still read their pinned content;
  *  - a takedown rewrites live partitions IN PLACE (maintenance
  *    window): every open reader retires, readers pinned after it see
  *    the post-takedown rows.
  */
class ManifestStressSpec extends SparkSpec {
  import spark.implicits._

  private def withDir[A](f: String => A): A =
    withTempDir("graft-manifest-stress")(f)

  private final case class Reader(df: DataFrame, expect: Seq[Long],
      gens: Set[Long], version: Long)

  private def idsOf(df: DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().toSeq.sorted

  test("seeded random append/compact/vacuum/takedown schedule: every " +
      "pinned reader serves its version's rows for its whole lease") {
    val rnd = new scala.util.Random(20260814L)
    withDir { dir =>
      var nextId = 0L
      def freshIds(n: Int): Seq[Long] = {
        val r = (nextId until nextId + n); nextId += n; r
      }
      def writeGen(g: Long, ids: Seq[Long]): Unit =
        ids.map(i => (i, i % 3, s"p$i")).toDF("id", "part", "payload")
          .write.mode("overwrite").partitionBy("part")
          .parquet(s"$dir/ingest=$g")

      // model of the committed state: live generation -> its ids,
      // plus the highest generation number ever assigned (disk may
      // trail it after takedowns empty the top generation)
      var live = Map[Long, Seq[Long]]()
      var maxGen = 0L
      def allIds: Seq[Long] = live.values.flatten.toSeq.sorted

      writeGen(0L, freshIds(30))
      ArtifactManifest.recordBuild(spark, dir)
      live = Map(0L -> (0L until 30L))

      var readers = List[Reader]()
      def pin(): Unit = {
        val p = ArtifactManifest.latest(spark, dir).get
        readers ::= Reader(ArtifactManifest.frame(spark, dir), allIds,
          p.generations.toSet, p.version)
        readers = readers.take(6) // bounded pool, oldest fall off
      }
      pin()

      for (cycle <- 1 to 16) {
        rnd.nextInt(5) match {
          case 0 | 1 => // append a fresh generation
            val g = maxGen + 1
            val ids = freshIds(5 + rnd.nextInt(10))
            writeGen(g, ids)
            ArtifactManifest.recordAppend(spark, dir, g)
            live += (g -> ids)
            maxGen = g
          case 2 => // manifest-flip compaction, vacuum deferred
            val g = ArtifactManifest.compactGenerations(spark, dir,
              "part", vacuum = false)
            live = Map(g -> allIds)
            maxGen = math.max(maxGen, g)
          case 3 => // vacuum: ends the lease of readers off the live set
            ArtifactManifest.vacuum(spark, dir)
            readers = readers.filter(_.gens.subsetOf(live.keySet))
          case 4 => // in-place takedown of a sample of ids
            val doomed = allIds.filter(_ => rnd.nextInt(4) == 0)
            // strict subset: emptying the artifact entirely would
            // (correctly) make later compactions refuse to run —
            // not the interleaving under test here
            if (doomed.nonEmpty && doomed.size < allIds.size) {
              LayoutOps.deleteKeysPartitioned(spark, dir, "part", "id",
                doomed.toDF("id"), staged = rnd.nextBoolean())
              ArtifactManifest.refreshAfterDelete(spark, dir)
              val dead = doomed.toSet
              live = live.map { case (g, ids) =>
                g -> ids.filterNot(dead)
              }.filter(_._2.nonEmpty)
              // in-place rewrite: every open lease ends
              readers = Nil
            }
        }
        pin()
        for (r <- readers)
          assert(idsOf(r.df) === r.expect,
            s"cycle $cycle: reader pinned at version ${r.version} " +
              s"(gens ${r.gens.toSeq.sorted}) no longer serves its " +
              "pinned content")
      }
      // the model and the final manifest agree
      assert(idsOf(ArtifactManifest.frame(spark, dir)) === allIds)
      assert(ArtifactManifest.latest(spark, dir).get.generations
        .toSet === live.keySet)
    }
  }

  test("seeded random clustered-fact schedule: clusterAppend / " +
      "re-cluster flips / vacuum never disturb a leased reader") {
    val rnd = new scala.util.Random(48271L)
    withDir { dir =>
      var nextId = 0L
      def batch(n: Int): DataFrame = {
        val r = (nextId until nextId + n); nextId += n
        // shuffled key so the cluster pass has real work to do
        r.map(i => (i, (i * 48271L) % 1000, s"p$i"))
          .toDF("id", "k", "payload")
      }
      var expectCount = 30L
      ArtifactManifest.clusterBuild(batch(30), dir, Seq("k"), 2)

      var readers = List[Reader]()
      def pin(): Unit = {
        val p = ArtifactManifest.latest(spark, dir).get
        readers ::= Reader(ArtifactManifest.frame(spark, dir),
          (0L until expectCount).toSeq, p.generations.toSet, p.version)
        readers = readers.take(6)
      }
      pin()

      for (cycle <- 1 to 12) {
        rnd.nextInt(4) match {
          case 0 | 1 =>
            val n = 5 + rnd.nextInt(10)
            ArtifactManifest.clusterAppend(batch(n), dir, Seq("k"), 2)
            expectCount += n
          case 2 =>
            ArtifactManifest.compactClusteredGenerations(spark, dir,
              Seq("k"), 2, vacuum = false)
          case 3 =>
            val liveSet = ArtifactManifest.latest(spark, dir).get
              .generations.toSet
            ArtifactManifest.vacuum(spark, dir)
            readers = readers.filter(_.gens.subsetOf(liveSet))
        }
        pin()
        for (r <- readers)
          assert(idsOf(r.df) === r.expect,
            s"cycle $cycle: clustered-fact reader pinned at version " +
              s"${r.version} no longer serves its pinned content")
      }
      assert(ArtifactManifest.frame(spark, dir).count() === expectCount)
    }
  }
}

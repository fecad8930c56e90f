package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump the `explain("formatted")` physical plan of named
  * queries to one file each — the per-round optimization evidence
  * (`plans/r{N}/<query>_{before,after}.txt`). Unlike [[Explain]]
  * (fixed representative set into PLANS.md) this takes the output
  * directory, a suffix, and the query list from args, so the same
  * binary can be run in a worktree of the previous round's HEAD to
  * produce the `_before` side.
  *
  * Run: `sbt "runMain graft.PlanDump plans/r21 after s8_ivfpq_topk ..."`
  * Data dir via SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not
  * timing, is the point; lifecycle queries still execute their builds
  * during construction, which is what makes their final-frame plans
  * honest).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <query> [query...]")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"PlanDump: unknown query '$q'"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

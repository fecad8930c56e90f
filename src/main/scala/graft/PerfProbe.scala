package graft

/** Dev tool: time named queries at a scale dir and print the FINAL
  * adaptive physical plan (what AQE actually executed, not the initial
  * static plan). Used to audit the join-strategy decisions behind
  * BENCH regressions.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt "runMain graft.PerfProbe j3_semi_join set_except"`
  * Optional extra session conf via SPARK_GRAFT_CONF="k=v,k2=v2".
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = Sessions.builder("graft-perfprobe", cpus)
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => b.config(k.trim, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF entry '$kv' is not k=v (note: values " +
              "containing ',' are unsupported — the list splits on it)")
        }
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    try SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j2_composite_join", "j3_semi_join", "j7_anti_join",
        "set_except", "w7_month_year")
    for (name <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // outside the timed region, matching Bench — else persisting
        // queries over-report relative to BENCH_r{N}.json
        spark.catalog.clearCache()
        (dt, df)
      }
      val (best, df) = times.minBy(_._1)
      println(f"== $name%-20s best=${best}%.3f s  runs=${times.map(t => f"${t._1}%.2f").mkString(",")}")
      if (sys.env.get("SPARK_GRAFT_PLANS").contains("1")) {
        // executedPlan after execution resolves the adaptive plan
        println(df.queryExecution.executedPlan.toString
          .linesIterator.take(40).mkString("\n"))
      }
    }
    spark.stop()
  }
}

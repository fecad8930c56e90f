package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("p2_eq_filter", "j1_dim_join", "j2_multihop", "q1_agg", "s1_cosine_topk")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}

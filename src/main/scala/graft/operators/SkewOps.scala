package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the manual salting idiom for when AQE's
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * broadcast-ineligible join or a streaming stage).
  *
  * A hot join key concentrates its rows in one task; salting splays
  * each key over `n` sub-keys: the large side gets a deterministic salt
  * from a high-cardinality column, the small side is replicated n
  * times, and the join key becomes (key, salt). Row multiplicity is
  * preserved exactly — each large-side row matches exactly one of the n
  * replicas.
  */
object SkewOps {

  /** Salted inner equi-join on `key`. `saltSource` must be a column of
    * the LEFT (large) side with per-row variation (an id); the salt is
    * `xxhash64(saltSource) mod n`, deterministic across retries.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      n: Int, saltSource: Column): DataFrame = {
    require(n >= 1, s"saltedJoin: salt fan-out n >= 1 (got $n — " +
      "pmod(x, 0) is NULL and would return an empty join)")
    Seq(large, small).foreach(df =>
      require(!df.columns.contains("__salt"),
        "saltedJoin: input already has a '__salt' column — rename it"))
    val l = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(n)))
    val r = small.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation with an explicit pre-shuffle split for a
    * skewed group key: partial aggregate on (key, salt), then final
    * aggregate on key. Only sum/count-decomposable aggregates belong
    * here (the caller supplies both phases).
    */
  def saltedAgg(df: DataFrame, key: String, n: Int, saltSource: Column,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    require(n >= 1, s"saltedAgg: salt fan-out n >= 1 (got $n)")
    require(!df.columns.contains("__salt"),
      "saltedAgg: input already has a '__salt' column — rename it")
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(n)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }
}

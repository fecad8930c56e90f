package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same key.
  * Spark has no native as-of join; rather than a mapPartitions merge,
  * this composes it from a UNION + one window pass, which scales as a
  * single hash-partition-by-key shuffle and stays in whole-stage
  * codegen:
  *
  *   1. tag both sides and union them (right rows carry the payload,
  *      left rows carry null),
  *   2. `last(payload, ignoreNulls)` over (key ORDER BY ts, side) with
  *      rows unbounded-preceding..current — right rows sort BEFORE left
  *      rows at equal ts, so ties resolve to "at or before", matching
  *      DuckDB/QuestDB ASOF semantics,
  *   3. keep only left rows.
  *
  * The right side must be unique per (key, ts) for well-defined
  * semantics; pre-aggregate it if necessary.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side, unique per (keys, ts)
    * @param keys       equi-key columns present on both sides
    * @param ts         event-time column name (both sides)
    * @param payloadCol right-side column to attach
    * @param outCol     name of the attached column on the output
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, payloadCol: String, outCol: String): DataFrame = {
    val lCols = left.columns
    // working-name guard (the PackOps/SourceMix convention): a caller
    // column named like the staging columns would be silently
    // overwritten and returned as a constant
    Seq("__side", "__p").foreach(n => require(!lCols.contains(n),
      s"asOf: left already has a '$n' column — rename it first"))
    require(!lCols.contains(outCol),
      s"asOf: left already has a '$outCol' column — pick another " +
        "outCol (the attach would produce a duplicate name)")
    // The payload travels WRAPPED in a struct: `last(payload,
    // ignoreNulls)` on the bare column cannot tell a left-row
    // placeholder NULL from a matched right row whose payload is
    // genuinely NULL — it would skip the latter and attach an OLDER
    // stale payload where native ASOF (and the DuckDB oracle) returns
    // NULL. A struct from a right row is never null even when its
    // payload field is, so ignoreNulls skips exactly the left rows.
    val pType = right.schema(payloadCol).dataType
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("v", pType)))))
    val r = right
      // a NULL right timestamp can never satisfy r.ts <= l.ts (the
      // comparison is three-valued NULL — native ASOF and the DuckDB
      // oracle never match it), but ascending-nulls-FIRST ordering
      // would make it the partition's earliest anchor and attach its
      // payload everywhere: drop such rows up front
      .where(col(ts).isNotNull)
      .select((keys :+ ts).map(col)
        :+ struct(col(payloadCol).as("v")).as("__p"): _*)
      .withColumn("__side", lit(0))
    // align schemas: left keeps all its columns; right fills the rest
    val united = l.select(
      (lCols.toIndexedSeq.map(col) :+ col("__side") :+ col("__p")): _*)
      .unionByName(
        r.select(
          (keys :+ ts).map(col) :+ col("__side") :+ col("__p"): _*),
        allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    united
      .withColumn(outCol,
        last(col("__p"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select(lCols.toIndexedSeq.map(col) :+ col(outCol): _*)
  }
}

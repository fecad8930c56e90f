package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Publish

/** Streaming incremental publication — the composition that makes the
  * reference's designed-but-disabled incremental mode (SURVEY.md §2.10)
  * fully live: a file stream feeds `foreachBatch`, and every micro-batch
  * runs the batch publish pipeline's resume path, which appends only
  * rows newer than each chunk file's recorded tail. Batch re-delivery
  * after a crash is therefore harmless: re-delivered rows are at or
  * before the tail and are skipped — the checkpoint gives at-least-once
  * delivery and the tail probe upgrades it to effectively-once output.
  */
object StreamingPublish {

  /** Run `stream` to the publish pipeline until current end of input. */
  def run(stream: DataFrame, spec: Publish.ChunkSpec, outDir: String,
      headerFor: Seq[Any] => Seq[String], checkpoint: String): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Publish.publishChunks(batch.sparkSession, batch, spec, outDir,
            headerFor)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

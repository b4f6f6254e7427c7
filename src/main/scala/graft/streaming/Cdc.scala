package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.io.Versioned
import graft.operators.Relational

/** Streaming CDC apply: a change stream continuously MERGEd into a
  * [[graft.io.Versioned]] table — the "keep the serving copy fresh"
  * loop of a training-data lake (ingest upserts, snapshot per batch,
  * time-travel to any batch boundary).
  *
  * Exactly-once table state across restarts WITHOUT sink transactions:
  * each micro-batch commit records its batch id in the new version's
  * manifest; a replayed batch (foreachBatch re-delivery after crash)
  * sees `lastBatchId >= id` and skips. Combined with the checkpoint,
  * the table converges to each batch applied exactly once.
  *
  * Scale shape per batch: one latest-wins window over the BATCH (small),
  * one full-outer merge shuffle keyed on the merge key, one snapshot
  * write. Snapshots share nothing, so old versions can be vacuumed by
  * retention policy; compaction of the version chain is a rewrite of
  * the latest snapshot only.
  */
object Cdc {

  /** Apply one micro-batch of change rows idempotently. Returns the
    * committed version, or None if the batch was already applied (or
    * empty). Visible for direct testing. */
  def applyBatch(batch: DataFrame, batchId: Long, root: String, key: String,
      updateCols: Seq[String], seqCol: String): Option[Long] = {
    val spark = batch.sparkSession
    val lastApplied = Versioned.latestVersion(spark, root)
      .flatMap(v => Versioned.manifest(spark, root, v).get("batchId"))
      .map(_.toLong)
    if (lastApplied.exists(_ >= batchId)) None
    else if (batch.isEmpty) None
    else {
      // latest-wins compaction WITHIN the batch: mergeUpsert requires a
      // key-unique source
      val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
      val compacted = batch
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select((key +: updateCols).map(col): _*)
      val current = Versioned.read(spark, root)
      val next = Relational.mergeUpsert(current, compacted, key, updateCols)
      Some(Versioned.write(next, root, Map("batchId" -> batchId.toString)))
    }
  }

  /** Start the streaming apply loop. The table must be seeded first
    * (`Versioned.write(initial, root)`). */
  def applyStream(updates: DataFrame, root: String, key: String,
      updateCols: Seq[String], seqCol: String, checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, root, key, updateCols, seqCol): Unit
      }
      .start()
}

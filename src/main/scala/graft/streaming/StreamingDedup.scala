package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Cross-micro-batch streaming deduplication with CUSTOM state —
  * `KeyValueGroupedDataset.flatMapGroupsWithState`, the Structured
  * Streaming surface for stateful operators the built-ins can't express.
  * (`dropDuplicates` on a stream keeps state too, but its semantics are
  * "row equality on the listed columns"; a training-data dedup keys on a
  * CONTENT FINGERPRINT and must emit a deterministic representative — the
  * smallest `orderCol` — per key, which needs the custom-state form.)
  *
  * Semantics: the first micro-batch in which a key appears emits exactly
  * one row — the one with the minimal (orderCol, then arbitrary-but-fixed
  * field order) among that batch's rows for the key; every later
  * occurrence of the key, in the same batch or ANY later batch, is
  * dropped. State per key is a single empty marker record, recovered from
  * the checkpoint across restarts, so a stop/start never re-emits.
  *
  * 100 TB shape: state is one tiny record per DISTINCT key, partitioned
  * by key hash across executors (Spark's state store); an eternal stream
  * still accretes state forever, so `stateTtlMs` arms a processing-time
  * timeout per key — after `stateTtlMs` without a re-occurrence the
  * marker is dropped and a much-later duplicate would re-emit. That is
  * the standard bounded-state trade; pass 0 for unbounded state (exact
  * forever, state grows with distinct keys).
  */
object StreamingDedup {

  /** Marker state: the key has been seen (and its representative emitted). */
  private[streaming] final case class Seen(emitted: Boolean)

  /** Deduplicate `input` (a streaming OR batch DataFrame) by `keyExpr`
    * (any deterministic expression over the row, e.g.
    * `xxhash64(col("text"))`), emitting per key the row minimal by
    * `orderCol` from the key's FIRST batch. Appends nothing for
    * later batches' occurrences. */
  def dedupByKey(input: DataFrame, keyExpr: org.apache.spark.sql.Column,
      orderCol: String, stateTtlMs: Long = 0L): DataFrame = {
    val spark = input.sparkSession
    val schema = input.schema
    val orderIdx = schema.fieldIndex(orderCol)
    require(schema(orderIdx).dataType ==
        org.apache.spark.sql.types.LongType,
      s"orderCol $orderCol must be LongType (deterministic representative)")
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(schema)
    implicit val kvEnc: org.apache.spark.sql.Encoder[(Long, Row)] =
      Encoders.tuple(Encoders.scalaLong, rowEnc)
    implicit val stateEnc: org.apache.spark.sql.Encoder[Seen] =
      Encoders.product[Seen]
    val timeoutConf =
      if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    input.withColumn("__dedup_key", keyExpr)
      .as[Row](Encoders.row(schema.add("__dedup_key", "long")))
      .groupByKey(r => r.getLong(r.length - 1))(Encoders.scalaLong)
      .flatMapGroupsWithState[Seen, Row](
        OutputMode.Append(), timeoutConf) {
        (key: Long, rows: Iterator[Row], state: GroupState[Seen]) =>
          if (state.hasTimedOut) {
            // TTL fired with no new rows: drop the marker; a later
            // duplicate re-emits (documented bounded-state trade)
            state.remove()
            Iterator.empty
          } else if (rows.isEmpty) {
            Iterator.empty
          } else if (state.exists) {
            // key already represented in an earlier batch: drop all, and
            // re-arm the TTL so hot keys keep their marker alive
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            Iterator.empty
          } else {
            var best: Row = null
            rows.foreach { r =>
              if (best == null || r.getLong(orderIdx) < best.getLong(orderIdx))
                best = r
            }
            state.update(Seen(emitted = true))
            if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
            // strip the internal key column back off
            Iterator.single(Row.fromSeq(best.toSeq.dropRight(1)))
          }
      }
  }

  /** Start a streaming dedup-to-parquet pipeline: `input` (streaming
    * DataFrame) -> [[dedupByKey]] -> our parquet writer, one idempotent
    * `batch=<id>/` directory per micro-batch (the [[StreamingEncode]]
    * sink convention — a replayed batch clears and rewrites its own
    * directory, so exactly-once survives any failure point, and the
    * flatMapGroupsWithState state store recovers from the same
    * checkpoint). */
  def start(input: DataFrame, keyExpr: org.apache.spark.sql.Column,
      orderCol: String, outDir: String, stateTtlMs: Long = 0L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    dedupByKey(input, keyExpr, orderCol, stateTtlMs).writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamingEncode.parquetBatch(batch, batchId, outDir)
      }
      .trigger(trigger)
      .start()
  }
}

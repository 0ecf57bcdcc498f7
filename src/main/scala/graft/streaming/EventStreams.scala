package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructField, TimestampType}

/** Streaming twins for the events-tier batch operators, so batch/stream
  * parity covers analysis the way it covers ingest:
  *
  *  - [[sessionize]] twins `q24_sessionize` via Structured Streaming's
  *    `session_window` — the DECLARATIVE form (Catalyst handles merge,
  *    state, and watermark eviction), preferred over hand-rolled state
  *    per the engine's functions-not-UDFs rule;
  *  - [[AsOfStream.lastAtOrBefore]] twins `q19_asof_join` /
  *    [[graft.operators.AsOfJoin]] — as-of has no declarative streaming
  *    form (stream-stream joins cannot express "LATEST right ≤ left"),
  *    so it is the second operator on the public stateful API
  *    (`flatMapGroupsWithState`), after [[CountWindow]].
  */
object EventStreams {

  /** Per-user session aggregation over a streaming events frame: a
    * session breaks after `gap` of silence — `session_window` merges
    * event-time windows in state and emits a session once the
    * watermark passes its close. Output matches the batch q24 rollup
    * (`session_start` = min event ts; `n_events`; `session_value` =
    * 2-dp sum) so closed sessions are row-comparable across the twins.
    * Works in batch execution too (every session closed), which is
    * what the parity spec exploits.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val st = if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    st.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        graft.Cols.r2(sum(col("value"))).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
  }
}

/** Streaming as-of alignment: for every left row, the latest right
  * `time` at-or-before it within the same key — the batch
  * [[graft.operators.AsOfJoin]] contract carried into unbounded input.
  */
object AsOfStream {

  /** Union-tag the two sides (the batch formulation's shape), key by
    * `key`, and walk each micro-batch's group in `(time, tag)` order
    * with one scalar of state per key: the greatest right `time` seen
    * so far. Left rows emit immediately with that scalar as `asof_ts`
    * — append semantics, so a right row arriving AFTER a left row was
    * emitted (cross-batch disorder beyond the buffer) does not
    * retro-update it; within a micro-batch the sort restores exact
    * batch parity. State is one timestamp per key — bounded by key
    * cardinality, no buffer growth.
    *
    * `right` must have exactly the columns (`key`, `time`). Works in
    * batch execution (one group pass, exact [[graft.operators.AsOfJoin]]
    * parity for any input) and streaming alike.
    *
    * SCALE GUIDANCE — batch execution funnels a key's ENTIRE history
    * through one task's in-memory sort (the `rows.toVector.sortBy`
    * below): the per-key buffer that streaming bounds per-trigger is
    * per-key-TOTAL in batch, so a hot key's full event history must
    * fit one executor's heap. EventStreamsSpec pins correctness under
    * a deliberately skewed fixture, but for batch as-of at corpus
    * scale use [[graft.operators.AsOfJoin]] (q19's form — the
    * per-key window never materializes a Vector); this form exists to
    * pin the streaming state arithmetic (q75) and to serve unbounded
    * input, where the trigger bounds the buffer.
    */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    val leftCols = left.columns
    val inSchema = left.schema
      .add(StructField("_tag", org.apache.spark.sql.types.IntegerType, false))
    val outSchema = left.schema.add(StructField("asof_ts", TimestampType, true))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val stateEnc = Encoders.kryo[AsOfState]

    val rightShaped = leftCols.foldLeft(right.select(col(key), col(time))) {
      (df, c) =>
        if (c == key || c == time) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(leftCols.map(col).toIndexedSeq: _*).withColumn("_tag", lit(0))
    val tagged = left.withColumn("_tag", lit(1)).unionByName(rightShaped)

    val keyIdx = inSchema.fieldIndex(key)
    val timeIdx = inSchema.fieldIndex(time)
    val tagIdx = inSchema.fieldIndex("_tag")

    tagged.groupByKey(r => r.getLong(keyIdx))(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Row], state: GroupState[AsOfState]) =>
          var lastRight = state.getOption.flatMap(_.lastRight).orNull
          val out = Vector.newBuilder[Row]
          // (time, tag) order: a right row at time t precedes a left row
          // at the same t — the inclusive `l.ts >= r.ts` tie rule the
          // batch window uses
          val sorted = rows.toVector.sortBy(r =>
            (r.getTimestamp(timeIdx).getTime,
              r.getTimestamp(timeIdx).getNanos, r.getInt(tagIdx)))
          sorted.foreach { r =>
            if (r.getInt(tagIdx) == 0) {
              val t = r.getTimestamp(timeIdx)
              if (lastRight == null || t.compareTo(lastRight) >= 0) lastRight = t
            } else {
              out += Row.fromSeq(
                r.toSeq.patch(tagIdx, Nil, 1) :+ lastRight)
            }
          }
          state.update(AsOfState(Option(lastRight)))
          out.result().iterator
      }
  }

  /** One scalar per key: the greatest right-side timestamp seen. */
  final case class AsOfState(lastRight: Option[java.sql.Timestamp])
}

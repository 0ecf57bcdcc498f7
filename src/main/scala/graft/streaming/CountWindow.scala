package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** The reference's ONLY aggregation, G2 (readport.py:233-297): a per-key
  * **tumbling count window** — buffer records per group, emit exactly
  * `packLength` of them as one pack, reset, repeat.
  *
  * Spark windows are time-based, so this is the one operator built on
  * the public stateful API: `groupByKey` + `flatMapGroupsWithState`,
  * with a `GroupState` holding the partial buffer across micro-batches
  * (SURVEY.md §2.4 option (a), exact parity semantics). Works in both
  * batch and streaming execution.
  *
  * Delivery semantics: the reference loses in-flight buffers on crash
  * (at-most-once, readport.py:409-414); here the buffer lives in the
  * checkpointed state store → at-least-once, a documented upgrade.
  *
  * Ordering: rows are packed in iterator order. In streaming this is
  * per-partition arrival order — keep a device's stream on a single
  * source partition (the reference is single-threaded per device, so
  * this matches its envelope; SURVEY.md §7 "hard parts" (b)). For
  * deterministic batch testing, sort upstream.
  *
  * State size: groups × packLength × row width — identical to the
  * reference's bound (readport.py:264-269, ≈0.5 MB/device) and far
  * below state-store limits even at 1000 devices.
  */
object CountWindow {

  /** Append `pack_seq` (which completed window) and `pack_pos` (position
    * inside it) to every row of each COMPLETED pack; rows of incomplete
    * packs stay buffered in state (streaming) or are dropped (batch), as
    * in the reference where a partial buffer never reaches disk.
    */
  def packByCount(df: DataFrame, keyCol: String, packLength: Int): DataFrame = {
    require(packLength > 0, "packLength must be positive")
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("pack_seq", LongType, nullable = false))
      .add(StructField("pack_pos", IntegerType, nullable = false))
    implicit val rowEnc = Encoders.row(outSchema)
    implicit val stateEnc = Encoders.kryo[PackState]
    val keyIdx = inSchema.fieldIndex(keyCol)

    df.groupByKey(r => String.valueOf(r.get(keyIdx)))(Encoders.STRING)
      .flatMapGroupsWithState[PackState, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[PackState]) =>
          val st = state.getOption.getOrElse(PackState(Vector.empty, 0L))
          var buf = st.buffer
          var seq = st.emitted
          val out = Vector.newBuilder[Row]
          rows.foreach { r =>
            buf = buf :+ r.toSeq
            if (buf.size == packLength) {
              var pos = 0
              buf.foreach { vals =>
                out += Row.fromSeq(vals :+ seq :+ pos)
                pos += 1
              }
              seq += 1
              buf = Vector.empty
            }
          }
          state.update(PackState(buf, seq))
          out.result().iterator
      }
  }

  /** Buffered rows (as plain value sequences) + number of packs emitted
    * so far, per group. Kryo-serialized into the state store.
    */
  final case class PackState(buffer: Vector[Seq[Any]], emitted: Long)
}

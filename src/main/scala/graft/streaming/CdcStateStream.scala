package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC state view: a keyed `flatMapGroupsWithState` stream that
  * maintains the latest surviving row per primary key and emits the *net
  * change* each micro-batch — a continuously materialized view of the CDC
  * table, complementing the batch/bucketed-store path.
  *
  * Semantics per key within a batch follow the dedup cascade's
  * within-batch order (the caller supplies rows with `load_timestamp`/
  * `op`/`ingestion_seq` already projected into a [[CdcStateStream.Change]]);
  * across batches the keyed state carries the current survivor, so a late
  * batch with an older `load_timestamp` loses — the same late-data rule as
  * the batch cascade (SURVEY §2.9 "late/out-of-order data").
  *
  * Emitted events: `upsert` (key now has a new current row) and `delete`
  * (key removed). Reapplying a batch whose changes are already reflected
  * emits nothing.
  */
object CdcStateStream {

  /** One CDC change rendered to the generic keyed form.
    * `payload` carries the business columns (JSON or any stable encoding —
    * the state view is shape-agnostic).
    */
  final case class Change(
      key: Long,
      op: String,              // I | U | D
      loadTs: Long,            // epoch micros of load_timestamp
      seq: Long,               // ingestion_seq (within-file order)
      payload: String)

  /** Carried per-key state. `op` is kept so cross-batch staleness uses
    * the full cascade (a delete must win a load-timestamp tie, exactly as
    * in the batch path); deleted tombstones carry no payload (bounded
    * state growth on churn-heavy keys — see note on [[netChanges]]).
    */
  final case class KeyState(loadTs: Long, seq: Long, op: String, payload: String, deleted: Boolean)

  final case class StateEvent(key: Long, event: String, payload: String)

  /** Cascade comparison: returns true when `a` beats `b` (newer load
    * timestamp; ties → delete wins; then higher seq).
    */
  private[streaming] def beats(a: Change, b: Change): Boolean = {
    if (a.loadTs != b.loadTs) a.loadTs > b.loadTs
    else {
      def pri(op: String) = op match { case "D" => 3; case "U" => 2; case "I" => 1; case _ => 0 }
      if (pri(a.op) != pri(b.op)) pri(a.op) > pri(b.op)
      else a.seq > b.seq
    }
  }

  private[streaming] def winner(changes: Iterator[Change]): Option[Change] =
    changes.foldLeft(Option.empty[Change]) {
      case (None, c) => Some(c)
      case (Some(w), c) => Some(if (beats(c, w)) c else w)
    }

  /** The state transition for one key and one micro-batch of changes. */
  private[streaming] def transition(
      key: Long,
      changes: Iterator[Change],
      state: GroupState[KeyState]): Iterator[StateEvent] = {
    winner(changes) match {
      case None => Iterator.empty
      case Some(w) =>
        val prev = state.getOption
        // late-batch rule via the SAME cascade as within a batch: the
        // incoming winner is stale only if the carried state strictly
        // beats it (so a delete still wins a load-timestamp tie, and a
        // full tie goes to the later arrival — sequential-apply order)
        val stale = prev.exists(p =>
          beats(Change(key, p.op, p.loadTs, p.seq, p.payload), w))
        if (stale) Iterator.empty
        else if (w.op == "D") {
          val existed = prev.exists(!_.deleted)
          state.update(KeyState(w.loadTs, w.seq, w.op, "", deleted = true))
          if (existed) Iterator.single(StateEvent(key, "delete", w.payload))
          else Iterator.empty
        } else {
          val changed = !prev.exists(p => !p.deleted && p.payload == w.payload)
          state.update(KeyState(w.loadTs, w.seq, w.op, w.payload, deleted = false))
          if (changed) Iterator.single(StateEvent(key, "upsert", w.payload))
          else Iterator.empty
        }
    }
  }

  /** Lift a (possibly streaming) Dataset of changes into the stateful
    * net-change view. Works identically on batch Datasets (Spark runs the
    * same state logic per group).
    *
    * State growth: one entry per key ever seen; delete tombstones are
    * payload-free but are retained (NoTimeout) so late updates stay
    * correctly ordered. For unbounded-key streams wire a
    * `GroupStateTimeout`/TTL policy appropriate to the table's late-data
    * horizon.
    */
  def netChanges(changes: Dataset[Change]): Dataset[StateEvent] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[StateEvent]
    changes
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[KeyState, StateEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(transition)
  }
}

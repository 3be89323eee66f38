package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stateful-stream counterpart of
  * [[graft.operators.AsofJoin]]: each probe event (e.g. a purchase) is
  * joined to the latest strictly-prior build event (e.g. the click that
  * led to it) of the same user, with the last build event carried as
  * keyed state across micro-batches.
  *
  * Per trigger each user's slice is sorted in memory (bounded by events
  * per user per trigger) and swept once: build rows advance the state,
  * probe rows emit it. At equal timestamps probe sorts before build, so
  * the match is strictly prior; build ties resolve to the greatest
  * event id, matching the batch operator's payload-struct tie-break.
  *
  * Exactness across batches assumes per-key in-order delivery at batch
  * granularity (each trigger's events are not older than the previous
  * trigger's), the usual contract for replayed CDC/event logs; within a
  * batch, arrival order is irrelevant. The same function executes in
  * batch mode (one all-encompassing group call, empty initial state),
  * which is what the batch≡stream spec proves.
  */
object AsofStream {

  case class Ev(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, value: Double)

  case class LastBuild(event_id: Long, ts: Timestamp, value: Double)

  case class Enriched(event_id: Long, user_id: Long, ts: Timestamp,
      value: Double, b_event_id: Option[Long], b_ts: Option[Timestamp],
      b_value: Option[Double])

  def enrich(events: DataFrame, probeType: String, buildType: String): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    val relevant = events
      .filter(col("event_type").isin(probeType, buildType))
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"), col("value").cast("double").as("value"))
      .as[Ev]

    def sweep(user: Long, rows: Iterator[Ev],
        state: GroupState[LastBuild]): Iterator[Enriched] = {
      // Null-ts rows have no position on the time axis: build rows are
      // dropped and probe rows emit null enrichment, matching the batch
      // operator (null build filtered; null probe __ts sorts NULLS FIRST
      // ahead of every build row, so its ignore-nulls last() is null).
      val (valid, nullTs) = rows.toIndexedSeq.partition(_.ts != null)
      // (ts, side, event_id): probe (side 0) before build at equal ts →
      // strictly-prior semantics; build ties sweep in id order so the
      // greatest id is the one left in state
      val sorted = valid.sortBy(e =>
        (e.ts.getTime, e.ts.getNanos, if (e.event_type == buildType) 1 else 0, e.event_id))
      var last = state.getOption.orNull
      val out = Seq.newBuilder[Enriched]
      nullTs.foreach { e =>
        if (e.event_type != buildType)
          out += Enriched(e.event_id, e.user_id, e.ts, e.value, None, None, None)
      }
      sorted.foreach { e =>
        if (e.event_type == buildType) last = LastBuild(e.event_id, e.ts, e.value)
        else {
          // State carried from a prior batch may tie the probe's ts;
          // strictly-prior semantics require build.ts < probe.ts
          // (Timestamp.before compares nanos too), same as the in-batch
          // sort placing probe ahead of an equal-ts build.
          val m = Option(last).filter(_.ts.before(e.ts))
          out += Enriched(e.event_id, e.user_id, e.ts, e.value,
            m.map(_.event_id), m.map(_.ts), m.map(_.value))
        }
      }
      if (last != null) state.update(last)
      out.result().iterator
    }

    relevant.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(sweep)
  }
}

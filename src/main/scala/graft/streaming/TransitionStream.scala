package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the event-type transition matrix
  * ([[graft.operators.TransitionQueries]]): per-user last-event state
  * via `flatMapGroupsWithState` — each micro-batch sorts its per-user
  * slice by the total (us, event_id) order, emits a transition for
  * every adjacent pair INCLUDING the boundary pair against the carried
  * last event of the previous batches, and stores the new last event.
  * State per key is O(1) (one event), sharded with the shuffle
  * partitioning — the minimal stateful-sequence shape, simpler than
  * sessionization's gap logic but with the same batch-boundary
  * correctness obligation (a transition spanning two micro-batches
  * must be emitted exactly once).
  *
  * Batch equivalence is certified two ways: TransitionStreamSpec
  * replays a MemoryStream in two batches, and the
  * `stream_transitions_replay` oracle row reproduces the identical
  * split-batch + carried-state computation in pure batch DataFrames
  * against the one-shot oracle.
  */
object TransitionStream {

  case class Ev(event_id: Long, us: Long, user_id: Long, event_type: String)

  case class LastEv(us: Long, eventId: Long, typ: String)

  case class Step(user_id: Long, from_type: String, to_type: String)

  def transitionsStream(events: Dataset[Ev]): Dataset[Step] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Step](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (userId, it, state: GroupState[LastEv]) =>
        val sorted = it.toSeq.sortBy(e => (e.us, e.event_id))
        var prev = state.getOption
        val out = Seq.newBuilder[Step]
        sorted.foreach { e =>
          prev.foreach(p => out += Step(userId, p.typ, e.event_type))
          prev = Some(LastEv(e.us, e.event_id, e.event_type))
        }
        prev.foreach(state.update)
        out.result().iterator
      }
  }
}

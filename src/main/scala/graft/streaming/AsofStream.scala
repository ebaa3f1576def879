package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the as-of join ([[graft.operators.JoinQueries]]
  * asofOf): per-user latest-click state via `flatMapGroupsWithState` —
  * each micro-batch sorts its per-user slice by the total (us,
  * event_id) order, emits every purchase matched to the latest earlier
  * click (carried state included, so a click in batch k attributes a
  * purchase in batch k+n exactly like the one-shot join), and stores
  * the new latest click. State per key is O(1) (one click), sharded
  * with the shuffle partitioning. Completes the temporal family's
  * streaming twins: sessionize, interval join, transitions, and now
  * as-of.
  *
  * Batch equivalence is certified two ways: AsofStreamSpec replays a
  * MemoryStream in two batches, and the `stream_asof_replay` oracle
  * row reproduces the identical split-batch + carried-state
  * computation in pure batch DataFrames against the one-shot
  * events_asof_join oracle.
  */
object AsofStream {

  case class Ev(event_id: Long, us: Long, user_id: Long, event_type: String)

  case class LastClick(us: Long, eventId: Long)

  case class AsofMatch(
      event_id: Long,
      user_id: Long,
      us: Long,
      click_event_id: Option[Long],
      gap_us: Option[Long]
  )

  def asofStream(events: Dataset[Ev]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, AsofMatch](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (userId, it, state: GroupState[LastClick]) =>
        val sorted = it.toSeq.sortBy(e => (e.us, e.event_id))
        var last = state.getOption
        val out = Seq.newBuilder[AsofMatch]
        sorted.foreach { e =>
          if (e.event_type == "click") last = Some(LastClick(e.us, e.event_id))
          else
            out += AsofMatch(
              e.event_id,
              userId,
              e.us,
              last.map(_.eventId),
              last.map(e.us - _.us)
            )
        }
        last.foreach(state.update)
        out.result().iterator
      }
  }
}

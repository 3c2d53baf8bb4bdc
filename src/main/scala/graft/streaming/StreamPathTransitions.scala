package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2 #141 — CONTINUOUS path transitions: the user-journey Markov
  * edges emitted as the stream arrives — each event paired with its
  * user's previous event type via flatMapGroupsWithState. Downstream,
  * the running (prev, next) counts are a plain streaming aggregation of
  * this edge stream. Batch twin: the lag window inside
  * [[graft.operators.Analytics.pathTransitionsFrom]] — StreamingSpec
  * proves edge-level equality on ordered replay.
  *
  * State per key is ONE (t, event_id, type) triple — bounded regardless
  * of stream length, same stance as [[StreamAttribution]].
  */
object StreamPathTransitions {

  case class PathEvent(user_id: Long, event_type: String, t: Long,
                       event_id: Long)
  case class Transition(user_id: Long, prev_type: String, next_type: String,
                        t: Long)
  case class LastEvent(t: Long, event_id: Long, event_type: String)

  def transitions(events: Dataset[PathEvent]): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val longEnc = Encoders.scalaLong

    def handle(userId: Long, it: Iterator[PathEvent],
               state: GroupState[LastEvent]): Iterator[Transition] = {
      // same total (t, event_id) order as the batch lag window
      val sorted = it.toSeq.sortBy(e => (e.t, e.event_id))
      var cur = state.getOption
      val out = List.newBuilder[Transition]
      sorted.foreach { e =>
        cur.foreach(s =>
          out += Transition(userId, s.event_type, e.event_type, e.t))
        cur = Some(LastEvent(e.t, e.event_id, e.event_type))
      }
      cur.foreach(state.update)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(handle)
  }
}

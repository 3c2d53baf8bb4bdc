package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2 #140 — CONTINUOUS last-touch attribution: purchases are credited
  * to the most recent in-window view/click by the same user AS THE
  * STREAM ARRIVES, via flatMapGroupsWithState over user_id. Batch twin:
  * [[graft.operators.Analytics.attributionAssignFrom]] — StreamingSpec
  * proves per-purchase equality when events arrive in per-user time
  * order (the standard replay stance of the streaming layer; an
  * out-of-order touch that a later batch delivers cannot retroactively
  * re-credit an already-emitted purchase).
  *
  * State per key is ONE [[StreamAttribution.TouchState]] (the current
  * best touch) — bounded regardless of stream length. At 100 TB/day the
  * eviction story is the sessionizer's: an event-time timeout at
  * `t_o + windowUs` may clear state that can never attribute again
  * (kept NoTimeout here so the spec's replay is exact).
  */
object StreamAttribution {

  case class AttrEvent(event_id: Long, user_id: Long, event_type: String,
                       t: Long, v_c: Long)
  case class Attributed(pid: Long, user_id: Long, touch_type: String,
                        v_c: Long)
  case class TouchState(t_o: Long, oid: Long, touch: String)

  def attributed(events: Dataset[AttrEvent], touches: Set[String],
                 windowUs: Long): Dataset[Attributed] = {
    implicit val outEnc = Encoders.product[Attributed]
    implicit val stateEnc = Encoders.product[TouchState]
    implicit val longEnc = Encoders.scalaLong

    def handle(userId: Long, it: Iterator[AttrEvent],
               state: GroupState[TouchState]): Iterator[Attributed] = {
      // events within a micro-batch are not ordered — sort locally into
      // replay order. Purchases sort BEFORE same-timestamp touches: a
      // same-instant touch can never credit the purchase (strict
      // t_o < t_p), but if it were applied first it would evict an
      // older in-window touch from the single-slot state and the
      // purchase would emit 'none' where the batch twin credits that
      // older touch — the one ordering corner where (t, event_id) alone
      // diverges from attributionAssignFrom.
      val sorted = it.toSeq.sortBy(e =>
        (e.t, if (e.event_type == "purchase") 0 else 1, e.event_id))
      var cur = state.getOption
      val out = List.newBuilder[Attributed]
      sorted.foreach { e =>
        if (e.event_type == "purchase") {
          // strict t_o < t_p: a same-instant touch never credits,
          // exactly as the batch join's band filter
          val touch = cur match {
            case Some(s) if s.t_o < e.t && s.t_o >= e.t - windowUs =>
              s.touch
            case _ => "none"
          }
          out += Attributed(e.event_id, userId, touch, e.v_c)
        } else if (touches(e.event_type)) {
          if (cur.forall(s =>
              e.t > s.t_o || (e.t == s.t_o && e.event_id > s.oid)))
            cur = Some(TouchState(e.t, e.event_id, e.event_type))
        }
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

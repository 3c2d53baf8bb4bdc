package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2 #34 — streaming gap-based sessionization with explicit state:
  * flatMapGroupsWithState over user_id, event-time timeout closes idle
  * sessions once the watermark passes last_event + gap. Batch twin:
  * graft.operators.Sessionize (identical session boundaries).
  *
  * State per key is one [[Sessionizer.SessState]] (24 bytes) — bounded
  * regardless of stream length, the requirement for an unbounded run.
  */
object Sessionizer {

  case class SessionEvent(user_id: Long, event_id: Long,
                          ts: java.sql.Timestamp)
  case class UserSession(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Long)
  case class SessState(start_us: Long, last_us: Long, n: Long)

  def sessions(events: Dataset[SessionEvent],
               gapMinutes: Int = 30): Dataset[UserSession] = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    implicit val sessEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[SessState]
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val longEnc = Encoders.scalaLong

    def handle(userId: Long, it: Iterator[SessionEvent],
               state: GroupState[SessState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        // watermark passed last event + gap: the open session is closed
        val s = state.get
        state.remove()
        Iterator.single(UserSession(userId, s.start_us, s.last_us, s.n))
      } else {
        // events within a micro-batch are not ordered — sort locally
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime * 1000 +
          e.ts.getNanos / 1000 % 1000, e.event_id))
        var closed = List.empty[UserSession]
        var cur = state.getOption
        sorted.foreach { e =>
          val tUs = e.ts.getTime / 1000 * 1000000 + e.ts.getNanos / 1000
          cur match {
            case Some(s) if tUs - s.last_us > gapUs =>
              closed ::= UserSession(userId, s.start_us, s.last_us, s.n)
              cur = Some(SessState(tUs, tUs, 1))
            case Some(s) =>
              cur = Some(SessState(s.start_us, math.max(s.last_us, tUs), s.n + 1))
            case None =>
              cur = Some(SessState(tUs, tUs, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last_us / 1000 + gapMinutes * 60000L)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(handle)
  }
}

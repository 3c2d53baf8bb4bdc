package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2 #179 — CONTINUOUS per-user EWMA: the stateful-stream twin of
  * [[graft.operators.Analytics.eventsEwmaFrom]]. Where the batch form
  * folds each user's FULL ordered history per run, the stream carries
  * exactly the scalar the recurrence needs — (count, running ewma) —
  * and advances it per arriving event: O(1) state per user forever,
  * the form that runs at 100 TB/day when re-folding history stopped
  * being an option.
  *
  * Replay stance (shared with StreamAttribution/StreamPathTransitions):
  * events within a micro-batch sort locally into (t, event_id) order;
  * StreamingSpec proves the final per-user row equals the batch fold
  * on ordered replay. An out-of-order straggler across batches cannot
  * retroactively re-smooth an already-advanced average.
  */
object StreamEwma {

  case class Ev(user_id: Long, event_id: Long, t: Long, v_c: Long)
  case class EwmaState(n: Long, ewma: Double)
  case class EwmaOut(user_id: Long, n_events: Long, ewma6: Double)

  def ewma(events: Dataset[Ev]): Dataset[EwmaOut] = {
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val longEnc = Encoders.scalaLong

    def handle(uid: Long, it: Iterator[Ev],
               state: GroupState[EwmaState]): Iterator[EwmaOut] = {
      // Spark's round(col, 6): BigDecimal.valueOf + HALF_UP — the batch
      // twin's exact output contract (local def: the closure must not
      // capture the enclosing object)
      def round6(x: Double): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val sorted = it.toSeq.sortBy(e => (e.t, e.event_id))
      var st = state.getOption.getOrElse(EwmaState(0L, 0.0))
      sorted.foreach { e =>
        val v = e.v_c / 100.0
        st = if (st.n == 0L) EwmaState(1L, v)
             else EwmaState(st.n + 1L, 0.5 * v + 0.5 * st.ewma)
      }
      state.update(st)
      Iterator(EwmaOut(uid, st.n, round6(st.ewma)))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(handle)
  }
}

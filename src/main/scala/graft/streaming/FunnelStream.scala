package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** Streaming funnel state machine — the stateful twin of the batch
  * `q_event_funnel` (view → click → purchase, strict ordering,
  * first-occurrence chaining). The chaining rule is single-pass by
  * construction: processing a user's events in time order, the first view
  * IS min(view), the first click strictly after the recorded view time IS
  * the batch CTE's min-qualifying click, and likewise for purchase — so
  * the stream emits exactly the batch rows, which the gate hash-pins.
  * Each stage is reached at most once per user; stage-entry rows append as
  * they happen, so emission is batching-independent on ordered input.
  */
object FunnelStream {

  final case class FunnelEvent(user_id: Long, event_type: String, tus: Long)

  /** One appended row per (user, stage) entry: stage 1=view, 2=click,
    * 3=purchase; tus is the entry event's time.
    */
  final case class StageRow(user_id: Long, stage: Long, tus: Long)

  /** Per-user progression; -1 marks an unreached stage. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** THE transition, shared verbatim by both state APIs ([[advance]] on
    * flatMapGroupsWithState, [[FunnelTws]] on transformWithState — one
    * function so a chaining-rule fix can never desynchronize the twins
    * that pin the same oracle): sort the batch's events by time, advance
    * the three-stage machine, return the new state plus newly reached
    * stage rows. Ties at equal timestamps are order-independent: a click
    * at exactly the view's time fails the STRICT `tus > t1` either way.
    */
  def step(
      userId: Long,
      s0: FunnelState,
      events: Iterator[FunnelEvent]): (FunnelState, Vector[StageRow]) = {
    var s = s0
    val out = Vector.newBuilder[StageRow]
    for (e <- events.toSeq.sortBy(_.tus)) e.event_type match {
      case "view" if s.t1 < 0 =>
        s = s.copy(t1 = e.tus); out += StageRow(userId, 1L, e.tus)
      case "click" if s.t1 >= 0 && s.t2 < 0 && e.tus > s.t1 =>
        s = s.copy(t2 = e.tus); out += StageRow(userId, 2L, e.tus)
      case "purchase" if s.t2 >= 0 && s.t3 < 0 && e.tus > s.t2 =>
        s = s.copy(t3 = e.tus); out += StageRow(userId, 3L, e.tus)
      case _ => // stage already reached, out of order, or other event type
    }
    (s, out.result())
  }

  /** flatMapGroupsWithState adapter over [[step]]. */
  def advance(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageRow] = {
    val (s, rows) = step(userId,
      state.getOption.getOrElse(FunnelState(-1L, -1L, -1L)), events)
    state.update(s)
    rows.iterator
  }
}

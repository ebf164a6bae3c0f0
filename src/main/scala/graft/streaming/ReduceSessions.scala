package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming `reduce` — session collapse with the reference's full flush
  * rule set.
  *
  * Reference: /root/reference/src/transforms/reduce/transform.rs — groups
  * expire on processing time (`expire_after_ms`, transform.rs:33-35,55-57),
  * flush on `max_events`, and `starts_when` / `ends_when` conditions
  * (mutually exclusive, config.rs:238-239). A starting event first
  * flushes the previous session and then opens the new one; an ending
  * event is included in the session it closes.
  *
  * Spark-first: one `flatMapGroupsWithState` kernel with
  * ProcessingTimeTimeout. The merge logic is the caller's fold
  * (`init`/`merge`), so the batch merge strategies
  * (graft.operators.Reduce) and this kernel share semantics; state is
  * (accumulator, eventCount) per group key.
  */
object ReduceSessions {

  sealed trait FlushReason
  /** Processing-time expiry (expire_after_ms). */
  case object Expired extends FlushReason
  case object MaxEvents extends FlushReason
  case object EndsWhen extends FlushReason
  /** A starts_when event arrived; previous session flushed. */
  case object NewSessionStart extends FlushReason

  final case class Config[V, A](
      init: V => A,
      merge: (A, V) => A,
      expireAfterMs: Long = 30000L,
      maxEvents: Option[Int] = None,
      startsWhen: Option[V => Boolean] = None,
      endsWhen: Option[V => Boolean] = None)

  def apply[K, V, A, Out: Encoder](
      grouped: KeyValueGroupedDataset[K, V],
      cfg: Config[V, A])(finish: (K, A, FlushReason) => Out)(
      implicit encA: Encoder[A]): Dataset[Out] = {
    require(!(cfg.startsWhen.isDefined && cfg.endsWhen.isDefined),
      "starts_when and ends_when are mutually exclusive (reduce config.rs:238-239)")
    implicit val stateEnc: Encoder[(A, Int)] =
      Encoders.tuple(encA, Encoders.scalaInt)
    grouped.flatMapGroupsWithState[(A, Int), Out](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (key, events, state) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(s => finish(key, s._1, Expired)).toList
          state.remove()
          out.iterator
        } else {
          val flushed = scala.collection.mutable.ListBuffer[Out]()
          var st: Option[(A, Int)] = state.getOption
          events.foreach { v =>
            if (cfg.startsWhen.exists(_(v)) && st.isDefined) {
              flushed += finish(key, st.get._1, NewSessionStart)
              st = None
            }
            st = st match {
              case None         => Some((cfg.init(v), 1))
              case Some((a, n)) => Some((cfg.merge(a, v), n + 1))
            }
            if (cfg.endsWhen.exists(_(v))) {
              flushed += finish(key, st.get._1, EndsWhen)
              st = None
            } else if (cfg.maxEvents.exists(st.get._2 >= _)) {
              flushed += finish(key, st.get._1, MaxEvents)
              st = None
            }
          }
          st match {
            case Some(s) =>
              state.update(s)
              state.setTimeoutDuration(cfg.expireAfterMs)
            case None => if (state.exists) state.remove()
          }
          flushed.iterator
        }
    }
  }
}

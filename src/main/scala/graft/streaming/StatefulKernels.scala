package graft.streaming

import scala.reflect.ClassTag
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming stateful kernels for the transforms whose reference
  * implementations hold cross-event state. Each is one
  * `flatMapGroupsWithState` with ProcessingTimeTimeout — the distributed
  * analogue of the reference's single-process caches, with state expiry
  * standing in for its TTL/LRU memory caps.
  */
object StatefulKernels {

  /** `throttle` — GCRA rate limiting per key.
    *
    * Reference: /root/reference/src/transforms/throttle/rate_limiter.rs:26-29
    * (GCRA via the governor crate: `threshold` cells per `window_secs`;
    * excess events dropped, never delayed; excluded events bypass and
    * never consume quota, transform.rs:105-113).
    *
    * State per key = the GCRA theoretical-arrival-time (TAT). With
    * emission interval tau = window/threshold and burst tolerance
    * (threshold-1)*tau, an event at time t conforms iff
    * TAT - t <= window - tau; on admit TAT := max(TAT, t) + tau.
    * Cold start admits a full `threshold` burst, then sustains
    * threshold-per-window — the governor crate's behavior.
    */
  def throttle[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      threshold: Int,
      windowMs: Long,
      eventTimeMs: V => Long,
      exclude: V => Boolean = (_: V) => false)(
      implicit encV: Encoder[V]): Dataset[V] = {
    val tau = windowMs.toDouble / threshold
    implicit val stateEnc: Encoder[Double] = Encoders.scalaDouble
    grouped.flatMapGroupsWithState[Double, V](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_, events, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var tat = state.getOption.getOrElse(0.0)
          val kept = events.filter { v =>
            exclude(v) || {
              val t = eventTimeMs(v).toDouble
              // 1µs slack: the exact-burst boundary otherwise depends on
              // float rounding of windowMs/threshold
              val conforming = tat - t <= windowMs - tau + 1e-3
              if (conforming) tat = math.max(tat, t) + tau
              conforming
            }
          }.toList
          state.update(tat)
          state.setTimeoutDuration(windowMs * 2)
          kept.iterator
        }
    }
  }

  /** `dedupe` — emit only the first event per match-field key.
    *
    * Reference: /root/reference/src/transforms/dedupe/ (LRU cache of
    * `num_events` keys, common.rs:32-35; TTL variant in
    * timed_transform.rs). The LRU bound is a single-process memory cap;
    * distributed, the state TTL (timeout) plays that role — a key is
    * "forgotten" after `ttlMs` without traffic, matching the timed
    * variant's semantics.
    */
  def dedupe[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      ttlMs: Long = 3600000L)(implicit encV: Encoder[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    grouped.flatMapGroupsWithState[Boolean, V](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_, events, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) {
          state.setTimeoutDuration(ttlMs)
          Iterator.empty
        } else {
          val first = events.take(1).toList
          state.update(true)
          state.setTimeoutDuration(ttlMs)
          first.iterator
        }
    }
  }

  /** `incremental_to_absolute` — running per-series total.
    *
    * Reference: /root/reference/src/transforms/incremental_to_absolute.rs:21-39
    * (per-series cumulative sum; series cache with 5-minute TTL).
    * Absolute inputs pass through and reset nothing.
    */
  def incrementalToAbsolute[K, V, Out: Encoder](
      grouped: KeyValueGroupedDataset[K, V],
      value: V => Double,
      isIncremental: V => Boolean,
      out: (V, Double) => Out,
      ttlMs: Long = 300000L): Dataset[Out] = {
    implicit val stateEnc: Encoder[Double] = Encoders.scalaDouble
    grouped.flatMapGroupsWithState[Double, Out](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_, events, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var run = state.getOption.getOrElse(0.0)
          val outs = events.map { v =>
            if (isIncremental(v)) { run += value(v); out(v, run) }
            else out(v, value(v))
          }.toList
          state.update(run)
          state.setTimeoutDuration(ttlMs)
          outs.iterator
        }
    }
  }

  /** Count-based `sample` (1-in-N round robin) — the reference's default
    * mode (src/transforms/sample/transform.rs). Inherently order-
    * dependent, so it only makes sense per key on a cluster; the counter
    * is per-key state. Keeps events where counter % rate == 0, tagging is
    * left to the caller.
    */
  def sampleCount[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      rate: Int)(implicit encV: Encoder[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    grouped.flatMapGroupsWithState[Long, V](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_, events, state) =>
        var n = state.getOption.getOrElse(0L)
        val kept = events.filter { _ =>
          val keep = n % rate == 0
          n += 1
          keep
        }.toList
        state.update(n)
        kept.iterator
    }
  }

  /** `window` — condition-triggered lookback buffer, streaming form.
    *
    * Reference: /root/reference/src/transforms/window/transform.rs:50-80
    * (ring buffer of the last `numEventsBefore` events per key; a
    * `flushWhen` match emits buffer + trigger + the next `numEventsAfter`
    * events; `forwardWhen` bypasses the buffer).
    */
  def windowLookback[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      flushWhen: V => Boolean,
      numEventsBefore: Int = 100,
      numEventsAfter: Int = 0,
      forwardWhen: V => Boolean = (_: V) => false)(
      implicit encV: Encoder[V], ct: ClassTag[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[(List[V], Int)] =
      Encoders.kryo[(List[V], Int)]
    grouped.flatMapGroupsWithState[(List[V], Int), V](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_, events, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var (buf, after) = state.getOption.getOrElse((List.empty[V], 0))
          val out = scala.collection.mutable.ListBuffer[V]()
          events.foreach { v =>
            if (flushWhen(v)) {
              out ++= buf.reverse
              out += v
              buf = Nil
              after = numEventsAfter
            } else if (forwardWhen(v)) {
              out += v
            } else if (after > 0) {
              out += v
              after -= 1
            } else {
              buf = (v :: buf).take(numEventsBefore)
            }
          }
          state.update((buf, after))
          state.setTimeoutDuration(3600000L)
          out.iterator
        }
    }
  }

  /** `delay` — hold each event for `delayMs` of processing time.
    *
    * Reference: /root/reference/src/transforms/delay.rs (DelayQueue with
    * `delay_ms`, `queue_capacity`, `overflow_strategy`, and an optional
    * `condition` re-armed each period until it passes). Distributed
    * form: per-key state holds (deadline, event) pairs; events whose
    * deadline has passed emit on the next data batch or processing-time
    * timeout tick, so the delay resolves at micro-batch granularity (≥
    * the configured delay, the same lower-bound guarantee the reference
    * gives). Overflow: `drop_newest` drops arrivals past capacity,
    * `forward` emits them undelayed; `block` has no micro-batch
    * equivalent (there is no in-operator backpressure), so it holds
    * past capacity — documented, capacity becomes advisory.
    */
  def delay[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      delayMs: Long,
      queueCapacity: Int = 500,
      overflowStrategy: String = "block", // block | drop_newest | forward
      condition: V => Boolean = (_: V) => true,
      nowMs: () => Long = () => System.currentTimeMillis())(
      implicit encV: Encoder[V], ct: ClassTag[V]): Dataset[V] = {
    implicit val stateEnc: Encoder[List[(Long, V)]] =
      Encoders.kryo[List[(Long, V)]]
    grouped.flatMapGroupsWithState[List[(Long, V)], V](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_, events, state) =>
        val now = nowMs()
        var queue = state.getOption.getOrElse(Nil)
        val out = scala.collection.mutable.ListBuffer[V]()
        events.foreach { v =>
          if (queue.size >= queueCapacity && overflowStrategy == "drop_newest") {
            () // dropped, the reference's intentional drop
          } else if (queue.size >= queueCapacity &&
              overflowStrategy == "forward") {
            out += v
          } else {
            queue = queue :+ (now + delayMs, v)
          }
        }
        // emit expired entries; a failed condition re-arms one period
        // (delay.rs: "delay in provided delay periods until the
        // condition is met")
        val (due, pending) = queue.partition(_._1 <= now)
        val rearmed = due.flatMap { case (_, v) =>
          if (condition(v)) { out += v; None }
          else Some((now + delayMs, v))
        }
        queue = pending ++ rearmed
        if (queue.isEmpty) state.remove()
        else {
          state.update(queue)
          state.setTimeoutDuration(
            math.max(1L, queue.map(_._1).min - now))
        }
        out.iterator
    }
  }

  /** One flushed `line_agg` group: logical event assembled from
    * consecutive physical lines of one file.
    */
  final case class LineAggOut(file: String, grp: Long, first_order: Long,
                              n_lines: Long, message: String)

  /** `line_agg` — multiline aggregation, streaming form.
    *
    * Reference: /root/reference/src/line_agg.rs:24-47 (the four modes)
    * and :49-58 (timeout: a group with no continuation within
    * `timeout_ms` flushes as-is — the case the batch form can't express,
    * since it only sees micro-batch boundaries). Per-file state is the
    * open group plus the previous line's match flag, mirroring the batch
    * operator's lag()-based `startsNew` exactly: ContinueThrough starts
    * on a non-matching line, ContinueWith when the PREVIOUS line didn't
    * match, HaltBefore on a matching line, HaltWith after a matching
    * line (first line of a key starts a group in every mode).
    *
    * Events within a micro-batch are sorted by `ord` (arrival order is
    * not guaranteed inside flatMapGroupsWithState); cross-batch order is
    * the trigger sequence, as in the reference's single-stream reads.
    */
  final case class LineAggState(buf: List[(Long, String)],
                                prevMatched: Boolean, grp: Long)

  def lineAgg[K, V](
      grouped: KeyValueGroupedDataset[K, V],
      mode: String, // continue_through | continue_with | halt_before | halt_with
      pattern: String,
      separator: String,
      ord: V => Long,
      line: V => String,
      timeoutMs: Long = 3000L): Dataset[LineAggOut] = {
    val re = java.util.regex.Pattern.compile(pattern)
    implicit val stateEnc: Encoder[LineAggState] = Encoders.product[LineAggState]
    implicit val outEnc: Encoder[LineAggOut] = Encoders.product[LineAggOut]
    grouped.flatMapGroupsWithState[LineAggState, LineAggOut](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (key, events, state) =>
        def flush(st: LineAggState): LineAggOut = {
          val lines = st.buf.reverse
          LineAggOut(String.valueOf(key), st.grp, lines.head._1,
            lines.size.toLong, lines.map(_._2).mkString(separator))
        }
        if (state.hasTimedOut) {
          val out = state.getOption.filter(_.buf.nonEmpty).map(flush).toList
          state.remove()
          out.iterator
        } else {
          var st = state.getOption.getOrElse(
            LineAggState(Nil, prevMatched = mode == "halt_with", 0L))
          val out = scala.collection.mutable.ListBuffer[LineAggOut]()
          events.toList.sortBy(ord).foreach { v =>
            val l = line(v)
            val matches = re.matcher(l).find()
            val startsNew = mode match {
              case "continue_through" => !matches
              case "continue_with"    => !st.prevMatched
              case "halt_before"      => matches
              case "halt_with"        => st.prevMatched
              case other => throw new IllegalArgumentException(
                s"line_agg: unknown mode $other")
            }
            if (startsNew && st.buf.nonEmpty) {
              out += flush(st)
              st = st.copy(buf = Nil)
            }
            val g = if (startsNew) st.grp + 1 else st.grp
            st = LineAggState((ord(v), l) :: st.buf, matches, g)
          }
          state.update(st)
          state.setTimeoutDuration(timeoutMs)
          out.iterator
        }
    }
  }

  /** Running scalar aggregate for the `aggregate` transform's streaming
    * form: (count, sum, min, max, first, last, sum-of-squares) covers
    * every mode at flush time.
    */
  final case class AggState(n: Long, sum: Double, min: Double, max: Double,
                            first: Double, last: Double, sumSq: Double) {
    def add(v: Double): AggState = AggState(n + 1, sum + v,
      if (n == 0) v else math.min(min, v), if (n == 0) v else math.max(max, v),
      if (n == 0) v else first, v, sumSq + v * v)
  }

  /** `aggregate` — interval-flushed metric aggregation, streaming form.
    *
    * Reference: /root/reference/src/transforms/aggregate/mod.rs (a map of
    * series → running aggregate, flushed on a `interval_ms` ticker) —
    * exactly a per-key state with a processing-time timeout: events fold
    * into the running AggState and emit NOTHING; the flush fires when
    * the key sees no traffic for `intervalMs`, emitting one row per
    * series per quiet interval. The batch `Aggregate` operator's
    * event-time tumbling windows are the replay/backfill analogue.
    */
  def aggregateFlush[K, V, Out: Encoder](
      grouped: KeyValueGroupedDataset[K, V],
      value: V => Double,
      intervalMs: Long,
      finish: (K, AggState) => Out): Dataset[Out] = {
    implicit val stateEnc: Encoder[AggState] = Encoders.product[AggState]
    grouped.flatMapGroupsWithState[AggState, Out](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (key, events, state) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(finish(key, _)).toList
          state.remove()
          out.iterator
        } else {
          var st = state.getOption.getOrElse(
            AggState(0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
          events.foreach(v => st = st.add(value(v)))
          state.update(st)
          state.setTimeoutDuration(intervalMs)
          Iterator.empty
        }
    }
  }

  /** `tag_cardinality_limit` — bound distinct values per tag key.
    *
    * Reference: /root/reference/src/transforms/tag_cardinality_limit/
    * (config.rs:107-127: `exact` HashSet mode or `probabilistic` Bloom
    * mode; actions drop-tag / drop-event). Grouped by tag key; the
    * state is the accepted-value set (exact) or a Bloom bitset +
    * accepted count (probabilistic).
    *
    * `onAllowed` receives the event when its value is within the limit
    * (or the event has no tag); `onExceeded` when over — return None to
    * drop the event (DropEvent) or Some(stripped) for DropTag.
    */
  final case class TagState(values: Array[String], bloom: Array[Long], n: Long)

  def tagCardinalityLimit[K, V, Out: Encoder](
      grouped: KeyValueGroupedDataset[K, V],
      valueLimit: Int,
      tagValue: V => Option[String],
      onAllowed: V => Out,
      onExceeded: V => Option[Out],
      probabilistic: Boolean = false,
      bloomBits: Int = 1 << 16): Dataset[Out] = {
    implicit val stateEnc: Encoder[TagState] = Encoders.product[TagState]
    def bloomIdx(s: String): Seq[Int] = {
      val h1 = MurmurHash3.stringHash(s, 0xA5A5A5A5)
      val h2 = MurmurHash3.stringHash(s, 0x5A5A5A5A) | 1
      (0 until 4).map(i => math.floorMod(h1 + i * h2, bloomBits))
    }
    grouped.flatMapGroupsWithState[TagState, Out](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_, events, state) =>
        var st = state.getOption.getOrElse(
          TagState(Array.empty, new Array[Long](bloomBits / 64), 0L))
        val out = scala.collection.mutable.ListBuffer[Out]()
        events.foreach { v =>
          tagValue(v) match {
            case None => out += onAllowed(v) // no tag: pass untouched
            case Some(tv) =>
              val seen =
                if (probabilistic)
                  bloomIdx(tv).forall(i => (st.bloom(i / 64) >> (i % 64) & 1L) == 1L)
                else st.values.contains(tv)
              if (seen) out += onAllowed(v)
              else if (st.n < valueLimit) {
                if (probabilistic) {
                  val b = st.bloom.clone()
                  bloomIdx(tv).foreach(i => b(i / 64) |= 1L << (i % 64))
                  st = st.copy(bloom = b, n = st.n + 1)
                } else st = st.copy(values = st.values :+ tv, n = st.n + 1)
                out += onAllowed(v)
              } else out ++= onExceeded(v)
          }
        }
        state.update(st)
        out.iterator
    }
  }
}

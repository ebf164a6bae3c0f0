package org.apache.spark

/** Deterministic shuffle-file release for staged multi-action chains.
  *
  * Spark normally releases a finished job's shuffle files when the GC
  * collects the ShuffleDependency and the ContextCleaner notices — which
  * on a busy heap can lag by minutes, long enough for a disk-bounded
  * staged pipeline (the sliced LSH verify) to run several slices' files
  * concurrently and blow the disk budget it was sliced to respect. This
  * bridge lives in the `org.apache.spark` namespace to reach the
  * `private[spark]` registry and cleaner, and lets the driver release a
  * known-dead set of shuffles immediately and synchronously:
  *
  *   val before = GraftShuffleCleanup.liveShuffleIds(sc)
  *   <run one staged action whose output lands on durable storage>
  *   GraftShuffleCleanup.release(sc, liveShuffleIds(sc) -- before)
  *
  * Safety: a released shuffle is recomputed from lineage if some later
  * job unexpectedly needs it (same contract as executor loss), so a
  * mistaken release costs time, never correctness — callers use it
  * between actions whose results are already staged on disk.
  */
object GraftShuffleCleanup {

  /** Shuffle ids currently registered with the driver's map-output
    * tracker (i.e. whose files may still be live on executors).
    */
  def liveShuffleIds(sc: SparkContext): Set[Int] =
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
      case _ => Set.empty
    }

  /** Synchronously unregister the given shuffles and delete their files
    * on every executor. Returns the number of shuffles released.
    */
  def release(sc: SparkContext, ids: Set[Int]): Int = {
    sc.cleaner match {
      case Some(cleaner) =>
        ids.foreach(id => cleaner.doCleanupShuffle(id, blocking = true))
        ids.size
      case None => 0
    }
  }
}

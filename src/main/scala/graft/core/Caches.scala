package graft.core

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-persisted hub DataFrames (the corpus-sized
  * shared subtrees the near-dup/similarity operators cache for their
  * multiple consumers). Persisting is the right plan shape — but a
  * long-lived session running many corpora would otherwise accumulate
  * corpus-sized cache entries with no release point short of
  * `spark.catalog.clearCache()` (which nukes USER cache entries too).
  *
  * Every hub goes through [[persist]]; [[unpersistAll]] releases exactly
  * the registered hubs — call it after materializing an operator's result
  * (Verify/Bench do, between queries). References are weak, so dropped
  * plans never pin the registry.
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[WeakReference[DataFrame]]

  /** Persist a hub (MEMORY_AND_DISK — spills instead of recomputing) and
    * register it for [[unpersistAll]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(new WeakReference(df))
    df
  }

  /** Unpersist every registered hub still reachable. Non-blocking: block
    * eviction runs async, so this never stalls the caller's next job. */
  def unpersistAll(): Unit = {
    var ref = live.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) {
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      ref = live.poll()
    }
  }
}

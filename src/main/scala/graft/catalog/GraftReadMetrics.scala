package graft.catalog

/** Process-wide counter of Graft data-file opens — the read-
  * amplification observable. Each partition reader increments once per
  * data file it actually opens, so (counter delta) across a merge batch
  * = files READ for that batch; with bucket pruning
  * ([[graft.streaming.StreamMerge.BucketColumnName]]) this should track
  * min(churn buckets' files, target files), without it the full file
  * count. Single-JVM (local[*]) scope is exactly the bench/spec
  * topology; on a real cluster the same signal comes from the scan's
  * planned-files count in the UI. LongAdder: contention-free on the hot
  * path, cost is one cache-line add per FILE (not per row).
  */
object GraftReadMetrics {
  private val opened = new java.util.concurrent.atomic.LongAdder

  private[catalog] def fileOpened(): Unit = opened.increment()

  /** Total data files opened by graft scans in this JVM so far. */
  def dataFilesOpened: Long = opened.sum()
}

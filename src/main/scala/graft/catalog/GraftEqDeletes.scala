package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{StructField, StructType}

/** Executor-side loader/cache for equality-delete key sets — the
  * [[GraftDeletes]] posture applied to the second delete form:
  * equality-delete files are immutable once committed (writeId-unique
  * paths; compaction replaces, never mutates), so each JVM parses a
  * file at most once into a key set and serves every later reader from
  * the cache, LRU-bounded by total keys so delete-heavy tables degrade
  * to re-parsing, never to OOM. Key sets are per-file and UNIONED per
  * read, because different data files see different applicable subsets
  * (sequence-number shadowing).
  */
object GraftEqDeletes {

  val CacheMaxKeysKey = "graft.eqdelete.cache.max-keys"
  val CacheMaxKeysDefault = 16L * 1024 * 1024

  private final case class Cached(keys: java.util.HashSet[Any])
  private val cache = new java.util.LinkedHashMap[String, Cached](16, 0.75f, true)
  private var cachedKeys = 0L

  /** Full-file parses performed (test observability for the cache). */
  val parseCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def cacheClear(): Unit = cache.synchronized {
    cache.clear(); cachedKeys = 0L
  }

  /** Union of the key sets of `deleteFiles` (each read under the
    * single-column `field` schema). CONTRACT: when exactly one file is
    * involved the returned set is the cache's shared instance — treat
    * it as immutable.
    */
  def keysFor(deleteFiles: Seq[String], field: StructField, conf: Configuration): java.util.HashSet[Any] = {
    if (deleteFiles.isEmpty) return new java.util.HashSet[Any]()
    val sets = deleteFiles.map(parsed(_, field, conf))
    if (sets.size == 1) sets.head
    else {
      val out = new java.util.HashSet[Any](sets.map(_.size).sum * 2)
      sets.foreach(out.addAll)
      out
    }
  }

  // cold-start parse dedup, same rationale as GraftDeletes.inFlight
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[java.util.HashSet[Any]]]()

  private def parsed(deleteFile: String, field: StructField, conf: Configuration): java.util.HashSet[Any] = {
    cache.synchronized {
      val hit = cache.get(deleteFile)
      if (hit != null) return hit.keys
    }
    val fut  = new java.util.concurrent.CompletableFuture[java.util.HashSet[Any]]()
    val prev = inFlight.putIfAbsent(deleteFile, fut)
    if (prev != null) {
      try return prev.join()
      catch {
        case e: java.util.concurrent.CompletionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }
    try {
      cache.synchronized {
        val hit = cache.get(deleteFile)
        if (hit != null) { fut.complete(hit.keys); return hit.keys }
      }
      val keys = parseFile(deleteFile, field, conf)
      val cap = conf.getLong(CacheMaxKeysKey, CacheMaxKeysDefault)
      cache.synchronized {
        if (keys.size <= cap) {
          cachedKeys += keys.size
          cache.put(deleteFile, Cached(keys))
          // LRU-evict until under the cap
          val it = cache.entrySet().iterator()
          while (cachedKeys > cap && it.hasNext) {
            val e = it.next()
            if (e.getKey != deleteFile) { cachedKeys -= e.getValue.keys.size; it.remove() }
          }
        }
      }
      fut.complete(keys)
      keys
    } catch {
      case e: Throwable => fut.completeExceptionally(e); throw e
    } finally inFlight.remove(deleteFile)
  }

  private def parseFile(deleteFile: String, field: StructField, conf: Configuration): java.util.HashSet[Any] = {
    parseCount.incrementAndGet()
    val schema = StructType(Seq(field.copy(nullable = true)))
    val out = new java.util.HashSet[Any]()
    val r = new GraftParquetIO.FileReader(new Path(deleteFile), schema, conf)
    try {
      var row = r.next()
      while (row != null) {
        val k = row.get(0, field.dataType)
        if (k != null) out.add(k match {
          // UTF8String from the reader may be a buffer view; copy so
          // cached keys are stable beyond the reader's lifetime
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case other => other
        })
        row = r.next()
      }
    } finally r.close()
    out
  }
}

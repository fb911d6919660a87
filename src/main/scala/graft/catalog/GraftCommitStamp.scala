package graft.catalog

/** Scoped exactly-once commit stamp for streaming micro-batches.
  *
  * foreachBatch delivers batches AT LEAST once (a crash between the
  * table commit and the checkpoint advance replays the batch on
  * restart). While a thread runs inside [[withBatchId]], every manifest
  * commit it performs atomically (a) REFUSES to commit if the base
  * snapshot already carries a batch id >= the scope's — the replay is
  * detected inside the OCC commit window, so even a replay racing a
  * concurrent writer cannot double-apply — and (b) stamps the scope's
  * batch id into the committed snapshot properties. Content commit and
  * replay marker therefore advance in ONE atomic snapshot: this is the
  * table-format exactly-once recipe (Delta's txnAppId/txnVersion,
  * Iceberg's commit-level watermarking of the reference's
  * WatermarkProcessor — /root/reference/src/main/scala/main.scala:121-133
  * merges a staged batch then persists the watermark) applied to the
  * Graft format's MERGE/append paths without threading streaming
  * concerns through the DSv2 write classes.
  *
  * The scope is a plain ThreadLocal: DSv2 command execution (and its
  * BatchWrite.commit) runs on the thread that issued `spark.sql`, which
  * inside foreachBatch is the handler thread itself.
  */
object GraftCommitStamp {

  /** Thrown by a commit whose base snapshot already covers the scope's
    * batch id; Spark aborts the in-flight write (staged files cleaned)
    * and the caller treats it as an idempotent skip.
    */
  final class ReplayedCommit(msg: String) extends RuntimeException(msg)

  private val scope = new ThreadLocal[Option[(String, Long)]] {
    override def initialValue(): Option[(String, Long)] = None
  }

  /** Run `f` with every commit on this thread guarded + stamped. */
  def withBatchId[A](prop: String, batchId: Long)(f: => A): A = {
    require(scope.get.isEmpty, "commit-stamp scopes do not nest")
    scope.set(Some((prop, batchId)))
    try f finally scope.set(None)
  }

  /** Has `batchId` (or a later one) already been committed under `prop`? */
  def committed(props: Map[String, String], prop: String, batchId: Long): Boolean =
    props.get(prop).exists(_.toLong >= batchId)

  /** Does this failure (anywhere in its cause chain) mean "replayed
    * batch"? Spark wraps the commit exception before rethrowing.
    */
  def isReplay(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .exists(_.isInstanceOf[ReplayedCommit])

  /** Guard + stamp hook, called by [[GraftManifestIO.commit]] on every
    * attempt with the freshly-read base: a no-op outside a scope.
    */
  private[catalog] def stamped(
      base: Option[GraftSnapshot], props: Map[String, String]): Map[String, String] =
    scope.get match {
      case None => props
      case Some((prop, id)) =>
        if (base.exists(s => committed(s.properties, prop, id)))
          throw new ReplayedCommit(s"batch $id already committed under $prop")
        props + (prop -> id.toString)
    }
}

package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Pluggable metrics publishing — the seam the reference fills with
  * DataDog/statsd over a unix domain socket
  * (/root/reference/src/main/scala/main.scala:128-130). The pipeline
  * computes its numbers with the Observation API (zero extra passes);
  * this trait is only the transport.
  *
  * `StatsdLineFormat` renders the standard statsd/DogStatsD line protocol
  * so a production deployment only has to point `emit` at a socket; the
  * in-memory recorder backs the specs (no sockets in the container).
  */
trait MetricsPublisher {
  def counter(name: String, value: Long, tags: Map[String, String] = Map.empty): Unit
  def gauge(name: String, value: Double, tags: Map[String, String] = Map.empty): Unit
}

object MetricsPublisher {
  /** Discard everything (the default when no sink is configured). */
  object Noop extends MetricsPublisher {
    override def counter(name: String, value: Long, tags: Map[String, String]): Unit = ()
    override def gauge(name: String, value: Double, tags: Map[String, String]): Unit = ()
  }
}

/** statsd/DogStatsD line protocol: `name:value|type|#tag:v,tag:v`. */
object StatsdLineFormat {
  private def renderTags(tags: Map[String, String]): String =
    if (tags.isEmpty) ""
    else tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }.mkString("|#", ",", "")

  def counter(name: String, value: Long, tags: Map[String, String]): String =
    s"$name:$value|c${renderTags(tags)}"

  def gauge(name: String, value: Double, tags: Map[String, String]): String =
    s"$name:$value|g${renderTags(tags)}"
}

/** Publisher that renders statsd lines into `emit` — pass a socket writer
  * in production, or collect lines in memory (`StatsdRecorder`) in specs.
  */
final class StatsdPublisher(emit: String => Unit) extends MetricsPublisher {
  override def counter(name: String, value: Long, tags: Map[String, String]): Unit =
    emit(StatsdLineFormat.counter(name, value, tags))
  override def gauge(name: String, value: Double, tags: Map[String, String]): Unit =
    emit(StatsdLineFormat.gauge(name, value, tags))
}

/** In-memory statsd sink for tests. */
final class StatsdRecorder extends MetricsPublisher {
  val lines: ArrayBuffer[String] = ArrayBuffer.empty
  private val underlying = new StatsdPublisher(l => lines.synchronized { lines += l })
  override def counter(name: String, value: Long, tags: Map[String, String]): Unit =
    underlying.counter(name, value, tags)
  override def gauge(name: String, value: Double, tags: Map[String, String]): Unit =
    underlying.gauge(name, value, tags)
}

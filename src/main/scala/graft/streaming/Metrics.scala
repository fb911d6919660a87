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

/** Socket transports for the statsd lines — the wire the reference fills
  * with `DataDog.UdsPublisher` / `statsdUDS`
  * (/root/reference/src/main/scala/main.scala:60-61,129). Two transports:
  *
  *  - `udp(host, port)`: classic statsd — one datagram per line.
  *  - `uds(path)`: DogStatsD's unix-domain socket — a connected stream
  *    channel carrying newline-delimited lines (JDK 16+
  *    `StandardProtocolFamily.UNIX`; no native libs).
  *
  * Both are best-effort by design: metrics emission must never take the
  * stream down, so send failures are swallowed after marking the
  * publisher dead (statsd semantics — the daemon being away is normal).
  */
object StatsdSocket {
  import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
  import java.nio.ByteBuffer
  import java.nio.channels.{DatagramChannel, SocketChannel}
  import java.nio.charset.StandardCharsets

  /** A MetricsPublisher writing statsd lines to a socket; close() when
    * the pipeline shuts down.
    */
  final class Emitter private[StatsdSocket] (
      send: ByteBuffer => Unit, closeChannel: () => Unit
  ) extends MetricsPublisher with AutoCloseable {
    @volatile private var dead = false
    private def emit(line: String): Unit =
      if (!dead) try send(ByteBuffer.wrap((line + "\n").getBytes(StandardCharsets.UTF_8)))
      catch { case _: java.io.IOException => dead = true }
    override def counter(name: String, value: Long, tags: Map[String, String]): Unit =
      emit(StatsdLineFormat.counter(name, value, tags))
    override def gauge(name: String, value: Double, tags: Map[String, String]): Unit =
      emit(StatsdLineFormat.gauge(name, value, tags))
    override def close(): Unit = try closeChannel() catch { case _: java.io.IOException => () }
  }

  /** UDP datagram emitter (statsd's default transport). */
  def udp(host: String, port: Int): Emitter = {
    val ch = DatagramChannel.open()
    ch.connect(new InetSocketAddress(host, port))
    new Emitter(buf => { ch.write(buf); () }, () => ch.close())
  }

  /** Unix-domain stream emitter (DogStatsD UDS: `unix:///var/run/
    * datadog/dsd.socket`, newline-delimited lines on one connection).
    */
  def uds(path: String): Emitter = {
    val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
    ch.connect(UnixDomainSocketAddress.of(path))
    new Emitter(buf => { while (buf.hasRemaining) ch.write(buf) }, () => ch.close())
  }
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

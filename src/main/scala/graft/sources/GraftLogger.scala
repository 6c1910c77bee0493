package graft.sources

import java.io.{FileWriter, PrintWriter}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** S12 — structured run-log sink.
  *
  * The reference wires python `logging` to a FileHandler + StreamHandler
  * pair (fl_server.py:13-20, fl_client.py:26-33) and logs round
  * progress/metrics through it. Same contract here: timestamped lines to
  * a file and stdout. Driver-side only (the engine's task-side logging
  * goes through Spark's log4j as usual).
  */
final class GraftLogger(path: Option[String]) extends AutoCloseable {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
  private val file = path.map(p => new PrintWriter(new FileWriter(p, true)))

  private def emit(level: String, msg: String): Unit = {
    val line = s"${fmt.format(Instant.now())} : $level : $msg"
    // scalastyle:off println
    println(line)
    // scalastyle:on println
    file.foreach { f => f.println(line); f.flush() }
  }

  def info(msg: String): Unit = emit("INFO", msg)
  def warn(msg: String): Unit = emit("WARN", msg)
  def error(msg: String): Unit = emit("ERROR", msg)

  override def close(): Unit = file.foreach(_.close())
}

object GraftLogger {
  def apply(path: String): GraftLogger = new GraftLogger(Some(path))
  def stdout(): GraftLogger = new GraftLogger(None)
}

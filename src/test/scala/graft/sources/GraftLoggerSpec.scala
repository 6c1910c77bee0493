package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S12 — the file side of the log sink (fl_server.py:13-20 wires a
  * FileHandler; round-2 verdict flagged that no test asserted the file
  * output actually lands).
  */
class GraftLoggerSpec extends AnyFunSuite {

  test("log lines land in the file with level and message") {
    val path = java.nio.file.Files.createTempFile("graft-log", ".log").toString
    val log = GraftLogger(path)
    log.info("round 1 done")
    log.warn("slow client")
    log.error("boom")
    log.close()
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.size === 3)
    assert(lines(0).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} : INFO : round 1 done"""))
    assert(lines(1).contains(" : WARN : slow client"))
    assert(lines(2).contains(" : ERROR : boom"))
  }

  test("append mode: a reopened logger extends the same file") {
    val path = java.nio.file.Files.createTempFile("graft-log", ".log").toString
    val a = GraftLogger(path); a.info("first"); a.close()
    val b = GraftLogger(path); b.info("second"); b.close()
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.size === 2)
    assert(lines.last.endsWith("second"))
  }

  test("stdout-only logger writes no file") {
    val log = GraftLogger.stdout()
    log.info("ephemeral")
    log.close() // no exception, nothing to flush
  }
}

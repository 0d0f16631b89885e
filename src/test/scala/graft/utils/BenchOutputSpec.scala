package graft.utils

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's stdout contract against the driver's bounded-window
  * truncation (VERDICT r11 items 1+7): BENCH_r10 and BENCH_r11 both came
  * back `parsed: null` because the compact `{"metric":"total",...}` line
  * only PRECEDED the ~95-entry per-query line, and the driver stores a
  * bounded stdout TAIL — the compact line fell off the clipped side.
  * Bench.renderLines now emits the compact line on both sides of the
  * per-query line; this spec simulates the full stdout (including a
  * realistic sbt epilogue after it) and asserts a complete, parseable
  * `metric=="total"` line survives BOTH a 2000-char tail cut and a
  * 2000-char prefix cut.
  */
class BenchOutputSpec extends AnyFunSuite {

  // A realistic full-suite result set: 95 queries with sub-second values
  // whose serialized per-query line far exceeds the 2000-char window.
  private val results: Seq[(String, Double)] =
    (1 to 95).map(i => (f"q$i%02d_some_operator_name" -> (0.1 + i * 0.013)))

  private val lines = graft.Bench.renderLines(results, runs = 3, sfDir = "/root/testdata/sf0.1")

  /** A complete (newline-bounded) line in `window` that is a JSON object
    * with "metric":"total" — partial lines cut mid-object don't count.
    */
  private def totalLineIn(window: String): Option[String] =
    window.split('\n').find { l =>
      l.startsWith("{\"metric\":\"total\"") && l.trim.endsWith("}")
    }

  private def valueOf(line: String): Double = {
    val m = """"value":([0-9.Ee+-]+)""".r.findFirstMatchIn(line)
    assert(m.isDefined, s"no value field in: $line")
    m.get.group(1).toDouble
  }

  test("per-query line alone overflows the driver's 2000-char window") {
    assert(lines(1).length > 2000, "suite shrank? the truncation hazard this spec pins assumes a giant per-query line")
  }

  test("compact total line survives a 2000-char TAIL truncation with sbt epilogue") {
    val epilogue = Seq(
      "[success] Total time: 312 s (05:12), completed Aug 14, 2026, 12:00:00 PM",
      "[info] shutting down sbt server").mkString("\n")
    val stdout = lines.mkString("\n") + "\n" + epilogue
    val tail = stdout.takeRight(2000)
    val found = totalLineIn(tail)
    assert(found.isDefined, s"no complete metric==total line in 2000-char tail:\n$tail")
    assert(valueOf(found.get) === valueOf(lines.head))
  }

  test("compact total line survives a 2000-char PREFIX truncation with sbt preamble") {
    val preamble = Seq(
      "[info] welcome to sbt 1.9.9 (Eclipse Adoptium Java 17.0.10)",
      "[info] loading settings for project repo-build from plugins.sbt ...",
      "[info] running graft.Bench ").mkString("\n")
    val stdout = preamble + "\n" + lines.mkString("\n")
    val prefix = stdout.take(2000)
    val found = totalLineIn(prefix)
    assert(found.isDefined, s"no complete metric==total line in 2000-char prefix:\n$prefix")
    assert(valueOf(found.get) === valueOf(lines.head))
  }

  test("first and last compact lines are byte-identical (take ONE, never sum)") {
    assert(lines.length === 3)
    assert(lines.head === lines.last)
  }

  test("total equals the sum of per-query values") {
    val expected = results.map(_._2).sum
    assert(math.abs(valueOf(lines.head) - expected) < 1e-9)
  }
}

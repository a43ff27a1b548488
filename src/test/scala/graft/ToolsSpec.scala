package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Gates the repo's Python tooling inside `sbt test`, so a bench-gate
  * regression fails the same suite as an operator regression.
  *
  * Round-5 verdict: `tools/check_bench.py` claimed to parse driver
  * `BENCH_r*.json` artifacts but never did (the regex missed both the
  * escaped `\"queries\":` in "tail" and the pretty-printed `"queries": {`
  * in "parsed") — so the regression gate had never evaluated a driver
  * artifact. `tools/test_check_bench.py` now pins every artifact shape,
  * including the REAL committed BENCH_r05.json.
  */
class ToolsSpec extends AnyFunSuite {

  private val repoRoot: java.io.File = {
    // forked test JVMs start in the sbt build root; fail loudly rather than
    // fall back to some other checkout's files (a stale sibling copy passing
    // green would mask a regression in the tree under test)
    val cwd = new java.io.File(sys.props.getOrElse("user.dir", "."))
    assert(new java.io.File(cwd, "tools/check_bench.py").exists(),
      s"ToolsSpec must run from the repo root, got $cwd")
    cwd
  }

  test("check_bench.load_line parses every bench artifact shape, including the real driver BENCH_r05.json") {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/test_check_bench.py"), repoRoot)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"tools/test_check_bench.py failed:\n$out")
    assert(out.toString.contains("93 queries"), out.toString)
  }

  test("check_bench evaluates the driver BENCH_r05.json end-to-end (no 'no bench queries found')") {
    val out = new StringBuilder
    // exit 1 is fine here (r05 records the documented load-ramp SLOW block);
    // what must never happen again is the parse failure
    Process(Seq("python3", "tools/check_bench.py", "BENCH_r05.json",
      "BENCH_FLOOR.json"), repoRoot)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    val s = out.toString
    assert(!s.contains("no bench queries found"), s)
    // one OK/SLOW verdict per floor entry (qNN keys only — queries added
    // after round 5, e.g. q94, correctly report missing-from-bench SLOW)
    val floorKeys = "\"q\\d+_".r.findAllIn(new String(
      java.nio.file.Files.readAllBytes(repoRoot.toPath.resolve("BENCH_FLOOR.json")),
      "UTF-8")).size
    assert("(?m)^(OK|SLOW) ".r.findAllIn(s).size == floorKeys, s.takeRight(500))
  }

  test("check_driver_artifacts flags the round-8 breakage (dead queries + dead bench)") {
    // the r08 artifacts ARE the regression fixture: 22 queries with no
    // CORRECTNESS row and a rc=1 bench. The gate must name both, loudly —
    // these artifacts sat unread for a full round (round-8 postmortem).
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/check_driver_artifacts.py"), repoRoot)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    val s = out.toString
    val latest = "CORRECTNESS_r(\\d+)".r.findAllMatchIn(
      repoRoot.listFiles().map(_.getName).mkString(" ")).map(_.group(1).toInt).max
    if (latest == 8) {
      assert(code == 1, s)
      assert(s.contains("q05_tumbling_window") && s.contains("rc=1"), s)
    } else {
      // later rounds: the gate must at least run and parse the artifacts
      assert(s.contains("DRIVER ARTIFACTS") || s.contains("artifacts clean"), s)
    }
  }
}

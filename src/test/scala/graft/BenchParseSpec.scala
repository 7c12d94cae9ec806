package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's reference-file parsing against both JSON spellings.
  *
  * Bench.scala emits compact JSON (`"queries":{`), but the additive
  * BENCH_REF merge tooling rewrites the file through python
  * json.dump, which emits `"queries": {` with spaces. Round 8
  * shipped several bench artifacts with `run_drift: 1.0` before
  * anyone noticed the exact-substring probe missing the spaced form —
  * the drift gate had silently disabled itself because the reference
  * parsed as empty. These tests make the parser's format tolerance a
  * contract, and the last test reads the REAL committed BENCH_REF.json
  * so any future re-format that the parser cannot read fails CI
  * instead of quietly un-gating the bench.
  */
class BenchParseSpec extends AnyFunSuite {

  private def tmp(content: String): String = {
    val f = Files.createTempFile("benchref", ".json")
    Files.writeString(f, content)
    f.toFile.deleteOnExit()
    f.toString
  }

  test("loadReference parses Bench's own compact output format") {
    val p = tmp("""{"metric":"total","value":9.9,"unit":"sec",""" +
      """"queries":{"q_a":1.25,"q_b":0.5},"cpu_1t":0.051}""")
    assert(Bench.loadReference(p) === Map("q_a" -> 1.25, "q_b" -> 0.5))
    assert(Bench.loadRefCpu1t(p) === Some(0.051))
  }

  test("loadReference parses json.dump's spaced format (the r8 merge)") {
    val p = tmp("""{"metric": "total", "value": 9.9, "unit": "sec", """ +
      """"queries": {"q_a": 1.25, "q_b": 0.5}, "cpu_1t": 0.051}""")
    assert(Bench.loadReference(p) === Map("q_a" -> 1.25, "q_b" -> 0.5))
    assert(Bench.loadRefCpu1t(p) === Some(0.051))
  }

  test("missing file / missing keys degrade to empty, not throw") {
    assert(Bench.loadReference("/nonexistent/ref.json") === Map.empty)
    assert(Bench.loadRefCpu1t("/nonexistent/ref.json") === None)
    val p = tmp("""{"metric":"total","value":1.0}""")
    assert(Bench.loadReference(p) === Map.empty)
    assert(Bench.loadRefCpu1t(p) === None)
  }

  test("the committed BENCH_REF.json is readable by the bench parser") {
    // Repo-relative: the forked test JVM's working directory is the
    // build base, so this holds on any checkout location.
    val refPath = "BENCH_REF.json"
    assert(Files.exists(java.nio.file.Paths.get(refPath)),
      s"BENCH_REF.json not found relative to ${System.getProperty("user.dir")}")
    val ref = Bench.loadReference(refPath)
    assert(ref.size >= 100,
      s"committed BENCH_REF.json parsed only ${ref.size} entries — " +
        "the drift gate would silently disable itself")
    assert(Bench.loadRefCpu1t(refPath).nonEmpty,
      "committed BENCH_REF.json carries no readable cpu_1t — host " +
        "normalization would silently disable itself")
  }
}

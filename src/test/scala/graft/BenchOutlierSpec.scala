package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-query cross-artifact drift flags (r16 adjudication:
  * two queries contended 10-17× inside their own 3-run windows passed
  * both the admission gate and the whole-run drift sweep — neither gate
  * sees one query's window). Synthetic-slowdown tests of the pure
  * flagging function plus the artifact parser it reads the committed
  * baseline through. */
class BenchOutlierSpec extends AnyFunSuite {

  test("synthetic slowdown: a 5x-contended query and a 4x-sped query " +
      "are flagged, in-band queries and unknown queries are not") {
    val baseline = Map("nna_dir_subtree" -> 0.61, "nna_divide" -> 0.30,
      "q1_agg" -> 0.50, "text_langid" -> 0.20)
    val current = Map(
      "nna_dir_subtree" -> 3.05, // 5x slower — the r16 driver shape
      "nna_divide" -> 0.075, // 4x faster — inflated BASELINE window
      "q1_agg" -> 0.55, // 1.1x — in band
      "text_langid" -> 0.45, // 2.25x — inside the 3x default
      "brand_new_query" -> 9.9) // no baseline — never flagged
    val flags = Bench.perQueryOutliers(current, baseline)
    assert(flags.map(_._1) === Seq("nna_dir_subtree", "nna_divide"))
    val byName = flags.map(f => f._1 -> f).toMap
    assert(math.abs(byName("nna_dir_subtree")._4 - 5.0) < 1e-9)
    assert(math.abs(byName("nna_divide")._4 - 0.25) < 1e-9)
  }

  test("sub-50ms pairs are noise, not contention evidence — skipped " +
      "at any ratio; the factor knob widens/narrows the band") {
    val baseline = Map("tiny" -> 0.004, "mid" -> 0.50)
    assert(Bench.perQueryOutliers(
      Map("tiny" -> 0.040, "mid" -> 0.50), baseline).isEmpty)
    // factor 1.5 flags what the default 3.0 forgave
    assert(Bench.perQueryOutliers(Map("mid" -> 1.0), baseline,
      factor = 1.5).map(_._1) === Seq("mid"))
    assert(Bench.perQueryOutliers(Map("mid" -> 1.0), baseline).isEmpty)
  }

  test("baselineMedians parses the bench's own artifact JSON and " +
      "drops failed (negated) medians; a missing file reads empty") {
    val f = java.nio.file.Files.createTempFile("benchbase", ".json")
    java.nio.file.Files.write(f,
      ("""{"metric":"total","value":12.3,"queries":{""" +
        """"q1_agg":{"median":0.51,"min":0.46,"max":0.70},""" +
        """"nna_divide":{"median":0.30,"min":0.28,"max":0.44},""" +
        """"broken_q":{"median":-1.5,"min":-1.2,"max":-2.0}},""" +
        """"sf":"/tmp/x"}""").getBytes("UTF-8"))
    val base = Bench.baselineMedians(f.toString)
    assert(base === Map("q1_agg" -> 0.51, "nna_divide" -> 0.30))
    assert(Bench.baselineMedians("/nonexistent/path.json").isEmpty)
    java.nio.file.Files.deleteIfExists(f)
  }

  test("an unparseable baseline reads as ZERO queries (the visible " +
      "N=0 arm), never an exception that blocks the run") {
    val f = java.nio.file.Files.createTempFile("benchgarbage", ".json")
    java.nio.file.Files.write(f,
      "not json at all {{{ median broken".getBytes("UTF-8"))
    assert(Bench.baselineMedians(f.toString).isEmpty)
    assert(Bench.baselineCalibFactor(f.toString).isEmpty)
    java.nio.file.Files.deleteIfExists(f)
  }

  test("baselineCalibFactor reads mean-of-probes over calib_ref from " +
      "an artifact; absent fields read None") {
    val f = java.nio.file.Files.createTempFile("benchcalib", ".json")
    java.nio.file.Files.write(f,
      ("""{"metric":"total","value":1.0,"queries":{},""" +
        """"calib_start_sec":2.0,"calib_end_sec":3.0,""" +
        """"calib_ref_sec":2.0,"sf":"/tmp/x"}""").getBytes("UTF-8"))
    assert(Bench.baselineCalibFactor(f.toString).contains(1.25))
    java.nio.file.Files.write(f,
      """{"metric":"total","value":1.0,"queries":{}}""".getBytes("UTF-8"))
    assert(Bench.baselineCalibFactor(f.toString).isEmpty)
    java.nio.file.Files.deleteIfExists(f)
  }

  test("calibAdjust rescales ratios by the two runs' box speed: a " +
      "uniform box-speed change masks (or phantom-flags) raw ratios; " +
      "the adjusted ratios see through it") {
    val baseline = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    // whole box 2x FASTER this run: a,b read 0.5; c is genuinely 5x
    // contended on top, reading 2.5 raw — INSIDE the raw 3x band (the
    // masking the advisor named: the uniform speedup ate the headroom)
    val current = Map("a" -> 0.5, "b" -> 0.5, "c" -> 2.5)
    assert(Bench.perQueryOutliers(current, baseline).isEmpty)
    // calib factors: baseline run 1.0, current run 0.5 → adjust 2.0
    val flags = Bench.perQueryOutliers(current, baseline,
      calibAdjust = 2.0)
    assert(flags.map(_._1) === Seq("c"))
    assert(math.abs(flags.head._4 - 5.0) < 1e-9)
    // and the converse: a box-speed change alone (everything 3.5x)
    // would flag EVERY query raw, none adjusted
    val uniform = Map("a" -> 3.5, "b" -> 3.5, "c" -> 3.5)
    assert(Bench.perQueryOutliers(uniform, baseline).size === 3)
    assert(Bench.perQueryOutliers(uniform, baseline,
      calibAdjust = 1.0 / 3.5).isEmpty)
  }
}

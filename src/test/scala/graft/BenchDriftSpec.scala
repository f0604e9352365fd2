package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round drift machinery added in r7: the previous-round
  * bench JSON parses to per-query mins (failures dropped, malformed input
  * tolerated — drift checking must never fail a bench run), and the
  * recheck rule fires exactly when both mins are real and the new one
  * exceeds 2× the previous — the uniform-window slowness that the
  * within-run max/min ratio cannot catch (r6's q99). The end-to-end
  * recheck path (re-run once, keep the better min, record all three
  * numbers) lives in Bench.main and is exercised by the driver's round
  * bench with SPARK_GRAFT_PREV set. */
class BenchDriftSpec extends AnyFunSuite {

  private val prevLine =
    """{"metric":"total","value":75.89,"unit":"sec","reps":3,""" +
      """"queries":{"q01_scan_project":0.25,"q99_embed_quantize":1.83,""" +
      """"q98_scd2_merge":-1.0},""" +
      """"queries_median":{"q01_scan_project":0.31},""" +
      """"variance_flagged":[],"failures":["q98_scd2_merge"],"sf":"x"}"""

  test("parsePrevMins reads the queries map and drops failed (-1) entries") {
    val mins = Bench.parsePrevMins(prevLine)
    assert(mins == Map("q01_scan_project" -> 0.25,
      "q99_embed_quantize" -> 1.83))
  }

  test("parsePrevMins takes the FIRST brace object after the queries key " +
    "(queries_median must not shadow it)") {
    val mins = Bench.parsePrevMins(prevLine)
    assert(mins.get("q01_scan_project").contains(0.25),
      "0.31 would mean queries_median was parsed instead")
  }

  test("parsePrevMins is total on malformed input") {
    assert(Bench.parsePrevMins("").isEmpty)
    assert(Bench.parsePrevMins("not json at all").isEmpty)
    assert(Bench.parsePrevMins("""{"queries":{}}""").isEmpty)
    assert(Bench.parsePrevMins("""{"queries":{"q":"oops"}}""").isEmpty)
  }

  test("needsRecheck fires only above 2x a real previous min") {
    assert(Bench.needsRecheck(Some(1.0), 2.01))
    assert(!Bench.needsRecheck(Some(1.0), 2.0), "exactly 2x is in-family")
    assert(!Bench.needsRecheck(Some(1.0), 0.5), "faster never rechecks")
    assert(!Bench.needsRecheck(None, 100.0), "new queries have no baseline")
    assert(!Bench.needsRecheck(Some(-1.0), 100.0),
      "a prior failure is not a baseline")
    assert(!Bench.needsRecheck(Some(1.0), -1.0),
      "a current failure is recorded in failures, not rechecked")
  }
}

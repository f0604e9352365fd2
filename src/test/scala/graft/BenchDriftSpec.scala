package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round drift machinery added in r7: the previous-round
  * bench JSON parses to per-query mins (failures dropped, malformed input
  * tolerated — drift checking must never fail a bench run), and the
  * recheck rule fires exactly when both mins are real and the new one
  * exceeds 2× the previous — the uniform-window slowness that the
  * within-run max/min ratio cannot catch (r6's q99). The parser scans for
  * `"qNN_name": number` pairs rather than locating the `queries` map,
  * because the round driver's wrapper artifact (`BENCH_r{N}.json`)
  * TRUNCATES that map into a `"tail"` string fragment — the per-query
  * numbers survive, the braces don't. The end-to-end recheck path
  * (re-run once, keep the better min, record all three numbers) lives in
  * Bench.main and is exercised by the driver's round bench with
  * SPARK_GRAFT_PREV set. */
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

  test("parsePrevMins keeps the MINIMUM when a query id appears in both " +
    "the queries and queries_median maps (median ≥ min by construction)") {
    val mins = Bench.parsePrevMins(prevLine)
    assert(mins.get("q01_scan_project").contains(0.25),
      "0.31 would mean the median shadowed the min")
  }

  test("parsePrevMins reads the round driver's wrapper artifact, whose " +
    "tail fragment truncates the queries map mid-object") {
    val wrapper =
      """{"n":6,"rc":0,"cpus":32,"sf":0.1,""" +
        """"tail":"h\":2.878,\"q73_sim_cosine_topk\":2.517,""" +
        """\"q74_text_wordcount\":0.310642,\"q75_udf_scalar\":-1.0",""" +
        """"parsed":{"metric":"total","value":75.89,"n_queries":99}}"""
    val mins = Bench.parsePrevMins(wrapper)
    assert(mins == Map("q73_sim_cosine_topk" -> 2.517,
      "q74_text_wordcount" -> 0.310642),
      s"got $mins — escaped-quote keys in the tail fragment must parse, " +
        "failures must drop")
  }

  test("parsePrevMins is total on malformed input") {
    assert(Bench.parsePrevMins("").isEmpty)
    assert(Bench.parsePrevMins("not json at all").isEmpty)
    assert(Bench.parsePrevMins("""{"queries":{}}""").isEmpty)
    assert(Bench.parsePrevMins("""{"queries":{"q":"oops"}}""").isEmpty)
    assert(Bench.parsePrevMins("""{"queries":{"q12_x":"oops"}}""").isEmpty)
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

  test("repsFor: 5 within the bench budget, 3 past it, explicit always " +
    "wins (r16 guard — BASELINE.md)") {
    assert(Bench.repsFor(296, 300, None) == 5, "this round stays at 5")
    assert(Bench.repsFor(300, 300, None) == 5, "the threshold is exclusive")
    assert(Bench.repsFor(301, 300, None) == 3, "past budget drops to 3")
    assert(Bench.repsFor(301, 300, Some(7)) == 7, "explicit wins past budget")
    assert(Bench.repsFor(10, 300, Some(0)) == 1, "explicit clamps to >= 1")
  }

  test("repsForQuery: heavies (prev min > 2 s) keep 5 under the 3-rep " +
    "guard; sub-2 s and unknown queries take the default; explicit and " +
    "an un-fired guard pass through (r17 floor — BASELINE.md)") {
    val prev = Map("q_heavy" -> 3.5, "q_light" -> 0.4, "q_edge" -> 2.0)
    assert(Bench.repsForQuery("q_heavy", 3, None, prev) == 5)
    assert(Bench.repsForQuery("q_light", 3, None, prev) == 3)
    assert(Bench.repsForQuery("q_edge", 3, None, prev) == 3,
      "exactly 2 s is not a heavy")
    assert(Bench.repsForQuery("q_new", 3, None, prev) == 3,
      "no baseline, default applies")
    assert(Bench.repsForQuery("q_heavy", 5, None, prev) == 5,
      "guard not fired: base passes through")
    assert(Bench.repsForQuery("q_heavy", 2, Some(2), prev) == 2,
      "explicit SPARK_GRAFT_REPS pins every query")
    assert(Bench.repsForQuery("q_heavy", 3, None, Map.empty) == 3,
      "no SPARK_GRAFT_PREV: first guarded round takes the default")
  }
}

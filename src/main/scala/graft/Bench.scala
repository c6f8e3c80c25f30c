package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every catalog query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Noise model (documented in BASELINE.md §noise): all queries share
  * one JVM/session, so a query's wall time depends on its NEIGHBORHOOD
  * — GC debt, JIT state, and scratch/artifact churn left by whatever
  * ran just before it. Reps of a query taken back-to-back in a fixed
  * catalog order all sample the SAME neighborhood, so min-of-N cannot
  * shed that bias (round 7: q160 read 2.25 s in-run vs 0.69 s
  * isolated). The harness therefore runs PASSES: one cold pass in
  * catalog order (Janino codegen + broadcast + JIT warmup), then
  * `SPARK_GRAFT_BENCH_REPS` (default 3) warm passes, each over the
  * whole catalog in a differently-seeded deterministic shuffle, with a
  * full GC between passes. Each warm rep of a query now lands in a
  * different neighborhood, so the reported per-query MIN across passes
  * converges on the uncontended steady-state time — the
  * cluster-relevant number (on a 1000-executor job the plan compiles
  * once and runs over thousands of partitions).
  *
  * `spread_sec` (Σ per-query max−min across passes) and
  * `med_spread_over_min` (median of per-query spread/min) quantify
  * how noisy this VM was; a per-query swing on byte-identical code
  * reads as measured noise, not a regression. `cold_total_sec` is
  * also reported for transparency.
  *
  * The harness REACTS to chaotic windows, not just records them
  * ([[bestTwoAgree]]): when the two fastest pass totals disagree by
  * more than 10 %, up to 3 extra shuffled passes run until they agree
  * — round 11's pair disagreed 13 % on totals purely because two of
  * three passes landed in a bad VM window ([562, 240, 241] s on
  * byte-identical code), which per-query min-of-3 cannot shed.
  * `extra_passes` in the record says whether the policy fired.
  */
object Bench {
  /** A filter token matches a catalog query by full name
    * (`q139_bm25_incremental`) or by bare id (`q139`) — BASELINE.md
    * documents the bare-id form and ids are unique, so both must work.
    * A filter that selects nothing is an error, not an all-zero record
    * (round 9: `SPARK_GRAFT_BENCH_ONLY=q139` silently wrote
    * `{"value":0.000,"queries":{}}` with exit 0).
    */
  def selectNames(only: Option[Set[String]], names: Seq[String])
      : Seq[String] = {
    val out = names.filter { n =>
      only.forall(f => f.contains(n) || f.contains(n.takeWhile(_ != '_')))
    }
    require(only.isEmpty || out.nonEmpty,
      s"SPARK_GRAFT_BENCH_ONLY=${only.get.mkString(",")} matched zero " +
        "catalog queries — use a full name (q139_bm25_incremental) or " +
        "a bare id (q139)")
    out
  }

  /** Chaotic-window policy: after the standard warm passes, the run is
    * trustworthy only if its two FASTEST pass totals agree — those are
    * the passes least polluted by whatever VM window the others hit
    * (round 11 measured byte-identical code swinging 2.5× between
    * passes inside one JVM: [562, 240, 241] s). If they disagree by
    * more than `bound`, the harness runs additional shuffled warm
    * passes (capped) until they do: per-query mins then converge even
    * when several passes land in a bad window, and run-pair agreement
    * becomes a property of the harness rather than the VM's mood. */
  def bestTwoAgree(totals: Seq[Double], bound: Double = 0.10): Boolean = {
    val s = totals.filter(_ > 0).sorted
    s.size >= 2 && (s(1) - s(0)) / s(0) <= bound
  }

  /** Whether to run one more chaotic-window extra pass: only while the
    * two best totals still disagree, the count cap (≤ 3 extras) holds,
    * AND the extras' elapsed wall time is inside `budgetSec`. The
    * wall-clock budget exists because the count cap alone let a bad
    * window add ~45 min (each extra pass can take 6–15+ min) — round
    * 12's driver bench invocation timed out (`BENCH_r12.json` rc 124)
    * exactly because extras had no time bound. The budget is checked
    * BEFORE starting a pass, so worst case overshoots by one pass,
    * never by the whole cap. */
  def shouldRunExtra(totals: Seq[Double], extrasRun: Int,
      elapsedExtraSec: Double, budgetSec: Double): Boolean =
    !bestTwoAgree(totals) && extrasRun < 3 && elapsedExtraSec < budgetSec

  /** MD5 over every .class file (relative path + bytes) on the running
    * main's code-source directory — stamped into the record so a run
    * PAIR can prove it benched byte-identical code (round 12's pair
    * straddled an in-round plan fix, making one query's delta a code
    * diff instead of noise; `tools/bench_pair.py` now refuses such a
    * pair). "unknown" when the code source isn't a directory. */
  def classesSha(): String = try {
    val loc = Bench.getClass.getProtectionDomain.getCodeSource.getLocation
    val root = java.nio.file.Paths.get(loc.toURI)
    if (!java.nio.file.Files.isDirectory(root)) "unknown"
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try {
        walk.iterator().asScala
          .filter(_.toString.endsWith(".class"))
          .map(p => (root.relativize(p).toString, p))
          .toSeq.sortBy(_._1)
          .foreach { case (rel, p) =>
            md.update(rel.getBytes("UTF-8"))
            md.update(java.nio.file.Files.readAllBytes(p))
          }
      } finally walk.close()
      md.digest().map("%02x".format(_)).mkString
    }
  } catch { case _: Throwable => "unknown" }

  /** An ONLY-filtered run must never clobber a committed
    * full-catalog record; compare canonicalized paths AND (when both
    * exist) filesystem identity, so `./BENCH_FULL.json`, an absolute
    * alias, or a SYMLINK to it can't re-open the hole the raw-string
    * compare left. An IO error while resolving counts as a clash —
    * fail safe, never overwrite.
    */
  def guardOutFile(onlySet: Boolean, outFile: String): Unit = {
    if (!onlySet) return
    import java.nio.file.{Files, Paths}
    val full = Paths.get("BENCH_FULL.json")
    val out = Paths.get(outFile)
    val clash =
      // any file NAMED BENCH_FULL*.json is a full-catalog record by
      // convention — the mutable latest AND the immutable per-round
      // pair records (BENCH_FULL_r10.json / _runA.json) — wherever it
      // lives (covers a JVM cwd that differs from the repo root, e.g.
      // tools/run_main.sh launched elsewhere)
      (out.getFileName.toString.startsWith("BENCH_FULL") &&
        out.getFileName.toString.endsWith(".json")) ||
        (try Files.exists(out) && Files.exists(full) &&
          Files.isSameFile(out, full)
        catch { case _: java.io.IOException => true })
    require(!clash,
      "refusing to write a filtered (SPARK_GRAFT_BENCH_ONLY) record " +
        "over BENCH_FULL.json — unset SPARK_GRAFT_BENCH_OUT or point " +
        "it elsewhere")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // AQE partition-coalescing floor (guide §2.2/§2.5): the default
    // 1 MB floor sizes post-shuffle partitions by BYTES, which on a
    // many-core box running CPU-per-row-heavy stages over small-byte
    // frames (hashing, shingling, similarity verify) coalesces a
    // 600 ms stage onto 1–2 tasks while the other cores idle —
    // measured −13 % warm total on the ten most CPU-bound catalog
    // queries at sf0.1 with a 64k floor, zero regressions. At
    // production scale post-shuffle partitions are ≫1 MB, so the
    // floor never binds — the setting is inert there (production
    // keeps the 1 MB default; OPTIMIZATION_r14.md justifies both).
    // Env-tunable so the driver's bench stays comparable across core
    // counts (the ceiling on tasks per stage is still
    // spark.sql.shuffle.partitions = $cpus).
    val aqeMinPart = sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "64k")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        aqeMinPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name filter for local iteration; the
    // driver never sets it, so driver runs always bench the catalog
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = selectNames(only, SparkEntry.queries.keys.toSeq.sorted)
      .toSet
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => selected.contains(n) }

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }

    // cold pass, catalog order
    val cold = catalog.map { case (name, fn) => name -> run(fn) }.toMap
    val coldTotal = cold.valuesIterator.filter(_ >= 0).sum
    val okCold = catalog.filter { case (n, _) => cold(n) >= 0 }

    // warm passes: each a different deterministic shuffle of the
    // catalog, GC'd between passes so one pass's debt doesn't bill
    // the next pass's first queries. Scratch is reclaimed at every
    // pass boundary: a full catalog pass leaves hundreds of
    // per-execution scratch tables (VersionedTable roots, materialized
    // intermediates) that otherwise accumulate until JVM exit — round
    // 10 measured the growing disk/page-cache footprint as a
    // consistent +11 % drag on the later passes' shared queries.
    // Session-cached artifacts (ModelCache-pinned paths) survive.
    // SPARK_GRAFT_BENCH_NO_RECLAIM=1 disables the pass-boundary sweep —
    // the A/B knob for measuring what scratch accumulation costs (never
    // set by the driver)
    val reclaim = !sys.env.get("SPARK_GRAFT_BENCH_NO_RECLAIM")
      .contains("1")
    val warmTimes = collection.mutable.Map.empty[String, List[Double]]
    val passTotals = collection.mutable.ListBuffer.empty[Double]
    def warmPass(rep: Int): Unit = {
      if (reclaim) graft.core.Scratch.reclaimEphemeral()
      System.gc()
      val order = new scala.util.Random(1000003L * rep).shuffle(okCold)
      passTotals += order.map { case (name, fn) =>
        val t = run(fn)
        warmTimes(name) = t :: warmTimes.getOrElse(name, Nil)
        math.max(t, 0.0)
      }.sum
      ()
    }
    (1 to reps).foreach(warmPass)
    // chaotic-window reaction (see bestTwoAgree): min-of-N can't
    // converge when N-1 passes land in a bad window — take extra
    // shuffled passes (≤ 3) until the two best pass totals agree
    // within 10 %, so committed records stay comparable across
    // windows. The count cap keeps a genuinely bistable box from
    // running forever, and the WALL-CLOCK budget ([[shouldRunExtra]])
    // keeps the extras inside whatever limit the driver runs the
    // bench under — round 12's driver record was rc 124 because a
    // 923-s chaos pass plus unbudgeted extras blew it. extra_passes /
    // extras_skipped_for_budget in the record say what happened
    val extraBudget = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_MAX_EXTRA_SEC", "600").toDouble
    val extrasT0 = System.nanoTime()
    var extras = 0
    def elapsedExtra = (System.nanoTime() - extrasT0) / 1e9
    while (shouldRunExtra(passTotals.toSeq, extras, elapsedExtra,
        extraBudget)) {
      extras += 1
      warmPass(reps + extras)
    }
    val extrasSkipped =
      if (!bestTwoAgree(passTotals.toSeq) && extras < 3 &&
        elapsedExtra >= extraBudget) 3 - extras
      else 0

    // per query: (warm min across passes, spread = max-min); a failed
    // warm run must read as a failure, not a fast time
    val results = catalog.map { case (name, _) =>
      val ts = warmTimes.getOrElse(name, Nil)
      if (cold(name) < 0 || ts.isEmpty || ts.contains(-1.0))
        (name, -1.0, 0.0)
      else (name, ts.min, ts.max - ts.min)
    }
    val spreadTotal = results.map(_._3).sum
    // total of per-query min over only the FIRST `reps` passes (lists
    // are built newest-first, so takeRight = the earliest passes):
    // extra passes lower min-of-N, so a record where the policy fired
    // reads systematically faster than a fixed-3-pass record — this
    // field keeps cross-round comparisons apples-to-apples (compare
    // first_reps totals against first_reps totals)
    val firstRepsTotal = catalog.map { case (name, _) =>
      val ts = warmTimes.getOrElse(name, Nil).takeRight(reps)
      if (cold(name) < 0 || ts.isEmpty || ts.contains(-1.0)) 0.0
      else ts.min
    }.sum
    val ratios = results.collect {
      case (_, m, s) if m > 0 => s / m
    }.sorted
    val medRatio =
      if (ratios.isEmpty) 0.0 else ratios(ratios.size / 2)

    // the driver captures only a ~2 KB tail of stdout: keep the whole
    // line under that by keying queries on their qNN prefix and
    // rounding times to ms (full names are in SparkEntry.queries)
    def ms(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + ms(v)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val header =
      s""""value":${ms(total)},"unit":"sec",""" +
      s""""cold_total_sec":${ms(coldTotal)},"reps":$reps,""" +
      s""""extra_passes":$extras,""" +
      s""""extras_skipped_for_budget":$extrasSkipped,""" +
      s""""first_reps_total_sec":${ms(firstRepsTotal)},""" +
      s""""classes_sha":"${classesSha()}",""" +
      s""""spread_sec":${ms(spreadTotal)},""" +
      s""""med_spread_over_min":${ms(medRatio)}"""
    println(s"""{"metric":"total",$header,"queries":$qs,""" +
      s""""sf":"$sfDir"}""")
    // the driver's stdout tail capture is lossy (~2 KB): ALSO write the
    // complete record — full query names, per-query min AND spread — to
    // a repo file so each round's bench is self-contained and phantom
    // per-query swings are self-diagnosing against the spread
    val full = results.map { case (k, v, s) =>
      s""""$k":{"sec":${ms(v)},"spread_sec":${ms(s)}}"""
    }.mkString("{", ",", "}")
    // per-pass totals expose within-run drift (a rising sequence on
    // byte-identical code = the run degrading as it goes — the exact
    // signal the pass-boundary scratch reclaim exists to flatten)
    val passJson = passTotals.map(ms).mkString("[", ",", "]")
    // an ONLY-filtered run must never clobber the committed
    // full-catalog record: a one-query isolated re-bench (the triage
    // rule's own tool) overwrote BENCH_FULL.json in rounds 8 AND 9,
    // shipping a single-query file as "the" bench record both times
    val defaultOut =
      if (only.isDefined) "BENCH_ISOLATED.json" else "BENCH_FULL.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    // ... and an explicit override can't re-open the hole (a lingering
    // BENCH_OUT env var from a prior full run + an ONLY filter is
    // exactly the clobber this guard exists for)
    guardOutFile(only.isDefined, outFile)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      s"""{"metric":"total",$header,"sf":"$sfDir",""" +
        s""""warm_pass_totals":$passJson,"queries":$full}""" + "\n")
    spark.stop()
  }
}

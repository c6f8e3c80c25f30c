package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's filter + clobber-guard logic, pure-function
  * tested (no Spark). Round 9's judge hit both holes live:
  * `SPARK_GRAFT_BENCH_ONLY=q139` silently produced an all-zero record,
  * and the clobber guard compared raw strings so `./BENCH_FULL.json`
  * slipped past it.
  */
class BenchHarnessSpec extends AnyFunSuite {
  private val names = Seq(
    "q139_bm25_incremental", "q140_bm25_forget", "q14_filter_defaults")

  test("ONLY filter matches the documented bare qNNN id") {
    assert(Bench.selectNames(Some(Set("q139")), names) ===
      Seq("q139_bm25_incremental"))
  }

  test("ONLY filter still matches a full query name") {
    assert(Bench.selectNames(Some(Set("q140_bm25_forget")), names) ===
      Seq("q140_bm25_forget"))
  }

  test("bare-id match is exact on the id, not a substring") {
    // q14 must not drag in q139/q140
    assert(Bench.selectNames(Some(Set("q14")), names) ===
      Seq("q14_filter_defaults"))
  }

  test("a filter matching zero queries fails loudly, not all-zero") {
    val e = intercept[IllegalArgumentException] {
      Bench.selectNames(Some(Set("q999")), names)
    }
    assert(e.getMessage.contains("matched zero"))
  }

  test("no filter keeps the whole catalog") {
    assert(Bench.selectNames(None, names) === names)
  }

  test("chaotic-window policy fires on disagreeing best-two totals") {
    // round 11's run A: [405, 277, 603] — best two (277, 405) are 46 %
    // apart: the window polluted two of three passes, min-of-3 can't
    // converge, extra passes are warranted
    assert(!Bench.bestTwoAgree(Seq(405.0, 277.0, 603.0)))
    // round 11's run B: [562, 240, 241] — best two agree to 0.4 %:
    // the two clean passes are the signal, no extra passes needed
    assert(Bench.bestTwoAgree(Seq(562.0, 240.0, 241.0)))
    // exactly at the bound is acceptance, just over is not
    assert(Bench.bestTwoAgree(Seq(100.0, 110.0)))
    assert(!Bench.bestTwoAgree(Seq(100.0, 110.1)))
    // degenerate inputs never divide by zero or loop the harness
    assert(!Bench.bestTwoAgree(Seq(100.0)))
    assert(!Bench.bestTwoAgree(Seq(0.0, 0.0)))
    assert(Bench.bestTwoAgree(Seq(0.0, 100.0, 101.0)),
      "all-failed passes (0 total) must not poison the comparison")
  }

  test("extras respect both the count cap and the wall-clock budget") {
    val chaos = Seq(405.0, 277.0, 603.0) // best-two disagree
    // inside budget + under cap + disagreement → run one more
    assert(Bench.shouldRunExtra(chaos, 0, 0.0, 600.0))
    assert(Bench.shouldRunExtra(chaos, 2, 599.9, 600.0))
    // count cap: never a 4th extra, however bad the window
    assert(!Bench.shouldRunExtra(chaos, 3, 0.0, 600.0))
    // wall-clock budget: round 12's driver bench timed out (rc 124)
    // because a 923-s chaos pass plus unbudgeted extras blew the
    // driver's limit — elapsed at/over budget stops the extras even
    // with disagreement remaining
    assert(!Bench.shouldRunExtra(chaos, 1, 600.0, 600.0))
    assert(!Bench.shouldRunExtra(chaos, 0, 1200.0, 600.0))
    // agreement stops extras regardless of budget headroom
    assert(!Bench.shouldRunExtra(Seq(562.0, 240.0, 241.0), 0, 0.0, 600.0))
  }

  test("classesSha fingerprints the running code deterministically") {
    // same JVM, same classes → same sha; a pair record carrying two
    // different shas benched different code and bench_pair.py refuses
    val a = Bench.classesSha()
    val b = Bench.classesSha()
    assert(a == b)
    assert(a == "unknown" || a.matches("[0-9a-f]{32}"),
      s"sha must be an MD5 hex or the documented fallback: $a")
    // under sbt the code source IS a directory, so the real path runs
    assert(a != "unknown", "expected a directory code source under sbt")
  }

  test("clobber guard rejects relative and dot-path aliases") {
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true, "BENCH_FULL.json")
    }
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true, "./BENCH_FULL.json")
    }
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true,
        java.nio.file.Paths.get("BENCH_FULL.json")
          .toAbsolutePath.toString)
    }
  }

  test("clobber guard allows other files and unfiltered full runs") {
    Bench.guardOutFile(onlySet = true, "BENCH_ISOLATED.json")
    Bench.guardOutFile(onlySet = false, "BENCH_FULL.json")
    Bench.guardOutFile(onlySet = false, "BENCH_FULL_r10.json")
  }

  test("clobber guard protects the immutable per-round pair records") {
    // BENCH_FULL_r{N}.json / _runA.json are committed run-pair
    // records — a filtered run must refuse them exactly like the
    // mutable latest
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true, "BENCH_FULL_r10.json")
    }
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true, "./BENCH_FULL_r10_runA.json")
    }
  }

  test("clobber guard rejects symlinks and out-of-cwd name aliases") {
    import java.nio.file.{Files => F, Paths}
    // ANY file named BENCH_FULL.json is a full-catalog record by
    // convention — an absolute path outside the cwd is still refused
    val dir = F.createTempDirectory("benchguard")
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true,
        dir.resolve("BENCH_FULL.json").toString)
    }
    // a SYMLINK named something else but pointing at the cwd's record
    // follows on write — only filesystem identity can see it
    val cwdRecord = Paths.get("BENCH_FULL.json").toAbsolutePath
    assume(F.exists(cwdRecord), "committed record expected in cwd")
    val link = dir.resolve("alias.json")
    try F.createSymbolicLink(link, cwdRecord)
    catch { case _: UnsupportedOperationException => cancel("no symlinks") }
    intercept[IllegalArgumentException] {
      Bench.guardOutFile(onlySet = true, link.toString)
    }
  }
}

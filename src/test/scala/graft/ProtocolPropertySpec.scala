package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.DedupLatest
import graft.sources.{IncrementalJdbc, JdbcWatermark}

/** Property tests promised in SURVEY.md §5: dedup-latest laws and the
  * incremental watermark protocol — no row lost, none duplicated,
  * across arbitrary batch boundaries, INCLUDING 7-digit fractional
  * timestamps (the DATETIME2(7) precision edge the reference lost rows
  * to, main.tex:150). The "database" is simulated by applying the
  * pushdown predicate to a local table with string-typed timestamps —
  * exactly what the remote engine would evaluate.
  *
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge artifact is not in the offline cache).
  */
class ProtocolPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // rows: (pk, updated_at_str with 7-digit fraction)
  private val rowGen: Gen[(Long, String)] = for {
    pk <- Gen.choose(1L, 500L)
    sec <- Gen.choose(0, 59)
    frac <- Gen.choose(0L, 9999999L) // 100ns units — sub-µs precision
  } yield (pk, f"2026-01-15T10:00:$sec%02d.$frac%07d")

  test("watermark protocol ingests everything exactly once (incl. " +
    "sub-microsecond timestamps)") {
    for (rows0 <- samples(Gen.listOfN(120, rowGen), 8)) {
      // one version per pk (a real source's pk+trigger guarantees this)
      val rows = rows0.groupBy(_._1).map(_._2.head).toSeq
      val table = rows.toDF("pk", "updated_str")
      var wm: Option[JdbcWatermark] = None
      var ingested = Vector.empty[(Long, String)]
      var rounds = 0
      var progressed = true
      while (progressed && rounds < 50) {
        val pred = wm.fold(lit(true))(w =>
          col("updated_str") > w.lastUpdatedAtStr ||
            (col("updated_str") === w.lastUpdatedAtStr &&
              col("pk") > w.lastPk))
        // cap = 37 rows per round, ordered like the DB would return
        val batch = table.filter(pred)
          .orderBy(col("updated_str"), col("pk")).limit(37)
        val got = batch.collect()
          .map(r => (r.getLong(0), r.getString(1)))
        progressed = got.nonEmpty
        ingested ++= got
        wm = IncrementalJdbc.nextWatermark(batch, "updated_str", "pk", wm)
        rounds += 1
      }
      assert(ingested.sorted == rows.sorted,
        s"loss or duplication across resumptions (wm=$wm)")
    }
  }

  private val versionGen: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(60, for {
      key <- Gen.choose(1, 15)
      v <- Gen.choose(1, 1000)
    } yield (key, v, s"payload-$v"))

  test("DedupLatest: latest-wins, exactly one row per key, idempotent") {
    for (rows <- samples(versionGen, 6) if rows.nonEmpty) {
      val df = rows.toDF("key", "version", "payload")
      val out = DedupLatest(df, Seq("key"),
        Seq(col("version").desc, col("payload").desc))
      val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val expected = rows.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).max
      }
      assert(got == expected)
      val again = DedupLatest(out, Seq("key"),
        Seq(col("version").desc, col("payload").desc))
      assert(again.count() == out.count())
    }
  }

  test("Upsert preserves key uniqueness under arbitrary batch splits") {
    for ((rows, i) <- samples(versionGen, 6).zipWithIndex
         if rows.nonEmpty) {
      val (b1, b2) = rows.splitAt((i * 13 + 7) % rows.length)
      val empty = Seq.empty[(Int, Int, String)]
        .toDF("key", "version", "payload")
      val order = Seq(col("version").desc, col("payload").desc)
      val afterB1 =
        if (b1.isEmpty) empty
        else graft.ops.Upsert(empty,
          b1.toDF("key", "version", "payload"), Seq("key"), order)
      val afterB2 =
        if (b2.isEmpty) afterB1
        else graft.ops.Upsert(afterB1,
          b2.toDF("key", "version", "payload"), Seq("key"), order)
      assert(afterB2.groupBy("key").count()
        .filter(col("count") > 1).count() == 0,
        "duplicate keys after upsert sequence")
      assert(afterB2.select("key").distinct().count() ==
        rows.map(_._1).distinct.length)
    }
  }
}

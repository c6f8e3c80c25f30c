package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.CmsState
import graft.ops.{Cdc, Sessionize}

/** Property laws for the round-2 operators, over arbitrary generated
  * inputs (raw ScalaCheck generators with fixed seeds — same
  * convention as ProtocolPropertySpec / PipelinePropertySpec).
  */
class OpsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // --- CDC law: distributed apply ≡ sequential per-key fold ------------

  private val logGen: Gen[List[(Long, String, Long, String)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(1L, 8L)
      op <- Gen.oneOf("I", "U", "D")
      seq <- Gen.choose(1L, 30L)
      v <- Gen.choose(0, 99).map(i => s"v$i")
    } yield (k, op, seq, v))

  test("cdc law: apply equals the per-key latest-op reference fold") {
    val base = (1L to 5L).map(k => (k, s"base$k")).toList
    for (log0 <- samples(logGen, 5)) {
      // the operator breaks (key, seq) ties deterministically by
      // (delete first, then op) but not by payload — feed at most one
      // row per (key, op, seq) so both sides are well-defined
      val log = log0.distinctBy(r => (r._1, r._2, r._3))
      val expected = {
        val latest = log.groupBy(_._1).view.mapValues { rows =>
          rows.maxBy(r => (r._3, if (r._2 == "D") 1 else 0,
            -r._2.charAt(0).toInt))
        }.toMap
        val deleted = latest.collect { case (k, (_, "D", _, _)) => k }.toSet
        val upserted = latest.collect {
          case (k, (_, op, _, v)) if op != "D" => k -> v }
        val kept = base.filterNot(b => deleted(b._1)).map { case (k, v) =>
          k -> upserted.getOrElse(k, v) }
        val inserts = upserted.filterNot(kv => base.exists(_._1 == kv._1))
        (kept ++ inserts).toMap
      }
      val got = Cdc.apply(base.toDF("k", "name"),
          log.toDF("k", "op", "seq", "name"), "k", "op", "seq",
          Seq("name"))
        .as[(Long, String)].collect().toMap
      assert(got == expected, s"log=$log")
    }
  }

  // --- sessionize law: distributed ≡ sequential gap splitting ----------

  private val eventsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(40, for {
      user <- Gen.choose(1L, 4L)
      tsSec <- Gen.choose(0L, 20000L)
      v <- Gen.choose(0, 50).map(_.toDouble)
    } yield (user, tsSec, v))

  test("sessionize law: sessions partition each user's events at gaps") {
    val gapSec = 1800L
    for (ev0 <- samples(eventsGen, 5)) {
      // unique (user, ts) so the reference order is unambiguous
      val ev = ev0.distinctBy(e => (e._1, e._2)).zipWithIndex.map {
        case ((u, ts, v), i) =>
          (i.toLong, new Timestamp(ts * 1000L), u, v)
      }
      val expected = ev.groupBy(_._3).view.mapValues { rows =>
        val sorted = rows.sortBy(r => (r._2.getTime, r._1))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Timestamp, Long, Double)]]) {
          case (acc, e) => acc match {
            case cur :: rest
              if e._2.getTime - cur.head._2.getTime <= gapSec * 1000L =>
                (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (s, i) =>
          (i + 1L, s.length.toLong, s.map(_._4).sum)
        }
      }.toMap
      val got = Sessionize.byGap(
          ev.toDF("event_id", "ts", "user_id", "value"),
          "user_id", "ts", "event_id", "value", gapSec)
        .select("user_id", "session_id", "n_events", "sum_value")
        .as[(Long, Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)
          .map(r => (r._2, r._3, r._4)).toList).toMap
      for ((user, exp) <- expected) {
        val g = got(user).map(s => (s._1, s._2, math.round(s._3 * 100)))
        val e = exp.map(s => (s._1, s._2, math.round(s._3 * 100)))
        assert(g == e, s"user $user: got $g expected $e")
      }
    }
  }

  // --- count-min law: estimates never undercount -----------------------

  private val multisetGen: Gen[List[Long]] =
    Gen.listOfN(300, Gen.choose(1L, 40L))

  test("cms law: estimate >= exact count for every key, total exact") {
    for (keys <- samples(multisetGen, 6)) {
      val st = new CmsState(4, 64) // small sketch → collisions likely
      keys.foreach(st.add)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      exact.foreach { case (k, c) =>
        assert(st.estimate(k) >= c, s"undercount for $k")
      }
      assert(st.total == keys.length.toLong)
    }
  }

  // --- containment vs jaccard: containment dominates -------------------

  private val setPairGen: Gen[(Set[Int], Set[Int])] = for {
    a <- Gen.listOfN(20, Gen.choose(0, 30)).map(_.toSet)
    b <- Gen.listOfN(20, Gen.choose(0, 30)).map(_.toSet)
  } yield (a, b)

  test("containment(a→b) >= jaccard(a,b) for non-empty a") {
    for ((a, b) <- samples(setPairGen, 50) if a.nonEmpty) {
      val inter = (a & b).size.toDouble
      val containment = inter / a.size
      val jaccard =
        if ((a | b).isEmpty) 1.0 else inter / (a | b).size
      assert(containment >= jaccard - 1e-12)
    }
  }
}

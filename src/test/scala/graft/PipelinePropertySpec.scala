package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Chunking
import graft.ops.{CorpusMix, Scd2}

/** Property laws for the training-data layout and history operators,
  * over arbitrary generated inputs (raw ScalaCheck generators with
  * fixed seeds — same convention as ProtocolPropertySpec).
  */
class PipelinePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // --- chunking: chunks reconstruct the token stream -------------------

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.choose(1L, 1000000L)
    n <- Gen.choose(0, 40)
    toks <- Gen.listOfN(n, Gen.choose(0, 99).map(i => s"w$i"))
  } yield (id, toks.mkString(" "))

  test("chunking law: de-overlapped chunks reconstruct every document") {
    val chunkSize = 7
    val overlap = 3
    val step = chunkSize - overlap
    for (docs0 <- samples(Gen.listOfN(25, docGen), 4)) {
      val docs = docs0.distinctBy(_._1)
      val out = Chunking.chunkTokens(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunkSize, overlap)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for ((id, text) <- docs) {
        val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
        val chunks = out.getOrElse(id, Array.empty)
        if (toks.isEmpty) assert(chunks.isEmpty, s"doc $id not empty")
        else {
          // chunk i contributes its first `step` tokens; the last
          // chunk contributes everything — the concatenation must be
          // exactly the original token stream
          val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
            val ct = c._3.split(" ").toSeq
            if (i == chunks.length - 1) ct else ct.take(step)
          }.toSeq
          assert(rebuilt == toks,
            s"doc $id: rebuilt $rebuilt != $toks")
        }
      }
    }
  }

  // --- packing: offsets are exclusive prefix sums ----------------------

  test("packing law: per-shard offsets are exact exclusive prefix sums") {
    for (docs0 <- samples(Gen.listOfN(60, docGen), 3)) {
      val docs = docs0.distinctBy(_._1)
      val budget = 16
      val out = Chunking.packSequences(docs.toDF("doc_id", "text"),
        "doc_id", "text", budget = budget, shards = 4)
        .select("doc_id", "n_tokens", "shard", "stream_offset",
          "offset_in_pack")
        .as[(Long, Long, Int, Long, Long)].collect()
      assert(out.length == docs.length)
      out.groupBy(_._3).foreach { case (_, rows) =>
        var expected = 0L
        rows.sortBy(_._1).foreach { r =>
          assert(r._4 == expected, s"doc ${r._1}: offset ${r._4} != " +
            s"$expected")
          assert(r._5 == expected % budget)
          expected += r._2
        }
      }
    }
  }

  // --- SCD2: intervals partition each key's history ---------------------

  private val eventGen: Gen[(Long, Int, String)] = for {
    eid <- Gen.choose(1L, 100000L)
    key <- Gen.choose(1, 5)
    attr <- Gen.oneOf("a", "b", "c")
  } yield (eid, key, attr)

  test("scd2 laws: counts conserve, intervals chain, one current per key") {
    for (events0 <- samples(Gen.listOfN(80, eventGen), 4)) {
      val events = events0.distinctBy(_._1).zipWithIndex.map {
        case ((eid, key, attr), i) =>
          (eid, new Timestamp(1700000000000L + (i % 37) * 1000L),
            key, attr)
      }
      val df = events.toDF("event_id", "ts", "user_id", "event_type")
      val hist = Scd2.fromEventLog(df, "user_id", "event_type", "ts",
        "event_id")
        .select("user_id", "event_type", "valid_from", "valid_to",
          "n_events", "is_current")
        .as[(Int, String, Timestamp, Option[Timestamp], Long, Boolean)]
        .collect()
      // conservation: every event lands in exactly one interval
      assert(hist.map(_._5).sum == events.length)
      hist.groupBy(_._1).foreach { case (key, runs0) =>
        val runs = runs0.sortBy(r => (r._3.getTime, r._4.map(_.getTime)
          .getOrElse(Long.MaxValue)))
        // exactly one open (current) interval per key, and it is last
        assert(runs.count(_._6) == 1, s"key $key: != 1 current run")
        assert(runs.last._6, s"key $key: current run not last")
        // intervals chain: valid_to == next valid_from
        runs.sliding(2).foreach {
          case Array(prev, next) =>
            assert(prev._4.contains(next._3),
              s"key $key: gap between ${prev._4} and ${next._3}")
          case _ => ()
        }
      }
    }
  }

  // --- corpus mix: kept ⊆ input, binding source whole -------------------

  test("mix law: binding source kept whole, kept tokens never exceed input") {
    val srcGen: Gen[(Long, String, String)] = for {
      id <- Gen.choose(1L, 1000000L)
      src <- Gen.oneOf("x", "y", "z")
      n <- Gen.choose(1, 20)
    } yield (id, (1 to n).map(_ => "tok").mkString(" "), src)
    for (docs0 <- samples(Gen.listOfN(90, srcGen), 3)) {
      val docs = docs0.distinctBy(_._1)
      val targets = Map("x" -> 0.5, "y" -> 0.3, "z" -> 0.2)
      val in = docs.toDF("doc_id", "text", "source")
      val kept = CorpusMix.mixToTokenTargets(in, "doc_id", "text",
        "source", targets)
        .select("doc_id", "source", "n_tokens")
        .as[(Long, String, Long)].collect()
      val inIds = docs.map(_._1).toSet
      assert(kept.forall(k => inIds.contains(k._1)))
      val inToks = docs.groupBy(_._3).view
        .mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
      val keptToks = kept.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toMap
      for ((s, t) <- keptToks) assert(t <= inToks(s))
      // the binding source (max tokens/share ratio is NOT it — the MIN
      // toks/share source binds) is kept in full
      val binding = targets.keys.filter(inToks.contains)
        .minByOption(s => inToks(s) / targets(s))
      binding.foreach { b =>
        assert(keptToks.getOrElse(b, 0L) == inToks(b),
          s"binding source $b not fully kept")
      }
    }
  }

  test("upsample law: per-doc copies ∈ {⌊f⌋, ⌈f⌉}, realized rate ≈ f, " +
      "deterministic") {
    val srcGen: Gen[(Long, String, String)] = for {
      id <- Gen.choose(1L, 1000000L)
      src <- Gen.oneOf("x", "y")
    } yield (id, "tok tok", src)
    val factors = Map("x" -> 2.25, "y" -> 0.5)
    for (docs0 <- samples(Gen.listOfN(400, srcGen), 2)) {
      val docs = docs0.distinctBy(_._1)
      val in = docs.toDF("doc_id", "text", "source")
      val out = CorpusMix.upsample(in, "doc_id", "source", factors)
        .as[(Long, String, Int)].collect()
      val copies = out.groupBy(_._1).view.mapValues(_.length).toMap
      val bySrc = docs.map(d => d._1 -> d._3).toMap
      for ((id, n) <- copies) {
        val f = factors(bySrc(id))
        assert(n == math.floor(f).toInt || n == math.ceil(f).toInt,
          s"doc $id got $n copies for factor $f")
      }
      // realized rate within a few σ of f (256-bucket coin over N docs)
      for ((s, f) <- factors) {
        val n = docs.count(_._3 == s)
        if (n > 50) {
          val made = out.count(_._2 == s).toDouble / n
          assert(math.abs(made - f) < 0.3, s"source $s rate $made vs $f")
        }
      }
      // copy_idx is dense 1..n per doc, and reruns agree exactly
      for ((id, rows) <- out.groupBy(_._1))
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      val again = CorpusMix.upsample(in, "doc_id", "source", factors)
        .as[(Long, String, Int)].collect()
      assert(out.sorted.toSeq == again.sorted.toSeq)
    }
  }
}

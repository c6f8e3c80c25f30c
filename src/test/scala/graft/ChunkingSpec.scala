package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkTokens windows overlap correctly and cover every token") {
    // 10 tokens, chunkSize 4, overlap 2 -> starts 0,2,4,6,8
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "doc_id", "text", 4, 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_chunk_tokens")
      .as[(Int, String, Int)].collect()
    assert(out.length == 5)
    assert(out(0) == ((0, "t1 t2 t3 t4", 4)))
    assert(out(1) == ((1, "t3 t4 t5 t6", 4)))
    assert(out(4) == ((4, "t9 t10", 2))) // short tail chunk
  }

  test("chunkTokens plans zero shuffles (pure explode)") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val df = Chunking.chunkTokens(docs, "doc_id", "text", 4, 2)
    assert(PlanAsserts.countShuffles(df) == 0,
      s"chunking must stay narrow:\n${df.queryExecution.executedPlan}")
  }

  test("chunkTokens: empty docs yield no chunks, short docs one chunk") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "only two"))
      .toDF("doc_id", "text")
    val out = Chunking.chunkTokens(docs, "doc_id", "text", 64, 16)
      .select("doc_id", "n_chunk_tokens").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((3L, 2)))
  }

  test("packSequences rejects non-integral id columns") {
    val docs = Seq(("doc-a", "w w w")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Chunking.packSequences(docs, "doc_id", "text", 10, 4)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("packSequences: offsets are contiguous per shard, packs respect budget") {
    val docs = (1L to 40L)
      .map(i => (i, (1 to (i % 7 + 3).toInt).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.packSequences(docs, "doc_id", "text",
      budget = 10, shards = 4)
      .select("doc_id", "n_tokens", "shard", "stream_offset", "pack_id",
        "offset_in_pack", "spans_boundary")
      .as[(Long, Long, Int, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
    // per shard: offsets are the running sum of preceding docs
    out.groupBy(_._3).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var expect = 0L
      sorted.foreach { r =>
        assert(r._4 == expect, s"doc ${r._1}: offset ${r._4} != $expect")
        expect += r._2
      }
    }
    // pack bookkeeping is self-consistent
    out.foreach { r =>
      assert(r._5 == r._3.toLong * (1L << 40) + r._4 / 10)
      assert(r._6 == r._4 % 10)
      assert(r._7 == (r._6 + r._2 > 10))
    }
    // packing is deterministic under repartition
    val again = Chunking.packSequences(docs.repartition(7), "doc_id",
      "text", budget = 10, shards = 4)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._5)).toSet)
  }
}

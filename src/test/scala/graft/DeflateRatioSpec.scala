package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Deflate

/** Compression-ratio signal: no DuckDB oracle exists (no deflate in
  * SQL), so the correctness surface is the lossless-roundtrip law
  * against the independent Inflater decode plus the signal's ordering
  * invariants — not absolute lengths, which are zlib-build-specific. */
class DeflateRatioSpec extends SparkTestBase {
  import spark.implicits._

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(b.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        assert(n > 0 || inf.finished(), "truncated deflate stream")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  test("roundtrip law: inflate(deflate(x)) == x, arbitrary bytes") {
    val gen = Gen.choose(0, 4000).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    for (i <- 0 until 25) {
      val bytes = gen.pureApply(Gen.Parameters.default, Seed(i)).toArray
      assert(inflate(Deflate.deflate(bytes)).toSeq === bytes.toSeq,
        s"seed=$i len=${bytes.length}")
    }
  }

  test("deterministic, and repetitive text compresses below prose") {
    val rep = "spam " * 400
    val prose = (0 until 400).map(i =>
      s"w${(i * 2654435761L) % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, prose)).toDF("id", "t")
      .select(col("id"), Deflate.column(col("t")).as("len"),
        Deflate.ratio(col("t")).as("r"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(rows(1L)._2 < 0.1, s"repetitive ratio ${rows(1L)._2}")
    assert(rows(2L)._2 > rows(1L)._2 * 3)
    // determinism: a second evaluation yields identical lengths
    val again = Seq((1L, rep), (2L, prose)).toDF("id", "t")
      .select(col("id"), Deflate.column(col("t")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again(1L) === rows(1L)._1 && again(2L) === rows(2L)._1)
  }

  test("empty string: length measured, ratio NULL; null stays null") {
    val df = Seq((1L, Some("")), (2L, Option.empty[String]))
      .toDF("id", "t")
      .select(col("id"), Deflate.column(col("t")).as("len"),
        Deflate.ratio(col("t")).as("r"))
    val rows = df.collect()
    val empty = rows.find(_.getLong(0) == 1L).get
    assert(!empty.isNullAt(1) && empty.getInt(1) > 0) // empty block
    assert(empty.isNullAt(2))
    val nul = rows.find(_.getLong(0) == 2L).get
    assert(nul.isNullAt(1) && nul.isNullAt(2))
  }

  test("multi-byte UTF-8 measured over bytes, not chars") {
    val s = "héllo wörld ünïcode " * 50
    val got = Seq(Tuple1(s)).toDF("t")
      .select(Deflate.column(col("t"))).collect().head.getInt(0)
    assert(got === Deflate.deflate(s.getBytes("UTF-8")).length)
  }

  test("registered for plain SQL as deflate_len") {
    graft.sql.GraftSql.registerFunctions(spark)
    val r = spark.sql(
      "SELECT deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS l")
      .collect().head.getInt(0)
    assert(r > 0 && r < 24)
  }
}

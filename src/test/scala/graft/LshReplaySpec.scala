package graft

/** In-JVM independent replay of the three LSH hash fixture dumps
  * (q103 SimHash64, q104 MinHash band signatures, q105 hyperplane
  * buckets) — the JpegDecodeSpec discipline applied to the hash
  * families the DuckDB oracle cannot replicate.
  *
  * The production path runs these as codegen'd Catalyst expressions
  * over Tungsten UTF8String/ArrayData buffers across 32 threads; this
  * spec recomputes every row single-threaded in plain Scala over
  * java.lang.String / Array[Byte], with the hash primitives
  * re-implemented from their PUBLISHED definitions:
  *
  *  - MurmurHash3 x86_32 — Austin Appleby's public-domain reference
  *    (github.com/aappleby/smhasher), including Spark's documented
  *    deviation for unaligned tails (each trailing byte mixed as its
  *    own sign-extended k1 — see the "not compatible with original"
  *    note in org.apache.spark.unsafe.hash.Murmur3_x86_32);
  *  - xxHash64 — Yann Collet's spec
  *    (github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md);
  *  - splitmix64 — Steele/Lea/Flood, JDK SplittableRandom constants;
  *  - the 64-bit murmur3 finalizer (fmix64) — Appleby again.
  *
  * Agreement of the two paths on every (doc, band) / (vec, table) at
  * sf0.001 pins the distributed dumps to an independent computation:
  * a codegen bug, a UTF8String byte-order slip, or a partition-
  * dependent evaluation would break the comparison. Downstream
  * consumers (banding join, hamming verify, cosine verify) were
  * already oracle-checked from these dumps (q24/q25/q30); this closes
  * the raw-hash gap the round-12 verdict listed as the one remaining
  * upgrade with real value.
  */
class LshReplaySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // ---- published hash primitives, re-implemented ---------------------

  /** MurmurHash3 x86_32 over `bytes` with Spark's tail handling. */
  private def murmur3(bytes: Array[Byte], seed: Int): Int = {
    def mixK1(k0: Int): Int = {
      var k = k0 * 0xcc9e2d51
      k = Integer.rotateLeft(k, 15)
      k * 0x1b873593
    }
    def mixH1(h0: Int, k1: Int): Int = {
      var h = h0 ^ k1
      h = Integer.rotateLeft(h, 13)
      h * 5 + 0xe6546b64
    }
    var h1 = seed
    val aligned = bytes.length - bytes.length % 4
    var i = 0
    while (i < aligned) {
      val k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      h1 = mixH1(h1, mixK1(k))
      i += 4
    }
    // Spark deviation: each tail byte is its own (sign-extended) k1
    while (i < bytes.length) {
      h1 = mixH1(h1, mixK1(bytes(i).toInt))
      i += 1
    }
    var h = h1 ^ bytes.length
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  private def xxFmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2
    h ^= h >>> 29; h *= P3
    h ^ (h >>> 32)
  }

  /** xxHash64 over `bytes` (little-endian lanes, per the spec). */
  private def xxh64(bytes: Array[Byte], seed: Long): Long = {
    def getLong(i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (bytes(i + j) & 0xffL); j -= 1 }
      v
    }
    def round(acc: Long, in: Long): Long =
      java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
    val len = bytes.length
    var i = 0
    var hash =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, getLong(i)); v2 = round(v2, getLong(i + 8))
          v3 = round(v3, getLong(i + 16)); v4 = round(v4, getLong(i + 24))
          i += 32
        }
        var h = java.lang.Long.rotateLeft(v1, 1) +
          java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) +
          java.lang.Long.rotateLeft(v4, 18)
        def merge(hh: Long, v: Long): Long = (hh ^ round(0L, v)) * P1 + P4
        h = merge(h, v1); h = merge(h, v2); h = merge(h, v3); merge(h, v4)
      } else seed + P5
    hash += len
    while (i + 8 <= len) {
      hash ^= round(0L, getLong(i))
      hash = java.lang.Long.rotateLeft(hash, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      val in = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      hash ^= in * P1
      hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      hash ^= (bytes(i) & 0xffL) * P5
      hash = java.lang.Long.rotateLeft(hash, 11) * P1
      i += 1
    }
    xxFmix(hash)
  }

  /** xxHash64 of a 4-byte int lane — what Spark's `xxhash64(...)`
    * applies to an IntegerType child, seeded by the running hash. */
  private def xxh64Int(input: Int, seed: Long): Long = {
    var hash = seed + P5 + 4L
    hash ^= (input & 0xffffffffL) * P1
    hash = java.lang.Long.rotateLeft(hash, 23) * P2 + P3
    xxFmix(hash)
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^ (k >>> 33)
  }

  // ---- the replayed pipelines ---------------------------------------

  /** TextFunctions.tokens(lower(text)) replayed: Spark's trim strips
    * ASCII space (0x20) ONLY (not \t/\n, unlike java.lang.String
    * .trim), and StringSplit uses Java-regex split with limit -1
    * (keeps trailing empties). */
  private def tokens(text: String): Array[String] = {
    val lower = text.toLowerCase
    var a = 0
    var b = lower.length
    while (a < b && lower.charAt(a) == ' ') a += 1
    while (b > a && lower.charAt(b - 1) == ' ') b -= 1
    val t = lower.substring(a, b)
    if (t.isEmpty) Array.empty[String] else t.split("\\s+", -1)
  }

  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def refSimhash(text: String): Long = {
    val votes = new Array[Int](64)
    tokens(text).foreach { tok =>
      val b = utf8(tok)
      val h = (murmur3(b, 42).toLong << 32) |
        (murmur3(b, 7).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** WordShingles semantics: n-grams joined by " "; fewer than n
    * tokens (including zero) collapse to ONE shingle = the whole
    * token list joined. */
  private def shingles(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toArray

  /** MinHashSignature semantics: Kirsch–Mitzenmacher double hashing
    * (h1 seed 42, h2 seed 7 forced odd; int hashes SIGN-extended to
    * long) with fmix64 finalizing each probe. */
  private def refMinhash(sh: Array[String], k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    sh.foreach { s =>
      val b = utf8(s)
      val h1 = murmur3(b, 42).toLong
      val h2 = murmur3(b, 7).toLong | 1L
      var h = h1
      var j = 0
      while (j < k) {
        val v = fmix64(h)
        if (v < mins(j)) mins(j) = v
        h += h2
        j += 1
      }
    }
    mins
  }

  /** lshBands semantics: band b hashes `xxhash64(concat_ws("_",
    * slice(sig, b·r+1, r)), b)` — Spark's multi-child xxhash64 starts
    * at seed 42, hashes the string child's UTF-8 bytes, then chains
    * the int child through the running hash. */
  private def refBandHashes(sig: Array[Long], bands: Int, r: Int)
      : Seq[(Int, Long)] =
    (0 until bands).map { b =>
      val s = sig.slice(b * r, b * r + r).map(_.toString).mkString("_")
      b -> xxh64Int(b, xxh64(utf8(s), 42L))
    }

  /** HyperplaneLsh semantics: plane(j)(d) = splitmix64(seed·1000003 +
    * j·8191 + d) / Long.MaxValue; bit j = sign of the sequential dot
    * product (floats widened to double). */
  private def refBucket(vec: Array[Float], bits: Int, seed: Int): Long = {
    var out = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var d = 0
      while (d < vec.length) {
        val h = splitmix64(seed.toLong * 1000003L + j.toLong * 8191L + d)
        acc += vec(d).toDouble * (h.toDouble / Long.MaxValue.toDouble)
        d += 1
      }
      if (acc > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  // ---- fixtures vs replay -------------------------------------------

  private lazy val docs: Array[(Long, String)] =
    graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

  test("q103 simhash fixture matches the single-threaded replay " +
    "on every document") {
    val expected = docs.map { case (id, t) => id -> refSimhash(t) }.toMap
    val got = SparkEntry.queries("q103_simhash_fixture")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
      .toMap
    assert(got.size == expected.size && expected.size == 500)
    val diff = expected.keys.filter(k => got(k) != expected(k))
    assert(diff.isEmpty,
      s"simhash mismatch on doc_ids ${diff.take(5).mkString(",")}")
  }

  test("q104 minhash band fixture matches the single-threaded replay " +
    "on every (doc, band)") {
    val expected = docs.flatMap { case (id, t) =>
      val sig = refMinhash(shingles(tokens(t), 3), 64)
      refBandHashes(sig, bands = 16, r = 4).map { case (b, h) =>
        (id, b) -> h
      }
    }.toMap
    val got = SparkEntry.queries("q104_minhash_band_fixture")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band")) ->
        r.getAs[Long]("band_hash"))
      .toMap
    assert(got.size == expected.size && expected.size == 500 * 16)
    val diff = expected.keys.filter(k => got(k) != expected(k))
    assert(diff.isEmpty,
      s"band hash mismatch at ${diff.take(5).mkString(",")}")
  }

  test("q105 hyperplane bucket fixture matches the single-threaded " +
    "replay on every (vec, table)") {
    val vecs = graft.core.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray)
    val expected = vecs.flatMap { case (id, v) =>
      (0 until 8).map(t => (id, t) -> refBucket(v, bits = 8, seed = 42 + t))
    }.toMap
    val got = SparkEntry.queries("q105_lsh_bucket_fixture")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("tbl")) ->
        r.getAs[Long]("bucket"))
      .toMap
    assert(got.size == expected.size && expected.size == 500 * 8)
    val diff = expected.keys.filter(k => got(k) != expected(k))
    assert(diff.isEmpty,
      s"bucket mismatch at ${diff.take(5).mkString(",")}")
  }
}

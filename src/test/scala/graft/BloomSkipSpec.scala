package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{ManifestStats, VersionedTable}
import graft.functions.BloomState

/** Bloom file-skipping: the no-false-negative law is the correctness
  * surface (a skipped file holding the key would silently drop rows);
  * pruning effectiveness is the reason the sidecar exists. */
class BloomSkipSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("bloom").toString
    graft.core.Scratch.registerForCleanup(d)
    d
  }

  test("state: no false negatives, live and serialized") {
    val keyGen = Gen.choose(Long.MinValue, Long.MaxValue)
    val keys = Gen.listOfN(500, keyGen)
      .pureApply(Gen.Parameters.default, Seed(7L))
    val st = new BloomState(1 << 14, 6)
    keys.foreach(st.add)
    val ser = st.serialize()
    keys.foreach { k =>
      assert(st.mightContain(k), s"live miss on $k")
      assert(BloomState.mightContainSerialized(ser, k),
        s"serialized miss on $k")
    }
    assert(BloomState.countSerialized(ser) === 500L)
    val rt = BloomState.deserialize(ser)
    assert(keys.forall(rt.mightContain))
  }

  test("state: false-positive rate is in the designed envelope") {
    val st = new BloomState(1 << 14, 6)   // 16K bits, 1000 keys
    (0L until 1000L).foreach(st.add)
    // design fp ≈ (1 - e^(-kn/m))^k ≈ 2.4% here; allow 3x slack
    val fp = (100000L until 110000L).count(st.mightContain)
    assert(fp < 750, s"fp=$fp of 10000 probes")
  }

  test("state: merge is bitwise union") {
    val a = new BloomState(1 << 10, 4); val b = new BloomState(1 << 10, 4)
    (0L until 50L).foreach(a.add)
    (50L until 100L).foreach(b.add)
    a.merge(b)
    assert((0L until 100L).forall(a.mightContain))
    assert(a.count === 100L)
    val odd = new BloomState(1 << 11, 4)
    intercept[IllegalArgumentException](a.merge(odd))
  }

  test("manifest: present keys keep their file, absent keys prune all") {
    val dir = tmp() + "/t"
    (0L until 400L).map(i => (i, s"row$i")).toDF("k", "payload")
      .repartition(8, col("k"))
      .write.parquet(dir)
    val manifest = ManifestStats.buildBloomFiles(spark, Seq(dir), "k")
    val total = manifest.count()
    assert(total === 8L)
    // every present key must survive pruning AND return its row
    for (k <- Seq(0L, 17L, 399L)) {
      val kept = ManifestStats.pruneFilesPoint(manifest, "k", Seq(k))
      assert(kept.nonEmpty, s"no-false-negative broken for $k")
      val rows = ManifestStats.readPoint(spark, manifest, "k", Seq(k))
        .filter(col("k") === k).collect()
      assert(rows.length === 1 && rows.head.getString(1) === s"row$k")
      assert(kept.size < 8, s"no skipping for $k: kept all 8 files")
    }
    // absent keys: with 2^20 bits over ~50 keys/file the fp chance is
    // astronomically small, and the probe is deterministic — 0 files
    assert(ManifestStats.pruneFilesPoint(manifest, "k",
      Seq(123456789L)).isEmpty)
    // multi-key probe = union of per-key survivors
    val multi = ManifestStats.pruneFilesPoint(manifest, "k",
      Seq(0L, 399L)).toSet
    assert(ManifestStats.pruneFilesPoint(manifest, "k", Seq(0L))
      .toSet.subsetOf(multi))
  }

  test("manifest: non-integral key column is rejected") {
    val dir = tmp() + "/t"
    Seq(("a", 1L)).toDF("k", "v").write.parquet(dir)
    val e = intercept[IllegalArgumentException](
      ManifestStats.buildBloomFiles(spark, Seq(dir), "k"))
    assert(e.getMessage.contains("integral"))
  }

  test("versioned table: sidecar lookup equals the plain filter") {
    val root = tmp()
    val base = s"$root/t"
    val df = (0L until 300L).map(i => (i, i % 7)).toDF("id", "grp")
    VersionedTable.commitAppend(df.repartition(6, col("id")), base)
    VersionedTable.publishBloom(spark, base, "id")
    for (keys <- Seq(Seq(5L), Seq(5L, 250L), Seq(999L))) {
      val got = VersionedTable.readPointLookup(spark, base, "id", keys)
        .filter(col("id").isin(keys: _*)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = df.filter(col("id").isin(keys: _*)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === want.toSeq, s"keys=$keys")
    }
  }

  test("versioned table: lookup without a published sidecar still works") {
    val root = tmp()
    val base = s"$root/t"
    VersionedTable.commitAppend(
      (0L until 50L).map(i => (i, s"p$i")).toDF("id", "p"), base)
    val rows = VersionedTable.readPointLookup(spark, base, "id", Seq(7L))
      .filter(col("id") === 7L).collect()
    assert(rows.length === 1 && rows.head.getString(1) === "p7")
  }

  test("versioned table: sidecar is version-pinned") {
    val root = tmp()
    val base = s"$root/t"
    VersionedTable.commitAppend(Seq((1L, "v1")).toDF("id", "p"), base)
    VersionedTable.publishBloom(spark, base, "id")
    VersionedTable.commitAppend(Seq((2L, "v2")).toDF("id", "p"), base)
    // v2 has no sidecar: the lookup builds on the fly and sees BOTH
    // rows; pinning v1 sees only the old one
    assert(VersionedTable.readPointLookup(spark, base, "id", Seq(2L))
      .filter(col("id") === 2L).count() === 1L)
    assert(VersionedTable.readPointLookup(spark, base, "id", Seq(2L),
      version = Some(1)).filter(col("id") === 2L).count() === 0L)
  }
}

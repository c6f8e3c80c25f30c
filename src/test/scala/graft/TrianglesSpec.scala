package graft

import org.apache.spark.sql.functions._

import graft.ops.Triangles

/** Degree-oriented triangle counting vs the brute-force definition. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute force: all node triples with all three edges present. */
  private def naive(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((a, c)) && es((b, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("K4: four triangles, every node in three") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = run(k4)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("path and star graphs have no triangles") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(run((2L to 10L).map(i => (1L, i))).isEmpty)
  }

  test("reversed and duplicate edges canonicalize away") {
    // triangle {1,2,3} given with mixed orientation and repeats
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graph matches brute force (degree ties included)") {
    val rnd = new scala.util.Random(11)
    val edges = (for (_ <- 1 to 120)
      yield (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }
    assert(run(edges) == naive(edges))
  }

  test("hub skew: a wheel graph counts rim triangles once each") {
    // hub 0 connected to rim 1..8, rim is a cycle: 8 triangles, hub in
    // all of them, each rim node in two (its two adjacent spokes)
    val rim = (1L to 8L).map(i => (i, if (i == 8) 1L else i + 1))
    val spokes = (1L to 8L).map(i => (0L, i))
    val got = run(rim ++ spokes)
    assert(got(0L) == 8L)
    assert((1L to 8L).forall(got(_) == 2L))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree orientation — the graph
  * statistic behind clustering-coefficient / community diagnostics on
  * co-occurrence graphs (parts bought together, domains linking each
  * other).
  *
  * The naive wedge join (`edges ⋈ edges` on the shared endpoint) blows
  * up on hubs: a degree-d node emits d² wedges, and real co-occurrence
  * graphs are power-law. Degree orientation is the classic fix (node
  * ordering by `(degree, id)`, every edge directed small→large): each
  * node's OUT-degree is bounded by O(√m) regardless of its true degree,
  * so total wedges are O(m^1.5) worst case and the hub skew never lands
  * on one reducer. Each triangle is then counted exactly once — at its
  * lowest-ordered vertex.
  *
  * Shape at scale: one aggregation for degrees, two shuffle joins to
  * attach them, one self-join on the wedge apex (out-degree-bounded),
  * one semi-ish join against the oriented edge set to close the wedge.
  * All keys are node ids — AQE handles residual skew.
  */
object Triangles {

  /** Per-node triangle participation counts over an undirected simple
    * graph. `edges` must be distinct with `u < v` (canonical form);
    * rows violating that are canonicalized and deduped defensively.
    * Returns (node, n_tri) for every node in at least one triangle;
    * each triangle contributes 1 to each of its three corners.
    */
  def perNode(edges: DataFrame, u: String = "u", v: String = "v")
      : DataFrame = {
    // materialize the canonical edge set ONCE: the plan below references
    // it ~6 times (degrees twice, orientation once, wedge sides twice,
    // closing join once), and Spark re-executes the caller's — typically
    // corpus-sized — edge derivation per reference. The edge LIST is the
    // bounded object here (a thresholded co-occurrence graph is sparse),
    // so a durable scratch write beats pinning executor storage
    val e = graft.core.Scratch.materialize(
      edges
        .select(least(col(u), col(v)).as("u"),
          greatest(col(u), col(v)).as("v"))
        .filter(col("u") < col("v"))
        .distinct(),
      "triangle_edges")

    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    // orient every edge from the smaller to the larger endpoint under
    // the total order (deg, id) — ties on degree break by id
    val withDeg = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    // materialized like `e`: the plan references `oriented` THREE
    // times (both wedge sides + the closing join) and Spark re-executes
    // the degree aggregation + two attach joins per reference — the
    // round-13 before-plan showed the whole deg⋈e⋈deg subtree inlined
    // 3× (97-node plan). One edge-list-sized scratch write replaces
    // two redundant recomputes; same bounded-object argument as `e`.
    val oriented = graft.core.Scratch.materialize(withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("u")).otherwise(col("v")).as("src"),
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("v")).otherwise(col("u")).as("dst"),
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        col("dv")).otherwise(col("du")).as("ddst")),
      "triangle_oriented")

    // wedges at apex s: out-neighbors a ≺ b under (deg, id); the closing
    // edge, if present, is oriented a→b under the same order
    val a = oriented.select(col("src"), col("dst").as("a"), col("ddst").as("da"))
    val b = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
    val wedges = a.join(b, "src")
      .filter(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")))
    val tris = wedges.join(
      oriented.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"))

    tris.select(explode(array(col("src"), col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }
}

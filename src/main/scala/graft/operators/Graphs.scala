package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. PageRank is the classic
  * quality-weighting signal over a web crawl's link graph (the seed
  * quality score of the original Common-Crawl-style pipelines): documents
  * linked from many high-rank documents get high rank, and the rank feeds
  * sampling weights (p4/p7) or quality thresholds (t3).
  *
  * 100 TB shape: pure dataflow iteration — each round is
  * `ranks ⋈ edges on src` (shuffle partitioned by src) →
  * `groupBy(dst).sum` (shuffle by dst, partial-aggregated map-side) →
  * left join back onto the node list so zero-in-degree nodes keep the
  * teleport mass. Per-round cost is O(|E|); no driver-side state beyond
  * the loop counter, and `localCheckpoint` caps the growing plan lineage
  * exactly as the connected-components loops do (d6/d10). Unlike
  * label-propagation CC there is no convergence shortcut — rounds are a
  * fixed hyperparameter (curation pipelines run 3–10).
  *
  * Determinism: ranks are FIXED-POINT integers in units of 1e-9 (the
  * t13/t14 round-9 contract taken to its logical end for an ITERATED
  * computation, where compounding float-rounding divergence across
  * engines is a real risk — a 5-iteration double pipeline was measured
  * drifting 3e-9 between two engines' `round` conventions). Every step
  * is 64-bit integer arithmetic: contribution = rank_u / out_deg
  * (floor), damping = (permille · sum) / 1000 (floor) — so the result
  * is bit-identical under any partitioning, merge order, or SQL engine,
  * and the DuckDB oracle replays it exactly. The floor quantization
  * leaks ≤ 1e-9 of mass per edge per round — invisible at the 4th
  * decimal anyone consumes, and a fair trade for exact replayability.
  */
object Graphs {

  val Scale: Long = 1000000000L // 1e9 rank units per unit mass

  /** `iterations` rounds of damped PageRank over `edges(src, dst)`.
    * `nodes` must contain every vertex id once (column `id`); parallel
    * edges are honored (each contributes). Returns (id, rank_units
    * BIGINT fixed-point 1e-9, rank DOUBLE = rank_units/1e9). Initial
    * rank = Scale/N units; teleport = (Scale/N)·(1000−dampingPermille)
    * /1000. Dangling nodes redistribute nothing — their mass drains to
    * the teleport term (the power-iteration variant without the
    * dangling-mass correction; the oracle replays the same convention).
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      iterations: Int = 5,
      dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations $iterations out of range [1, 100]")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille $dampingPermille out of range [0, 1000]")

    val n = nodes.select(col("id")).distinct().count()
    require(n > 0 && n <= Scale, s"node count $n out of range [1, $Scale]")
    val init = Scale / n
    val teleport = init * (1000L - dampingPermille) / 1000L

    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("_deg"))
    val scope = Lineage.scope(nodes.sparkSession)
    try {
      // edges ⋈ out-degree once, outside the loop: the per-round join
      // then carries (src, dst, _deg) against the rank frame. Pinned in
      // the scope for the whole loop; freed by close().
      val withDeg = edges.join(outDeg, Seq("src"))
        .transform(scope.cut(_, eager = false))

      var ranks = nodes.select(col("id"), lit(init).as("rank_units"))
      var i = 0
      while (i < iterations) {
        val next = round(nodes, withDeg, ranks, teleport, dampingPermille)
          .transform(scope.cut(_, eager = false))
        scope.free(ranks) // superseded round's checkpoint files
        ranks = next
        i += 1
      }
      scope.handOff(ranks) // result-backing checkpoint outlives the scope
        .select(col("id"), col("rank_units"),
          (col("rank_units").cast("double") / Scale.toDouble).as("rank"))
    } finally scope.close()
  }

  /** Exact per-node triangle counts via degree-ordered edge orientation
    * (Schank–Wagner 2005; the distributed shape is Suri–Vassilvitskii
    * 2011's "curse of the last reducer" fix). Triangles measure local
    * clustering — a corpus-curation signal for link farms (dense cliques)
    * vs organic link neighborhoods.
    *
    * 100 TB shape: orienting every undirected edge from its lower
    * (degree, id) endpoint to the higher one makes each node enumerate
    * wedges only among its HIGHER-ordered neighbors, bounding the wedge
    * count by O(|E|^1.5) instead of Σ deg² — the power-law hub that
    * breaks naive per-node enumeration emits no wedges at all (every
    * incident edge points INTO it). Three key-partitioned shuffles:
    * degree aggregation, the wedge self-join on the oriented source,
    * and the closing-edge equi-join on (v, w). No cartesian anywhere;
    * the wedge frame carries only (a, b, c) id triples.
    *
    * `edges(src, dst)` is treated as undirected; self-loops and
    * duplicate/reverse edges are canonicalized away. Returns every node
    * of `nodes(id)` with its BIGINT triangle count (0 for none).
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg_a, a) < (deg_b, b): a total order, so every
    // triangle has exactly one apex with two outgoing wedge edges
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), Seq("b"))
    // Materialize the oriented edge list once (narrow: three numeric
    // columns per edge). It feeds THREE consumers below (both wedge
    // self-join sides and the closing equi-join), and Catalyst expands a
    // shared DataFrame subtree per consumer — un-cut, the canonicalize +
    // degree-join pipeline (and its source scans) re-ran three times
    // (92 scan nodes in g2's r14 physical plan, 2 after). cutShared:
    // executor-pinned localCheckpoint by default; under a durable
    // checkpointDir the per-query rdd-N directory is registered for
    // app-end deletion + releaseAll, so it cannot leak (ADVICE r15).
    val oriented = Lineage.cutShared(withDeg.select(
      when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("_db").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("_da").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv")))
    val x = oriented.as("x")
    val y = oriented.as("y")
    val wedges = x.join(y,
        col("x.u") === col("y.u") &&
          (col("x.dv") < col("y.dv") ||
            (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))))
      .select(col("x.u").as("ta"), col("x.v").as("tb"), col("y.v").as("tc"))
    val tris = wedges.join(
      oriented.select(col("u").as("tb"), col("v").as("tc")), Seq("tb", "tc"))
    val perNode = tris
      .select(explode(array(col("ta"), col("tb"), col("tc"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    nodes.select(col("id")).join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Multi-source BFS hop distances over `edges(src, dst)` (directed):
    * min number of edges from ANY node in `sources(id)`. Returns
    * (id, dist) for every REACHED node; unreached nodes are absent (the
    * caller left-joins if it wants nulls). `maxHops` bounds the rounds —
    * a fixed hyperparameter like the pageRank iteration count, NOT a
    * convergence probe (no per-round count() action on the driver).
    *
    * 100 TB shape: per round one `frontier ⋈ edges` shuffle on src plus
    * one `groupBy(id).min` — O(|E|) a round, the textbook Pregel BFS as
    * pure dataflow. The frontier is the DELTA (nodes first reached last
    * round), not the full visited set, so late rounds on a high-diameter
    * graph touch only the expanding rim; `localCheckpoint` caps lineage
    * growth exactly as the CC/PageRank loops do. Distances are integers
    * — bit-exact under any partitioning or merge order.
    */
  def bfsHops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 100,
      s"maxHops $maxHops out of range [1, 100]")
    val scope = Lineage.scope(edges.sparkSession)
    try {
      // edge list pinned for the whole loop; freed by close()
      val e = edges.select(col("src"), col("dst"))
        .transform(scope.cut(_, eager = false))
      var visited = sources.select(col("id")).distinct()
        .select(col("id"), lit(0L).as("dist"))
      var frontier = visited
      var i = 0
      while (i < maxHops) {
        val next = frontier.withColumnRenamed("id", "src")
          .join(e, Seq("src"))
          .select(col("dst").as("id"), (col("dist") + 1).as("dist"))
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
          // keep only NEWLY reached nodes: dist already found is ≤ current
          .join(visited.select(col("id").as("_seen")),
            col("id") === col("_seen"), "left_anti")
          .transform(scope.cut(_, eager = false))
        val nextVisited = visited.unionByName(next)
          .transform(scope.cut(_, eager = false))
        // both supersessions are safe to free only after nextVisited is
        // materialized — which scope.cut forces in reliable mode
        scope.free(visited)
        scope.free(frontier)
        visited = nextVisited
        frontier = next
        i += 1
      }
      scope.handOff(visited)
    } finally scope.close()
  }

  /** One PageRank round, un-checkpointed — also the plan-shape test
    * surface (the loop's localCheckpoint hides the round plan behind an
    * RDD scan). */
  private[graft] def round(
      nodes: DataFrame,
      withDeg: DataFrame,
      ranks: DataFrame,
      teleport: Long,
      dampingPermille: Int): DataFrame = {
    // `div`, not `/`: Spark's `/` is DOUBLE division even on longs, and
    // a double quotient can round up across an integer boundary before
    // the cast truncates — `div` is exact 64-bit floor division
    val contribs = withDeg
      .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
      .select(col("dst").as("id"),
        expr("rank_units div _deg").as("_c"))
      .groupBy(col("id"))
      .agg(sum(col("_c")).as("_in"))
    nodes.select(col("id"))
      .join(contribs, Seq("id"), "left")
      .select(col("id"),
        (lit(teleport) +
          expr(s"(${dampingPermille.toLong} * coalesce(_in, 0L)) div 1000")
        ).as("rank_units"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics beyond connected components (Dedup):
  * weighted PageRank over the event-transition graph. The reference has
  * no graph capability at all (single-dataflow engine,
  * /root/reference/src/mr/worker.rs:88-231); this is north-star surface.
  *
  * Scale design:
  *  - The graph is AGGREGATED first (event_type -> next event_type with
  *    counts) so iteration state is O(|node types|), not O(events) —
  *    the standard entity-graph reduction. The one event-scale pass is
  *    the lead() window per user building edges, identical in shape to
  *    eventTransitions.
  *  - Every iteration `localCheckpoint(eager = true)`s the new rank
  *    frame. Without it the plan references the previous frame twice
  *    (contribution join + dangling-mass join) and DOUBLES per round —
  *    the exact lineage bomb measured and fixed in
  *    Dedup.connectedComponents (see its scaladoc); checkpointing keeps
  *    every round's plan O(1).
  *  - Determinism for the oracle hash: per-edge contributions are doubles
  *    cast to DECIMAL(28,18) BEFORE the sum, so the shuffle-order of the
  *    partial sums cannot change the result (same discipline as the
  *    decimal money sums in Analytics); only scalar double arithmetic in
  *    a fixed expression order happens outside the sums.
  */
object Graph {

  private val Damping = 0.85
  private val Iters = 10

  /** (src, dst, w) transition-count edges — eventTransitions' output
    * reshaped as a weighted digraph. */
  private def transitionEdges(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dst", lead("event_type", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over the event-transition graph: damping 0.85, 10
    * fixed iterations, uniform init, dangling mass redistributed
    * uniformly. Emits (event_type, round(pr, 6)). */
  def pagerankEvents(spark: SparkSession, dir: String): DataFrame =
    pagerankOf(transitionEdges(spark, dir), Damping, Iters)
      .select(col("node").as("event_type"), round(col("r"), 6).as("pr"))
      .orderBy("event_type")

  /** Generic weighted PageRank over an (src, dst, w) edge frame; returns
    * (node, r) for every node incident to an edge. See the object
    * scaladoc for the lineage-hygiene and determinism contract. */
  def pagerankOf(edgesIn: DataFrame, damping: Double, iters: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outdeg = edges.groupBy("src").agg(sum("w").as("od"))
    val nF = nodes.agg(count(lit(1)).as("n")) // 1 row, broadcast by AQE
    var rank = nodes.crossJoin(nF)
      .select(col("node"), (lit(1.0) / col("n")).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // per-edge contribution, decimal-cast pre-sum (order-independent)
      val incoming = edges
        .join(rank, edges("src") === rank("node"))
        .join(outdeg, "src")
        .select(col("dst"),
          ((col("r") * col("w")) / col("od")).cast("decimal(28,18)").as("c"))
        .groupBy("dst")
        .agg(sum("c").cast("double").as("inc"))
      // rank mass parked on sink nodes, spread uniformly next round
      val dangling = rank
        .join(outdeg, rank("node") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("r").cast("decimal(28,18)")), lit(0))
          .cast("double").as("dang"))
      rank = nodes
        .join(incoming, nodes("node") === incoming("dst"), "left")
        .crossJoin(nF)
        .crossJoin(dangling)
        .select(col("node"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * (coalesce(col("inc"), lit(0.0)) + col("dang") / col("n")))
            .as("r"))
        .localCheckpoint(true) // leaf plan per round — see object scaladoc
    }
    rank
  }

  /** Triangle enumeration over an undirected edge list given with
    * canonical orientation (id1 < id2). Two equi-joins with the a<b<c
    * constraint baked into the orientation — the standard distributed
    * triangle shape: the wedge join shuffles on the shared vertex, the
    * closing join on the (a, c) pair; no vertex ever sees more than its
    * own adjacency. For skewed degree distributions the canonical
    * orientation itself is the mitigation (every triangle is counted
    * from its smallest vertex exactly once). */
  def trianglesOf(edges: DataFrame): DataFrame = {
    val e = edges.select(col("id1").as("a"), col("id2").as("b"))
    val wedges = e.as("ab").join(e.as("bc"), col("ab.b") === col("bc.a"))
      .select(col("ab.a").as("wa"), col("ab.b").as("wb"), col("bc.b").as("wc"))
    wedges.join(e.as("ac"), col("wa") === col("ac.a") && col("wc") === col("ac.b"))
      .select(col("wa").as("a"), col("wb").as("b"), col("wc").as("c"))
  }

  /** BFS levels from a source node over an undirected edge list:
    * frontier expansion, one join per level. Per-level cost is ONE
    * materializing job (the frontier's eager localCheckpoint) plus a
    * limit-1 `isEmpty` probe on the checkpointed leaf — the emptiness
    * check never rescans the expansion. `visited` stays a LAZY union of
    * the per-level checkpointed leaves (each already a LogicalRDD, so
    * the plan is ≤ maxDepth leaf scans with no lineage growth — the CC
    * lineage lesson), instead of re-copying the whole visited set every
    * round, which turned O(V) state into O(V·depth) checkpoint I/O.
    * Rounds are capped at maxDepth = 30, matching the oracle CTE's own
    * depth bound. Unreached nodes are absent from the output. Returns
    * (id, level). */
  def bfsLevels(edges: DataFrame, source: Long, maxDepth: Int = 30): DataFrame = {
    val adj = edges.select(col("id1").as("id"), col("id2").as("nbr"))
      .union(edges.select(col("id2").as("id"), col("id1").as("nbr")))
      .persist()
    var visited = adj.sparkSession.range(1).select(
      lit(source).as("id"), lit(0L).as("level")).localCheckpoint(true)
    var frontier = visited.select("id")
    var level = 0L
    var grew = true
    while (grew && level < maxDepth) {
      level += 1
      val next = adj.join(frontier.select(col("id").as("nbr")), "nbr")
        .select(col("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(level).as("level"))
        .localCheckpoint(true) // the ONE materializing job this level
      grew = !next.isEmpty // limit-1 probe on the checkpointed leaf
      if (grew) {
        visited = visited.union(next) // lazy union of leaves
        frontier = next.select("id")
      }
    }
    adj.unpersist()
    visited
  }

  private val LpaIters = 5

  /** Synchronized label-propagation communities over the symmetrized,
    * weight-summed event-transition graph: each round EVERY node adopts
    * the label carrying the highest incident edge weight among its
    * neighbors' current labels (ties to the lexicographically smallest
    * label), for a fixed 5 synchronized rounds. Synchronous updates +
    * total tie order make the result deterministic — the property async
    * sweep-order LPA lacks and an exact cross-engine oracle needs; the
    * oracle unrolls the same rounds as MATERIALIZED CTEs (the PageRank
    * pattern). Per round: one equi-join on the neighbor, one
    * (node, label) weight aggregate (partial+final), one min_by pick —
    * and a localCheckpoint keeps the plan a leaf. */
  def lpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val e = transitionEdges(spark, dir)
    val und = e.select(col("src"), col("dst"), col("w"))
      .union(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to LpaIters) {
      labels = und
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(sum("w").as("ws"))
        .groupBy("node")
        .agg(min_by(col("label"), struct((-col("ws")).as("nws"), col("label")))
          .as("label"))
        .localCheckpoint(true)
    }
    labels
      .select(col("node").as("event_type"), col("label").as("community"))
      .orderBy("event_type")
  }

  private val SsspRounds = 8

  /** Single-source shortest paths by Bellman-Ford relaxation — the
    * min-plus counterpart of PageRank's sum-times iteration: each round
    * unions current distances with every one-edge relaxation and keeps
    * the per-node min. A fixed round count ≥ (node count − 1) is exact
    * (extra rounds are idempotent at the fixed point), which is what
    * makes the unrolled-CTE oracle equality sound. Per round: one
    * equi-join + one partial+final min aggregate, localCheckpoint'd —
    * the same O(1)-plan discipline as every iterative loop here. */
  def ssspOf(edgesIn: DataFrame, source: String, rounds: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint(true)
    var dist = edges.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = edges.join(dist, edges("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** SSSP over the event-transition graph from its alphabetically first
    * source node (deterministic), edge length = transition count. Nodes
    * unreachable from the source are absent — the contract a reachability
    * probe wants. */
  def ssspEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = transitionEdges(spark, dir)
    // Exactness needs rounds ≥ nodes−1, and the oracle unrolls the SAME
    // fixed count — so a dataset whose node cardinality outgrows the
    // constant must fail HERE, loudly, not pass while both sides
    // under-relax in lockstep.
    val nodes = e.select(col("src").as("n")).union(e.select(col("dst").as("n")))
      .agg(count_distinct(col("n"))).head().getLong(0)
    require(nodes - 1 <= SsspRounds,
      s"SsspRounds=$SsspRounds < nodes-1=${nodes - 1}: raise the constant " +
        "and the unrolled oracle CTE together")
    val src = e.agg(min(col("src"))).head().getString(0)
    ssspOf(e, src, SsspRounds)
      .select(col("node").as("event_type"), col("dist"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank_events" -> pagerankEvents,
    "lpa_communities" -> lpaCommunities,
    "sssp_events" -> ssspEvents,
  )

  /** Oracle: the same 10 iterations unrolled as chained CTEs (r0..r10),
    * with the identical expression order — contributions cast to
    * DECIMAL(28,18) before the sum, all scalar arithmetic in doubles.
    *
    * Every iteration CTE is `AS MATERIALIZED`: DuckDB inlines CTEs by
    * default, and r_k references r_{k−1} twice (incoming + dangling), so
    * the inlined plan DOUBLES per iteration and OOMs the oracle engine at
    * 10 unrolled rounds — the very same plan-growth failure mode
    * localCheckpoint prevents on the Spark side (object scaladoc). */
  val oracle: Map[String, String] = {
    val base =
      "tr AS MATERIALIZED (SELECT event_type AS src, lead(event_type, 1) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst FROM events), " +
        "edges AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY src, dst), " +
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)), " +
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes), " +
        "outdeg AS MATERIALIZED (SELECT src, sum(w) AS od FROM edges GROUP BY src), " +
        "r0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r FROM nodes, nn)"
    val iters = (1 to Iters).map { k =>
      val p = s"r${k - 1}"
      s"inc$k AS MATERIALIZED (SELECT e.dst, CAST(sum(CAST((p.r * e.w) / o.od AS DECIMAL(28,18))) AS DOUBLE) AS inc " +
        s"FROM edges e JOIN $p p ON p.node = e.src JOIN outdeg o ON o.src = e.src GROUP BY e.dst), " +
        s"dang$k AS MATERIALIZED (SELECT CAST(coalesce(sum(CAST(p.r AS DECIMAL(28,18))), 0) AS DOUBLE) AS dang " +
        s"FROM $p p LEFT JOIN outdeg o ON o.src = p.node WHERE o.src IS NULL), " +
        s"r$k AS MATERIALIZED (SELECT nodes.node, " +
        s"CAST(${1.0 - Damping} AS DOUBLE) / nn.n + " +
        s"CAST($Damping AS DOUBLE) * (coalesce(i.inc, CAST(0.0 AS DOUBLE)) + d.dang / nn.n) AS r " +
        s"FROM nodes LEFT JOIN inc$k i ON i.dst = nodes.node CROSS JOIN nn CROSS JOIN dang$k d)"
    }.mkString(", ")
    val lpaBase =
      "tr AS MATERIALIZED (SELECT event_type AS src, lead(event_type, 1) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst FROM events), " +
        "edges AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY src, dst), " +
        "und AS MATERIALIZED (SELECT src, dst, sum(w) AS w FROM " +
        "(SELECT src, dst, w FROM edges UNION ALL SELECT dst AS src, src AS dst, w FROM edges) GROUP BY src, dst), " +
        "l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM und)"
    val lpaIters = (1 to LpaIters).map { k =>
      s"l$k AS MATERIALIZED (SELECT node, label FROM (" +
        "SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY ws DESC, label) AS rn FROM (" +
        s"SELECT u.src AS node, l.label AS label, sum(u.w) AS ws FROM und u " +
        s"JOIN l${k - 1} l ON l.node = u.dst GROUP BY u.src, l.label)) WHERE rn = 1)"
    }.mkString(", ")
    Map(
      "pagerank_events" ->
        (s"WITH $base, $iters " +
          s"SELECT node AS event_type, round(r, 6) AS pr FROM r$Iters ORDER BY event_type"),
      "lpa_communities" ->
        (s"WITH $lpaBase, $lpaIters " +
          s"SELECT node AS event_type, label AS community FROM l$LpaIters ORDER BY event_type"),
      "sssp_events" -> {
        val ssspBase =
          "tr AS MATERIALIZED (SELECT event_type AS src, lead(event_type, 1) OVER " +
            "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dst FROM events), " +
            "edges AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY src, dst), " +
            "d0 AS MATERIALIZED (SELECT min(src) AS node, CAST(0 AS BIGINT) AS dist FROM edges)"
        val ssspIters = (1 to SsspRounds).map { k =>
          s"d$k AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (" +
            s"SELECT node, dist FROM d${k - 1} UNION ALL " +
            s"SELECT e.dst AS node, d.dist + e.w AS dist FROM edges e JOIN d${k - 1} d ON d.node = e.src" +
            ") GROUP BY node)"
        }.mkString(", ")
        s"WITH $ssspBase, $ssspIters " +
          s"SELECT node AS event_type, dist FROM d$SsspRounds ORDER BY event_type"
      },
    )
  }
}

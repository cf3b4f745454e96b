package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Strongly connected components over a DIRECTED edge list — the cycle
  * structure of a KG: mutual-entailment knots in predicate graphs,
  * redirect/sameAs loops in url graphs, feedback sets in dependency
  * edges. [[ConnectedComponents]] answers "touches, in either
  * direction"; this answers "reaches AND is reached", which is the
  * grouping canonicalization needs before it can pick one
  * representative per cycle (a DAG condensation).
  *
  * Algorithm: iterative trimming + forward coloring + backward carve —
  * the FW-BW/coloring family (Orzan'04; McLendon et al. JPDC'05), the
  * published distributed-SCC recipe, expressed entirely as DataFrame
  * joins/aggregates so Catalyst plans every step and AQE handles skew:
  *
  *   1. TRIM to fixpoint: a node with no in-edge or no out-edge in the
  *      remaining subgraph cannot sit on a directed cycle — it is its
  *      own singleton SCC. Iterated trimming alone dissolves the entire
  *      DAG part of the graph (one layer per round).
  *   2. COLOR: f(v) = min id over {v} ∪ ancestors(v), by forward
  *      min-label propagation to fixpoint ([[ConnectedComponents.run]]'s
  *      loop, directed).
  *   3. CARVE: within each color class, grow the set S backward from
  *      the root r (f(r) = r) along edges whose endpoints share the
  *      color. v ∈ S means v reaches r through its own color class and
  *      r reaches v (r is an ancestor by definition of f), so
  *      SCC(v) = SCC(r), and r is that SCC's minimum — label v with r.
  *      (Membership needs BOTH directions: step 2's f alone cannot
  *      split sibling branches of a common ancestor.)
  *   4. Peel S off, repeat from 1 on the residue.
  *
  * Every step is a key-partitioned join + map-side-combinable aggregate
  * — no driver-side data in the distributed phases, no RDDs.
  * `localCheckpoint` truncates lineage each round (the
  * [[ConnectedComponents]] discipline). Convergence: trimming pays one
  * round per DAG layer, coloring one per ancestor-chain hop, carving
  * one per in-tree depth; web-shaped graphs (one big knot + shallow
  * tendrils) finish in a few outer rounds — the regime the FW-BW
  * literature targets — while an adversarial long chain of 2-cycles
  * degenerates linearly, the known worst case of the whole family.
  * `maxRounds` bounds the pathology explicitly rather than hiding it.
  *
  * Residue cutover: the same FW-BW papers finish small remainders with
  * a sequential SCC pass, because past the first trim+peel the residue
  * of a web-shaped graph is orders of magnitude below the input and the
  * fixpoint rounds' scheduling latency dominates actual work. When the
  * MEASURED remaining edge count drops under `localCutoff`, the residue
  * collects to the driver (bounded by the gate — the q42 IVF
  * sample-collect discipline) and iterative Tarjan labels it in
  * O(V+E); the answer is identical by construction (scc = min node of
  * the mutual-reachability class, either way). Set `localCutoff = 0`
  * to force the pure-distributed path (the spec does, pinning the two
  * paths against each other).
  */
object Scc {

  /** @param edges (src, dst) directed edge list, any key type
    * @param localCutoff residue edge count at or under which the
    *        remaining subgraph is solved driver-side (Tarjan)
    * @return (node, scc) — scc = the minimum node id of the component */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 300,
      localCutoff: Long = 2000000L): DataFrame = {
    val empty = {
      val e = edges.select(col("src").as("node"), col("src").as("scc"))
      e.filter(lit(false)).localCheckpoint()
    }
    // self-loops make a node cyclic but never enlarge its SCC — drop them
    var rem = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    var nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().localCheckpoint()
    var out = empty
    var rounds = 0

    def spent(): Unit = {
      rounds += 1
      require(rounds <= maxRounds,
        s"SCC did not converge within $maxRounds fixpoint rounds — " +
          "adversarial chain-of-cycles topology; raise maxRounds")
    }

    while (nodes.limit(1).count() > 0) {
      // ---- residue cutover: measured gate, then driver-side Tarjan --
      // (checked BEFORE trimming: when the whole remainder already fits
      // the gate, the trim fixpoint's per-layer rounds cost more than
      // the sequential pass solves). Nodes with no remaining non-self
      // edge are singleton SCCs — labeled distributedly, they never
      // ride the collect.
      if (rem.count() <= localCutoff) {
        val ends = rem.select(col("src").as("node"))
          .union(rem.select(col("dst").as("node"))).distinct()
        val lonely = nodes.join(ends, Seq("node"), "left_anti")
        out = out.union(lonely.select(col("node"), col("node").as("scc")))
        val local = tarjan(rem.collect().map(r => (r.get(0), r.get(1))))
        if (local.isEmpty) return out
        val rows = local.map { case (n, s) =>
          org.apache.spark.sql.Row(n, s) }
        return out.union(spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), out.schema))
      }

      // ---- 1. TRIM to fixpoint ------------------------------------
      var trimming = true
      while (trimming) {
        spent()
        val cyclicCandidates = rem.select(col("src").as("node")).distinct()
          .join(rem.select(col("dst").as("node")).distinct(), "node")
          .localCheckpoint()
        val trivial = nodes.join(cyclicCandidates, Seq("node"), "left_anti")
          .localCheckpoint()
        if (trivial.limit(1).count() > 0) {
          out = out.union(trivial.select(col("node"), col("node").as("scc")))
            .localCheckpoint()
          // rem is already confined to `nodes`, so its two-sided survivors
          // ARE the next node set: nodes \ trivial
          nodes = cyclicCandidates
          rem = rem.join(nodes.withColumnRenamed("node", "src"), "src")
            .join(nodes.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst").localCheckpoint()
        } else trimming = false
      }
      if (nodes.limit(1).count() == 0) return out

      // ---- 2. COLOR: f = min over self ∪ ancestors ------------------
      var f = nodes.withColumn("f", col("node")).localCheckpoint()
      var coloring = true
      while (coloring) {
        spent()
        val next = rem.join(f.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("f"), lit(0).as("is_old"))
          .union(f.select(col("node"), col("f"), lit(1).as("is_old")))
          .groupBy("node")
          .agg(min("f").as("f"),
            min(when(col("is_old") === 1, col("f"))).as("old_f"))
          .localCheckpoint()
        coloring = next.filter(col("f") =!= col("old_f")).limit(1).count() > 0
        f = next.select("node", "f")
      }

      // ---- 3. CARVE: backward closure of the root within its color --
      // edges whose endpoints share a color, reversed for backward growth
      val colorEdges = rem
        .join(f.select(col("node").as("src"), col("f").as("f_src")), "src")
        .join(f.select(col("node").as("dst"), col("f").as("f_dst")), "dst")
        .filter(col("f_src") === col("f_dst"))
        .select(col("dst").as("from"), col("src").as("to"))
        .localCheckpoint()
      var carved = f.filter(col("f") === col("node")).select("node")
        .localCheckpoint()
      var growing = true
      while (growing) {
        spent()
        val grown = colorEdges
          .join(carved.withColumnRenamed("node", "from"), "from")
          .select(col("to").as("node")).distinct()
          .join(carved, Seq("node"), "left_anti").localCheckpoint()
        if (grown.limit(1).count() > 0)
          carved = carved.union(grown).localCheckpoint()
        else growing = false
      }

      // ---- 4. PEEL ---------------------------------------------------
      out = out.union(
        f.join(carved, "node").select(col("node"), col("f").as("scc")))
        .localCheckpoint()
      nodes = nodes.join(carved, Seq("node"), "left_anti").localCheckpoint()
      rem = rem.join(nodes.withColumnRenamed("node", "src"), "src")
        .join(nodes.withColumnRenamed("node", "dst"), "dst")
        .select("src", "dst").localCheckpoint()
    }
    out
  }

  /** The condensation DAG — the composition the object doc promises:
    * [[run]]'s labels collapse the directed graph onto its strongly
    * connected components, and every cross-component edge group becomes
    * one condensed edge `(csrc, cdst, n_edges)` with its distinct-edge
    * multiplicity. The condensation is acyclic by construction (any
    * cycle through two components would merge them), so its output
    * feeds [[Dag.longestPathLayers]] directly — the SCC → DAG →
    * layering chain canonicalization runs. Scale shape: two
    * node-keyed label joins + one map-side-combinable aggregate on top
    * of the [[run]] fixpoint; self-loops and intra-component edges
    * drop before the aggregate. */
  def condensation(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 300, localCutoff: Long = 2000000L): DataFrame =
    condenseWith(run(spark, edges, maxRounds, localCutoff), edges)

  /** [[condensation]]'s label-joining core over an ALREADY-computed
    * labeling — shared with [[reachability]] so the composition never
    * runs the SCC fixpoint twice. */
  private def condenseWith(labels: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").filter(col("src") =!= col("dst"))
      .distinct()
    e.join(labels.withColumnRenamed("node", "src")
        .withColumnRenamed("scc", "csrc"), "src")
      .join(labels.withColumnRenamed("node", "dst")
        .withColumnRenamed("scc", "cdst"), "dst")
      .filter(col("csrc") =!= col("cdst"))
      .groupBy("csrc", "cdst").agg(count(lit(1)).as("n_edges"))
  }

  /** FULL directed reachability `(src, dst)` — every ordered pair
    * connected by a path of ≥ 1 edges, cycles included — via Purdom's
    * factorization: transitive closure is constant on strongly
    * connected components, so collapse FIRST ([[run]]), run the
    * path-doubling fixpoint ([[TriplePatterns.closureFixpoint]]) on
    * the condensation DAG — orders of magnitude smaller than the
    * input graph, and acyclic so the loop converges in
    * ⌈log₂ depth⌉ + 1 doubling rounds — then expand component pairs
    * back to node pairs:
    *
    *   - intra: every ordered pair (self included — a node on a cycle
    *     reaches itself) within each component of size ≥ 2;
    *   - inter: members(csrc) × members(cdst) for every closure pair
    *     of the condensation;
    *   - self-loops on singleton components (the one cycle the
    *     collapse cannot see) patched back explicitly.
    *
    * The three parts are disjoint by construction (same-vs-different
    * component, and the self-loop patch anti-joins the multi-member
    * side), each internally duplicate-free, so the union needs NO
    * final distinct — the expansion emits exactly the output pairs,
    * never a wasted intermediate. The output is the closure itself:
    * quadratic in component sizes by definition, which is the
    * inherent bound, not a plan artifact. */
  def reachability(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 300, localCutoff: Long = 2000000L): DataFrame = {
    val labels = run(spark, edges, maxRounds, localCutoff)
    val cond = condenseWith(labels, edges)
      .select(col("csrc").as("src"), col("cdst").as("dst"))
    val cc = TriplePatterns.closureFixpoint(cond)
      .select(col("src").as("cs"), col("dst").as("cd"))
    val sizes = labels.groupBy("scc").agg(count(lit(1)).as("sz"))
    val multi = labels.join(sizes.filter(col("sz") >= 2).select("scc"), "scc")
    val intra = multi.as("a").join(multi.as("b"), "scc")
      .select(col("a.node").as("src"), col("b.node").as("dst"))
    val inter = labels.select(col("node").as("src"), col("scc").as("cs"))
      .join(cc, "cs")
      .join(labels.select(col("node").as("dst"), col("scc").as("cd")), "cd")
      .select("src", "dst")
    val selfExtra = edges.filter(col("src") === col("dst"))
      .select("src", "dst").distinct()
      .join(multi.select(col("node").as("src")), Seq("src"), "left_anti")
    intra.unionByName(inter).unionByName(selfExtra)
  }

  /** Broder bow-tie decomposition (Broder et al., "Graph structure in
    * the web", WWW'00) — THE web-graph structural census: `(node,
    * region)` with the largest strongly connected component as `core`
    * (size tie broken to the smallest label), `in` = nodes that reach
    * the core, `out` = nodes the core reaches, `other` = tendrils,
    * tubes, and disconnected mass. Built entirely from pieces this
    * module already verifies: [[run]]'s labels, [[condenseWith]]'s
    * DAG, and the doubling closure — the IN/OUT tests are
    * COMPONENT-level semi-joins against the condensation closure
    * (a node reaches the core iff its component does), never
    * node-level traversals, so the classification costs two semi-joins
    * past the SCC fixpoint. The 1-row core pick is a bounded driver
    * collect (the q42 discipline). */
  def bowtie(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 300, localCutoff: Long = 2000000L): DataFrame = {
    val labels = run(spark, edges, maxRounds, localCutoff)
    val cond = condenseWith(labels, edges)
      .select(col("csrc").as("src"), col("cdst").as("dst"))
    val cc = TriplePatterns.closureFixpoint(cond)
      .select(col("src").as("cs"), col("dst").as("cd"))
    // edgeless/empty input: no component exists — return the empty
    // (node, region) frame instead of NoSuchElementException ([[run]]
    // itself handles the empty case cleanly)
    val corePick = labels.groupBy("scc").agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("scc").asc).limit(1)
      .collect().headOption
    if (corePick.isEmpty)
      return labels.select(col("node"), lit("other").as("region"))
    val coreScc = corePick.get.get(0)
    val inSet = cc.filter(col("cd") === lit(coreScc))
      .select(col("cs").as("scc")).distinct()
    val outSet = cc.filter(col("cs") === lit(coreScc))
      .select(col("cd").as("scc")).distinct()
    labels
      .join(inSet.withColumn("in_f", lit(true)), Seq("scc"), "left")
      .join(outSet.withColumn("out_f", lit(true)), Seq("scc"), "left")
      .select(col("node"),
        when(col("scc") === lit(coreScc), "core")
          .when(col("in_f"), "in")
          .when(col("out_f"), "out")
          .otherwise("other").as("region"))
  }

  /** Iterative (explicit-stack) Tarjan over the collected residue —
    * after trim-to-fixpoint every residue node has both an in- and an
    * out-edge, so the edge endpoints ARE the node set. Returns
    * `(node, min node of its SCC)`; node ids compare by their natural
    * (`Comparable`) order, matching the column `min` the distributed
    * carve uses. */
  private def tarjan(edges: Array[(Any, Any)]): Array[(Any, Any)] = {
    import scala.collection.mutable
    val adj = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[Any]]
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty)
    }
    val index = mutable.HashMap.empty[Any, Int]
    val low = mutable.HashMap.empty[Any, Int]
    val onStack = mutable.HashSet.empty[Any]
    val stack = mutable.ArrayDeque.empty[Any]
    val result = mutable.ArrayBuffer.empty[(Any, Any)]
    var counter = 0
    def lt(a: Any, b: Any): Boolean =
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    // explicit DFS frames (node, next child offset) — residues can be a
    // single million-node knot; the JVM call stack cannot hold that
    val frames = mutable.ArrayDeque.empty[(Any, Int)]
    adj.keys.foreach { root =>
      if (!index.contains(root)) {
        frames.prepend((root, 0))
        while (frames.nonEmpty) {
          val (v, ci) = frames.removeHead()
          if (ci == 0) {
            index(v) = counter; low(v) = counter; counter += 1
            stack.prepend(v); onStack += v
          }
          val kids = adj(v)
          var i = ci
          var descended = false
          while (i < kids.length && !descended) {
            val w = kids(i)
            if (!index.contains(w)) {
              frames.prepend((v, i + 1)); frames.prepend((w, 0))
              descended = true
            } else {
              if (onStack(w) && low(v) > index(w)) low(v) = index(w)
              i += 1
            }
          }
          if (!descended) {
            if (low(v) == index(v)) {
              // pop the component, label with its minimum node
              val comp = mutable.ArrayBuffer.empty[Any]
              var done = false
              while (!done) {
                val w = stack.removeHead(); onStack -= w; comp += w
                done = w == v
              }
              val minN = comp.reduceLeft((a, b) => if (lt(b, a)) b else a)
              comp.foreach(n => result += ((n, minN)))
            }
            // propagate lowlink to the parent frame, if any
            frames.headOption.foreach { case (p, _) =>
              if (low(p) > low(v)) low(p) = low(v)
            }
          }
        }
      }
    }
    result.toArray
  }
}

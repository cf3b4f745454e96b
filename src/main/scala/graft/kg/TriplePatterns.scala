package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SPARQL-style triple-pattern compositions over a materialized KG — the
  * read side of KG construction. Once the pipeline lands `(subj, pred,
  * obj)` snapshots, consumers ask basic-graph-pattern (BGP) questions and
  * operators compare snapshots across crawls; both are plain relational
  * plans here, so Catalyst gets to pick join strategies and AQE gets to
  * re-plan on measured sizes — exactly what a native triple store's
  * hand-written join orderer has to do itself.
  */
object TriplePatterns {

  /** Star BGP on a shared object: `?a predA ?o . ?b predB ?o` →
    * `(obj, subj_a, subj_b)`. With the pipeline's doc-grounded triples
    * this reads "entities of two categories grounded in the SAME page" —
    * the join that feeds co-mention relation proposal and page-level
    * fact tables.
    *
    * Scale shape: both sides are predicate-filtered BEFORE the join (the
    * filter reaches the parquet scan as a pushed predicate on `pred`, so
    * a snapshot partitioned or sorted by predicate prunes files), then
    * hash-join on `obj`. Per-object fan-out is |predA subjects| ×
    * |predB subjects| on that object — bounded by per-page mention
    * counts, never corpus-sized. A pathological hot object is exactly
    * the q08/q52 salting case and AQE's skew-join handles the moderate
    * version for free.
    *
    * @param triples distinct `(subj, pred, obj)` rows
    */
  def starOnObject(triples: DataFrame, predA: String,
      predB: String): DataFrame =
    triples.filter(col("pred") === predA)
      .select(col("obj"), col("subj").as("subj_a"))
      .join(triples.filter(col("pred") === predB)
        .select(col("obj"), col("subj").as("subj_b")), "obj")

  /** Chain BGP (SPARQL property-path composition `predA/predB`):
    * `?s predA ?m . ?m predB ?o` → `(subj, obj, n_paths)` where
    * `n_paths` counts the distinct intermediates connecting the pair
    * (triples are distinct by contract, so each mid contributes exactly
    * one path). With the pipeline's doc-grounded triples plus the
    * doc-metadata triples (`doc://… from_source …`, `doc://… in_lang …`)
    * this reads e.g. "which corpus sources ground each entity's facts,
    * and how many pages deep" — the provenance profile a KG consumer
    * asks for before trusting an entity's facts.
    *
    * Scale shape: both legs predicate-filter BEFORE the join (pushed to
    * the scan; a predicate-partitioned snapshot prunes files), then ONE
    * hash join on the shared node `mid` — the object side of A
    * co-partitioned with the subject side of B, which is the join
    * ordering [[graft.kg.Ontology.predicateProfile]]'s VoID stats exist
    * to justify. Per-mid fan-out = outdeg(predB) × indeg(predA) on that
    * node — per-page-bounded here; a pathological hot mid is the
    * q08/q52 salting case and AQE's skew join covers the moderate form.
    * The final count collapses map-side on (subj, obj).
    */
  def chain(triples: DataFrame, predA: String, predB: String): DataFrame =
    triples.filter(col("pred") === predA)
      .select(col("subj"), col("obj").as("mid"))
      .join(triples.filter(col("pred") === predB)
        .select(col("subj").as("mid"), col("obj")), "mid")
      .groupBy(col("subj"), col("obj"))
      .agg(count(lit(1)).as("n_paths"))

  /** Generic BGP compiler: evaluate an arbitrary SPARQL-style basic graph
    * pattern — a conjunction of `(subj, pred, obj)` patterns whose
    * `?`-prefixed terms are variables — against a KG snapshot, returning
    * one row per solution mapping with the variables as columns
    * (first-appearance order). [[starOnObject]] and [[chain]] are the
    * two hand-written special cases; this is the general form a KG
    * consumer's query layer compiles to, so every ad-hoc BGP gets the
    * same relational treatment without a new operator per shape.
    *
    * Semantics (SPARQL BGP under bag semantics, triples distinct by the
    * pipeline contract): a variable repeated within one pattern means
    * positional equality (`?x knows ?x` matches self-loops); a pattern
    * with no variables is an EXISTS gate (zero matching triples → zero
    * solutions); a disconnected pattern group multiplies solutions
    * (SPARQL cross product). At least one variable must appear overall.
    *
    * Compilation: each pattern becomes a constant-filtered scan leaf
    * (the `pred`/`subj`/`obj` equality filters push into the parquet
    * scan, so a predicate-partitioned snapshot prunes files), and leaves
    * are joined greedily — most-constrained leaf first (most constants),
    * then always a leaf sharing a bound variable (most shared, then most
    * constants), so a connected BGP NEVER plans a cartesian product; the
    * joins are plain equi-joins on the shared variable names, which
    * leaves Catalyst free to pick broadcast/sort-merge per measured
    * sizes and AQE to split skewed solution fan-outs (the q08/q52 case).
    * A genuinely disconnected group falls back to the cross join its
    * semantics require.
    */
  def bgp(triples: DataFrame,
      patterns: Seq[(String, String, String)]): DataFrame = {
    val (df, vars) = compileGroup(triples, patterns)
    df.select(vars.map(col): _*)
  }

  /** SPARQL §15 solution modifiers on a plain SELECT: DISTINCT,
    * ORDER BY, OFFSET, LIMIT — the paging query every KG front-end
    * issues. The ordering keys are caller-chosen variables (`-` prefix
    * = descending), but the APPLIED sort key is always extended with
    * every remaining output variable ascending, so the total order —
    * and therefore any OFFSET/LIMIT page cut — is deterministic even
    * when the requested keys tie (SPARQL leaves tie order to the
    * engine; an irreproducible page boundary is a bug in practice).
    *
    * Scale shape: ORDER+LIMIT without OFFSET plans as
    * `TakeOrderedAndProject` (per-partition top-k, one k-sized merge);
    * with OFFSET Spark still sorts per-partition and cuts
    * offset+limit rows through one final merge — never a full global
    * sort materialization for a page-sized cut. */
  def bgpSelect(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      distinct: Boolean = false,
      orderBy: Seq[String] = Nil,
      offset: Int = 0,
      limit: Option[Int] = None): DataFrame = {
    val sols0 = bgp(triples, patterns)
    val sols = if (distinct) sols0.distinct() else sols0
    val ordered =
      if (orderBy.isEmpty && offset == 0 && limit.isEmpty) sols
      else {
        val explicit = orderBy.map { o =>
          val (name, desc) =
            if (o.startsWith("-")) (o.drop(1), true) else (o, false)
          require(sols.columns.contains(name),
            s"ORDER BY $name must be a bound variable")
          (name, if (desc) col(name).desc else col(name).asc)
        }
        val rest = sols.columns.filterNot(explicit.map(_._1).contains)
          .map(col(_).asc)
        sols.orderBy(explicit.map(_._2) ++ rest: _*)
      }
    val paged = if (offset > 0) ordered.offset(offset) else ordered
    limit.fold(paged)(n => { require(n >= 1, s"LIMIT must be >= 1, got $n")
      paged.limit(n) })
  }

  /** SPARQL ASK (§16.3): does the BGP have at least one solution?
    * Returns ONE row `(ask BOOLEAN)`. The plan is an existence probe,
    * not a count: the compiled solutions are `limit(1)`-gated before
    * the aggregate, so Spark's `CollectLimit` short-circuits scanning
    * as soon as the first solution materializes — the engine never
    * pays for the full solution set to answer a boolean. */
  def bgpAsk(triples: DataFrame,
      patterns: Seq[(String, String, String)]): DataFrame =
    bgp(triples, patterns).limit(1)
      .agg((count(lit(1)) > 0).as("ask"))

  /** SPARQL DESCRIBE (§16.4) under the symmetric concise-bounded-
    * description convention: every triple whose subject OR object is a
    * binding of `describeVar` in the BGP's solutions — the entity-card
    * query a KG front-end issues per page. The spec leaves the
    * description form to the implementation; symmetric CBD (outgoing
    * plus incoming facts, one hop) is the common choice and the useful
    * one for doc-grounded graphs where provenance points AT entities.
    *
    * Scale shape: the solutions project to ONE distinct node column,
    * then the triple store is probed twice by left-SEMI equi-join
    * (subject side, object side) — semi joins never widen the triple
    * rows, AQE broadcasts the node set while it measures small, and
    * the final distinct collapses the subject∩object overlap. */
  def bgpDescribe(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      describeVar: String): DataFrame = {
    val sols = bgp(triples, patterns)
    require(describeVar.startsWith("?") &&
      sols.columns.contains(describeVar.drop(1)),
      s"DESCRIBE $describeVar must be a bound variable of the BGP")
    val nodes = sols.select(col(describeVar.drop(1)).as("node")).distinct()
    val t = triples.select("subj", "pred", "obj")
    t.join(nodes.withColumnRenamed("node", "subj"), Seq("subj"), "left_semi")
      .unionByName(t.join(nodes.withColumnRenamed("node", "obj"),
        Seq("obj"), "left_semi").select("subj", "pred", "obj"))
      .distinct()
  }

  /** [[bgp]] with SPARQL OPTIONAL groups: each group in `optionals` is a
    * BGP compiled like the required `patterns` and LEFT-joined onto the
    * solutions bound so far on their shared variables (groups bind
    * left-to-right, so a later group may join on an earlier group's
    * variables; a solution the group cannot extend keeps nulls in the
    * group's new variables — SPARQL's weak-optional semantics for
    * well-designed patterns). Each optional group must share at least
    * one variable with what precedes it: a no-shared-variable OPTIONAL
    * is a cross product per solution, which is a query bug, not a plan.
    *
    * Scale shape: identical to [[bgp]] per group, plus one left
    * equi-join per group on the shared variable names — same
    * Catalyst/AQE freedom, no cartesian possible by the shared-variable
    * requirement. */
  def bgpOptional(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      optionals: Seq[Seq[(String, String, String)]]): DataFrame = {
    val (req, reqVars) = compileGroup(triples, patterns)
    val (acc, vars) = optionals.foldLeft((req, reqVars)) {
      case ((df, bound), group) =>
        val (g, gVars) = compileGroup(triples, group)
        val shared = gVars.filter(bound.contains)
        require(shared.nonEmpty,
          s"OPTIONAL group $group shares no variable with prior patterns")
        (df.join(g, shared, "left"), bound ++ gVars.filterNot(bound.contains))
    }
    acc.select(vars.map(col): _*)
  }

  /** [[bgp]] with SPARQL FILTER comparisons and single-variable VALUES
    * blocks — the solution-modifier surface that turns the compiler
    * into a usable query layer (SPARQL 1.1 §17.4.1 comparison operators
    * over plain literals; §10.2 VALUES as inline data). Each filter is
    * `(?lhs, op, rhs)` with `op ∈ {=, !=, <, <=, >, >=}` and `rhs`
    * either a second variable (`?`-prefixed) or a constant; comparisons
    * are the codepoint string order BOTH engines share on the KG's
    * ASCII terms. Each VALUES entry binds one variable to an explicit
    * term list.
    *
    * Scale shape: VALUES compiles to an `IN`-list predicate and filters
    * compile to plain comparison predicates on the compiled solution
    * relation — Catalyst pushes both THROUGH the BGP's equi-joins down
    * to the pattern scan leaves (an `In` on a leaf reaches the parquet
    * scan as a pushed filter, the same file-pruning story as the
    * pattern constants), so a selective VALUES block prunes before the
    * first join rather than after the last. Nothing new shuffles. */
  def bgpWhere(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      filters: Seq[(String, String, String)] = Nil,
      values: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val (df, vars) = compileGroup(triples, patterns)
    def varName(t: String, what: String): String = {
      require(t.startsWith("?") && vars.contains(t.drop(1)),
        s"$what $t must be a bound variable of the BGP")
      t.drop(1)
    }
    val withVals = values.foldLeft(df) { case (d, (v, terms)) =>
      require(terms.nonEmpty, s"VALUES $v needs at least one term")
      d.filter(col(varName(v, "VALUES variable")).isin(terms: _*))
    }
    val out = filters.foldLeft(withVals) { case (d, (l, op, r)) =>
      val lhs = col(varName(l, "FILTER lhs"))
      val rhs = if (r.startsWith("?")) col(varName(r, "FILTER rhs"))
        else lit(r)
      d.filter(op match {
        case "=" => lhs === rhs
        case "!=" => lhs =!= rhs
        case "<" => lhs < rhs
        case "<=" => lhs <= rhs
        case ">" => lhs > rhs
        case ">=" => lhs >= rhs
        case other => throw new IllegalArgumentException(
          s"unsupported FILTER operator '$other'")
      })
    }
    out.select(vars.map(col): _*)
  }

  /** SPARQL UNION of group graph patterns (SPARQL 1.1 §7): each branch
    * is a BGP compiled like [[bgp]]; the result is the BAG union of the
    * branches' solution mappings over the union of their variables in
    * first-appearance order, with a variable a branch does not bind left
    * UNBOUND (null) — the spec's disjunction, where heterogeneous
    * branches pad rather than fail. No dedup: UNION is multiset union
    * per the algebra (REDUCED/DISTINCT are separate modifiers), and each
    * branch's solutions are already distinct tuples over its own
    * variables when the KG snapshot is distinct.
    *
    * Scale shape: each branch plans exactly as [[bgp]] (pattern
    * constants push to the scans, equi-joins Catalyst-ordered); the
    * union is a zero-shuffle `unionByName` — partitions concatenate,
    * nothing moves. Null-padding is a literal projection, free. */
  def bgpUnion(triples: DataFrame,
      branches: Seq[Seq[(String, String, String)]]): DataFrame = {
    require(branches.sizeIs >= 2, "UNION needs at least two branches")
    val compiled = branches.map(compileGroup(triples, _))
    val allVars = compiled.flatMap(_._2).distinct
    compiled.map { case (df, vars) =>
      df.select(allVars.map(v =>
        if (vars.contains(v)) col(v)
        else lit(null).cast("string").as(v)): _*)
    }.reduce(_ unionByName _)
  }

  /** SPARQL CONSTRUCT (1.1 §16.2): instantiate `(subj, pred, obj)`
    * templates — `?`-prefixed terms substitute the solution's binding,
    * anything else is a constant — once per solution of the WHERE BGP,
    * and return the resulting RDF GRAPH: a SET of triples, deduplicated
    * across templates and solutions per the spec. Template variables
    * must be bound by the patterns (BGP solutions bind every variable
    * non-null here, so the spec's drop-incomplete-instantiation rule
    * never fires). This is the KG-rewrite operator: derived predicates
    * (`?a processes ?b` from co-grounded extraction triples) land back
    * in the snapshot as first-class facts.
    *
    * Scale shape: the BGP plans as [[bgp]]; each template is a
    * zero-shuffle projection of the solution frame, the union is a
    * concatenation, and the single final distinct is the only exchange
    * added — one hash-aggregate over (subj, pred, obj), map-side
    * partials collapsing the per-solution duplicates early. */
  def bgpConstruct(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      templates: Seq[(String, String, String)]): DataFrame = {
    require(templates.nonEmpty, "CONSTRUCT needs at least one template")
    val (df, vars) = compileGroup(triples, patterns)
    def term(t: String) =
      if (t.startsWith("?")) {
        require(vars.contains(t.drop(1)),
          s"CONSTRUCT template term $t is not bound by the WHERE patterns")
        col(t.drop(1))
      } else lit(t)
    templates.map { case (s, p, o) =>
      df.select(term(s).as("subj"), term(p).as("pred"), term(o).as("obj"))
    }.reduce(_ unionByName _).distinct()
  }

  /** SPARQL aggregate projection with solution modifiers (SPARQL 1.1
    * §11 aggregates, §15 ORDER BY / LIMIT): GROUP BY over a compiled
    * BGP's solutions, aggregate the remaining variables, filter groups
    * with HAVING, then order and cut. Aggregates are `(fn, ?var,
    * alias)` with `fn ∈ {count, count_distinct, min, max}` — the
    * term-domain aggregates (KG terms are strings; numeric SUM/AVG
    * belongs to the measurement layer, q118) — plus `group_concat`,
    * which the spec leaves order-undefined and this engine pins to
    * DISTINCT values sorted ascending, `|`-separated, so the output is
    * byte-reproducible across runs and engines. HAVING compares an
    * aggregate alias to a constant with the [[bgpWhere]] operator set.
    * `orderBy` names are variables or aliases, `-`-prefixed for
    * descending; callers wanting a deterministic LIMIT must make the
    * order total (the q06 window discipline) — with NULLS FIRST for
    * ascending (Spark and DuckDB's shared default).
    *
    * Scale shape: the BGP plans as [[bgp]]; the aggregate is ONE
    * hash-aggregate with map-side partials (count/min/max all fold),
    * HAVING prunes post-agg group-count-sized data, and ORDER+LIMIT
    * plans as `TakeOrderedAndProject` — a per-partition top-k plus one
    * k-sized merge, never a global sort of the groups. */
  def bgpAggregate(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      groupBy: Seq[String],
      aggs: Seq[(String, String, String)],
      having: Seq[(String, String, Long)] = Nil,
      orderBy: Seq[String] = Nil,
      limit: Option[Int] = None): DataFrame = {
    val (df, vars) = compileGroup(triples, patterns)
    def varName(t: String, what: String): String = {
      require(t.startsWith("?") && vars.contains(t.drop(1)),
        s"$what $t must be a bound variable of the BGP")
      t.drop(1)
    }
    require(groupBy.nonEmpty, "GROUP BY needs at least one variable")
    val keys = groupBy.map(varName(_, "GROUP BY variable"))
    require(aggs.nonEmpty, "aggregate projection needs at least one aggregate")
    val aggCols = aggs.map { case (fn, v, alias) =>
      val name = varName(v, s"$fn argument")
      val c = col(name)
      (fn match {
        case "count" => count(c)
        case "count_distinct" => countDistinct(c)
        case "min" => min(c)
        case "max" => max(c)
        // deterministic GROUP_CONCAT: distinct + sorted (collect_set's
        // arrival order is run-dependent; array_sort pins it)
        case "group_concat" => array_join(array_sort(collect_set(c)), "|")
        // §11 numeric aggregates over integer-literal bindings (the
        // exact-micros discipline: terms are BIGINT, so SUM is exact
        // and AVG is one integer division — `DIV` truncates like
        // DuckDB's `//` floors only on non-negative operands, which
        // micro-encoded quantities are by construction)
        case "sum" => sum(c.cast("long"))
        case "avg" => expr(
          s"sum(CAST(`$name` AS BIGINT)) DIV count(`$name`)")
        case other => throw new IllegalArgumentException(
          s"unsupported aggregate '$other'")
      }).as(alias)
    }
    val aliases = aggs.map(_._3)
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val filtered = having.foldLeft(grouped) { case (d, (alias, op, k)) =>
      require(aliases.contains(alias),
        s"HAVING $alias must name an aggregate alias")
      val lhs = col(alias)
      d.filter(op match {
        case "=" => lhs === k
        case "!=" => lhs =!= k
        case "<" => lhs < k
        case "<=" => lhs <= k
        case ">" => lhs > k
        case ">=" => lhs >= k
        case other => throw new IllegalArgumentException(
          s"unsupported HAVING operator '$other'")
      })
    }
    val known = keys ++ aliases
    val ordered =
      if (orderBy.isEmpty) filtered
      else filtered.orderBy(orderBy.map { o =>
        val (name, desc) =
          if (o.startsWith("-")) (o.drop(1), true) else (o, false)
        require(known.contains(name),
          s"ORDER BY $name must be a group key or aggregate alias")
        if (desc) col(name).desc else col(name).asc
      }: _*)
    limit.fold(ordered)(n => { require(n >= 1, s"LIMIT must be >= 1, got $n")
      ordered.limit(n) })
  }

  /** Non-recursive SPARQL 1.1 property-path evaluation: a SEQUENCE of
    * legs, each leg a predicate, an INVERSE predicate (`^p`), or an
    * ALTERNATION of either (`a|^b|c`) — the `/`, `^`, `|` operators of
    * §9.1, the fragments that compose with [[closure]]'s bounded `p+`
    * to cover the paths KG consumers actually write. Path semantics per
    * the spec are SET semantics: `(subj, obj)` pairs, distinct,
    * regardless of how many distinct walks connect them.
    *
    * Scale shape: each leg is a union of predicate-filtered scans (the
    * pred equality pushes to parquet; inverse legs are a projection
    * swap, free), collapsed distinct per leg so alternation can't
    * double-count; sequencing is one equi-join per leg on the meeting
    * node with a per-round distinct that stops fan-out compounding (the
    * [[closure]] discipline). Per-node fan-out is the [[chain]]
    * exposure — AQE-covered moderate, q08-salted pathological. */
  def pathSequence(triples: DataFrame, legs: Seq[String]): DataFrame = {
    require(legs.nonEmpty, "property path needs at least one leg")
    def leg(spec: String): DataFrame = {
      val alts = spec.split("\\|", -1).toSeq
      require(alts.forall(_.nonEmpty), s"empty alternative in '$spec'")
      alts.map { a =>
        if (a.startsWith("^"))
          triples.filter(col("pred") === a.drop(1))
            .select(col("obj").as("s"), col("subj").as("o"))
        else
          triples.filter(col("pred") === a)
            .select(col("subj").as("s"), col("obj").as("o"))
      }.reduce(_ unionByName _).distinct()
    }
    legs.tail.foldLeft(leg(legs.head)) { (acc, l) =>
      acc.select(col("s"), col("o").as("m"))
        .join(leg(l).select(col("s").as("m"), col("o")), "m")
        .select("s", "o").distinct()
    }.select(col("s").as("subj"), col("o").as("obj"))
  }

  /** Compile one conjunctive pattern group to a DataFrame plus its
    * variable names in first-appearance order (shared by [[bgp]] and
    * [[bgpOptional]]). */
  private def compileGroup(triples: DataFrame,
      patterns: Seq[(String, String, String)]): (DataFrame, Seq[String]) = {
    require(patterns.nonEmpty, "BGP needs at least one pattern")
    case class Pat(i: Int, vars: Seq[(String, String)],
        consts: Seq[(String, String)])
    val pats = patterns.zipWithIndex.map { case ((s, p, o), i) =>
      val terms = Seq("subj" -> s, "pred" -> p, "obj" -> o)
      Pat(i,
        terms.collect { case (c, t) if t.startsWith("?") => (c, t.drop(1)) },
        terms.filterNot(_._2.startsWith("?")))
    }
    val allVars = pats.flatMap(_.vars.map(_._2)).distinct
    require(allVars.nonEmpty, "BGP needs at least one variable")

    def leaf(p: Pat): DataFrame = {
      val filtered = p.consts.foldLeft(triples) {
        case (df, (c, v)) => df.filter(col(c) === lit(v))
      }
      // a variable repeated within the pattern = positional equality
      val eq = p.vars.groupBy(_._2).values.filter(_.size > 1)
        .foldLeft(filtered) { (df, g) =>
          g.map(_._1).sliding(2).foldLeft(df) {
            case (d, Seq(c1, c2)) => d.filter(col(c1) === col(c2))
            case (d, _) => d
          }
        }
      val varOrder = p.vars.map(_._2).distinct
      if (varOrder.isEmpty) // EXISTS gate: 1 row if any triple matches
        eq.select(lit(true).as(s"__exists_${p.i}")).limit(1)
      else eq.select(varOrder.map(v =>
        col(p.vars.find(_._2 == v).get._1).as(v)): _*)
    }

    var bound = Set.empty[String]
    var acc: DataFrame = null
    var remaining = pats.toList
    while (remaining.nonEmpty) {
      val pick =
        if (acc == null)
          remaining.maxBy(p => (p.consts.size, -p.i))
        else {
          val conn = remaining.filter(_.vars.exists(v => bound(v._2)))
          val pool = if (conn.nonEmpty) conn else remaining
          pool.maxBy(p =>
            (p.vars.map(_._2).distinct.count(bound), p.consts.size, -p.i))
        }
      val l = leaf(pick)
      acc =
        if (acc == null) l
        else {
          val shared = pick.vars.map(_._2).distinct.filter(bound)
          if (shared.nonEmpty) acc.join(l, shared) else acc.crossJoin(l)
        }
      bound ++= pick.vars.map(_._2)
      remaining = remaining.filterNot(_.i == pick.i)
    }
    // EXISTS-gate marker columns are group-local — drop them so groups
    // compose (two groups' gates would otherwise collide by name)
    (acc.drop(acc.columns.filter(_.startsWith("__exists_")).toSeq: _*),
      allVars)
  }

  /** Bounded property-path closure (SPARQL `pred{1,maxHops}`): every
    * ordered pair `(subj, obj, hops)` connected by 1..maxHops directed
    * `pred` edges, `hops` = the MINIMAL path length — the all-pairs
    * complement of [[Bfs.distances]]' seeded single-source traversal,
    * and the materialization a `pred+` property path queries against
    * instead of re-traversing per query.
    *
    * Algorithm: level-synchronous frontier relaxation keyed by origin —
    * round d extends only round d−1's pairs by one edge, and an
    * anti-join against everything reached drops pairs already connected
    * shorter (BFS minimality, per origin). The iteration count is the
    * FIXED maxHops, so lineage depth is bounded by construction; the
    * edge list and each level are persisted (both multiply-referenced:
    * edges once per round, levels through every later anti-join), the
    * cumulative union never is — the [[Bfs]] residency contract.
    *
    * Scale shape: each round is ONE equi-join on the meeting node plus
    * one distinct and one anti-join, all AQE-planned (a tiny frontier
    * broadcasts, an exploding one shuffles); per-node fan-out is
    * in×out-degree, the [[chain]] exposure, and the per-round distinct
    * stops it compounding across rounds. The output is the transitive
    * neighborhood itself, so its size — not the plan — is the scale
    * bound: keep maxHops small on dense graphs (the same judgment call
    * every property-path engine surfaces to the user).
    */
  def closure(triples: DataFrame, pred: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = triples.filter(col("pred") === pred)
      .select(col("subj").as("src"), col("obj").as("dst"))
      .distinct().persist(lvl)
    var reached = edges.withColumn("hops", lit(1L)).persist(lvl)
    var frontier = reached
    (2 to maxHops).foreach { d =>
      val next = frontier.select(col("src"), col("dst").as("mid"))
        .join(edges.select(col("src").as("mid"), col("dst")), "mid")
        .select("src", "dst").distinct()
        .join(reached.select("src", "dst"), Seq("src", "dst"), "left_anti")
        .withColumn("hops", lit(d.toLong))
        .persist(lvl)
      reached = reached.unionByName(next)
      frontier = next
    }
    reached.select(col("src").as("subj"), col("dst").as("obj"), col("hops"))
  }

  /** UNBOUNDED reachability (SPARQL `p+` proper) to a fixpoint — the
    * datalog evaluation [[closure]]'s fixed hop bound approximates:
    * every ordered `(src, dst)` pair connected by a directed path of
    * ≥ 1 edges, SET semantics, cycles included (a node on a cycle
    * reaches itself).
    *
    * Evaluated by PATH DOUBLING, not one-edge-at-a-time semi-naive:
    * each round composes the accumulated relation with itself
    * (`R ∪ R∘R`), so round k covers all paths of ≤ 2^k edges and the
    * loop converges in ⌈log₂ diameter⌉ + 1 rounds — the measured
    * difference on the q153 condensation DAG (depth ~60 at sf0.1) was
    * 163 s of linear rounds with linearly deepening anti-join plans
    * vs seconds of doubling. The trade is per-round join fan-out
    * (Σ_mid in(m)·out(m) over the accumulated relation), which is why
    * the scaladoc contract says: run this on SMALL or CONDENSED
    * graphs — [[Scc.reachability]] collapses strongly connected
    * components first precisely so this loop only ever sees the
    * condensation. Each round ends in one eager `localCheckpoint`
    * (truncates the plan AND materializes the set the next round
    * self-joins twice); convergence is an exact size-fixpoint check —
    * `R ∪ R∘R` is a superset of R, so |next| = |R| iff no new pair
    * appeared, and the count rides the checkpoint the round pays for
    * anyway. (The earlier anti-join-delta probe computed the same fact
    * with one extra join and one extra checkpoint per round; on the
    * condensation-sized relations this loop is built for, per-round
    * scheduling dominates data volume, and halving the round's job
    * count measured q153's closure 3.4 → ~2 s at sf0.1,
    * OPTIMIZATION_r06.) */
  def closureFixpoint(edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    var reached = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    var n = reached.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = reached
        .unionByName(reached.select(col("src"), col("dst").as("mid"))
          .join(reached.select(col("src").as("mid"), col("dst")), "mid")
          .select("src", "dst"))
        .distinct().localCheckpoint()
      val m = next.count()
      converged = m == n
      reached = next
      n = m
      round += 1
    }
    reached
  }

  /** [[bgp]] with a SPARQL MINUS group: solutions of `patterns` that are
    * NOT compatible with any solution of `minusGroup` on their shared
    * variables. Per the SPARQL MINUS semantics, a minus group sharing NO
    * variable with the required patterns removes nothing (disjoint
    * domains are never compatible) — returned unchanged rather than
    * rejected, because unlike [[bgpOptional]]'s cross-product hazard the
    * degenerate case here is cheap and well-defined.
    *
    * Scale shape: the required group compiles exactly as [[bgp]]; the
    * minus group compiles once, projects to the shared variables, and
    * removes solutions through ONE left-anti equi-join — Catalyst's
    * native anti join (broadcast when the minus side measures small
    * under AQE, shuffled hash otherwise), never a per-solution subquery.
    * Required-side variables are bound from triples and thus non-null,
    * so anti-join null semantics cannot drop extra rows. */
  def bgpMinus(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      minusGroup: Seq[(String, String, String)]): DataFrame = {
    val (req, reqVars) = compileGroup(triples, patterns)
    val (m, mVars) = compileGroup(triples, minusGroup)
    val shared = mVars.filter(reqVars.contains)
    val out =
      if (shared.isEmpty) req
      else req.join(m.select(shared.map(col): _*).distinct(), shared, "left_anti")
    out.select(reqVars.map(col): _*)
  }

  /** [[bgp]] with a SPARQL `FILTER EXISTS` / `FILTER NOT EXISTS` group —
    * the correlated-subquery half of the negation surface, distinct
    * from [[bgpMinus]] exactly where the two diverge in the spec
    * (SPARQL 1.1 §8.3): when the group shares NO variable with the
    * required patterns, MINUS removes nothing (disjoint domains are
    * never compatible) while NOT EXISTS evaluates the group ONCE as an
    * un-correlated existence test and removes EVERY solution if it
    * matches at all (and EXISTS keeps every solution under the same
    * condition). With shared variables the two coincide on this
    * engine's null-free solutions, and the plan is the same single
    * semi/anti equi-join.
    *
    * Scale shape: identical to [[bgpMinus]] — the group compiles once,
    * projects to the shared variables, and gates solutions through ONE
    * left-semi (EXISTS) or left-anti (NOT EXISTS) equi-join; the
    * no-shared-variable case degenerates to a broadcast one-row gate
    * (the EXISTS-gate cross join on a `limit(1)` relation — bounded by
    * construction, never corpus-sized). */
  def bgpExists(triples: DataFrame,
      patterns: Seq[(String, String, String)],
      existsGroup: Seq[(String, String, String)],
      negate: Boolean): DataFrame = {
    val (req, reqVars) = compileGroup(triples, patterns)
    val (g, gVars) = compileGroup(triples, existsGroup)
    val shared = gVars.filter(reqVars.contains)
    val out =
      if (shared.nonEmpty)
        req.join(g.select(shared.map(col): _*).distinct(), shared,
          if (negate) "left_anti" else "left_semi")
      else {
        // un-correlated existence: ONE gate row (empty iff the group has
        // no match), broadcast; semi keeps all-or-none, anti the inverse
        val gate = g.limit(1).select(lit(true).as("__hit"))
        req.join(broadcast(gate), lit(true),
          if (negate) "left_anti" else "left_semi")
      }
    out.select(reqVars.map(col): _*)
  }

  /** Bounded transitive reduction audit over one predicate's edge set:
    * flag each asserted edge `(u, v)` as `redundant` when a SIMPLE
    * directed path of length 2..`maxHops` (distinct nodes — no node
    * revisited, so in particular the path never traverses `(u, v)`
    * itself) also connects `u` to `v` — the edge a minimal ontology
    * would NOT assert because it is entailed by composition (Aho, Garey
    * & Ullman '72; the maintenance pass that keeps crawled
    * `subClassOf`/`partOf` hierarchies minimal, since web sources
    * routinely assert both `A⊑B⊑C` and the shortcut `A⊑C`). The
    * simple-path restriction is what makes the audit cycle-safe: on a
    * 2-cycle `{(a,b),(b,a)}` a WALK-based check flags both edges via
    * the walk that traverses the edge under audit, disconnecting the
    * cycle — here neither is flagged, because no alternate path exists.
    * Simple paths lose no entailment: any u→v walk avoiding `u`/`v` as
    * intermediates contains a shorter such walk within the hop bound
    * whenever it repeats a node, terminating at a simple path. Asserted
    * self-loops are never flagged (cycle entailment is not composition
    * of a partial order — a reflexive-assertion policy belongs to the
    * caller). Returns the full edge set as
    * `(subj, pred, obj, redundant)` — `filter(!redundant)` is the
    * reduced graph; keeping the flag makes the audit, not just its
    * survivors, the output. On a DAG the reduction is unique and
    * hop-bounding it keeps the cost explicit: an edge bypassing a path
    * LONGER than `maxHops` stays unflagged — the same bounded-depth
    * judgment call [[closure]] surfaces.
    *
    * Distinct from [[closure]]: closure's per-origin anti-join records
    * each pair at its MINIMAL depth, so a directly-connected pair never
    * reappears at depth ≥ 2 — exactly the signal reduction needs — which
    * is why this enumerates paths WITHOUT the minimality anti-join.
    *
    * Scale shape: `maxHops − 1` equi-joins on the meeting node, each
    * frontier row carrying its ≤ `maxHops`-entry visited array (the
    * per-path state simple-path semantics requires — a pair-level
    * distinct would conflate entailing paths with walks through the
    * audited edge); fan-out is simple-path-bounded, which is why the
    * hop bound is the explicit cost knob and callers keep it small
    * (2–4). The edge list persists across its ≤ maxHops+1 references;
    * the final flag is one left join of edges against the deduped
    * 2..maxHops-entailed pairs on `(u, v)`. Per-node fan-out is
    * in×out-degree per round — the [[chain]] exposure, AQE-covered in
    * the moderate case, q08-salted in the pathological one.
    */
  def transitiveReduction(triples: DataFrame, pred: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 2, s"maxHops must be >= 2, got $maxHops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = triples.filter(col("pred") === pred)
      .select(col("subj").as("src"), col("obj").as("dst"))
      .distinct().persist(lvl)
    // composition edges: a self-loop entails nothing and would otherwise
    // manufacture u→u→v "paths" that self-flag (see scaladoc)
    val we = e.filter(col("src") =!= col("dst"))
    // frontier = simple paths of exactly d hops: (src, dst, seen) with
    // seen = [src, intermediates...]; extending bans revisits, so dst is
    // never src or a prior intermediate — path semantics, not walks
    var paths = we.select(col("src"), col("dst"), array(col("src")).as("seen"))
    val entailed = (2 to maxHops).map { _ =>
      paths = paths
        .select(col("src"), col("dst").as("mid"),
          array_union(col("seen"), array(col("dst"))).as("seen"))
        .join(we.select(col("src").as("mid"), col("dst")), "mid")
        .filter(!array_contains(col("seen"), col("dst")))
        .select(col("src"), col("dst"), col("seen"))
      paths.select("src", "dst")
    }
    val multi = entailed.reduce(_ unionByName _).distinct()
    e.join(multi.withColumn("__r", lit(true)), Seq("src", "dst"), "left")
      .select(col("src").as("subj"), lit(pred).as("pred"),
        col("dst").as("obj"), coalesce(col("__r"), lit(false)).as("redundant"))
  }

  /** Diff two KG snapshots keyed by the full triple:
    * `(subj, pred, obj, status)` with status ∈ kept | added | removed
    * (kept = in both, added = only in `b`, removed = only in `a`) — the
    * crawl-over-crawl audit that MERGE (q51) applies and this REPORTS.
    *
    * Both sides must be distinct on `(subj, pred, obj)` (the pipeline's
    * triples are; same documented precondition as
    * [[SnapshotMerge]]'s base) — duplicate keys would multiply
    * full-outer matches. Scale shape: one co-partitioned full-outer
    * sort-merge join on the triple key; landing both snapshots as
    * `bucketBy`(triple-key) tables (the q49 layout) deletes even that
    * exchange for repeated diffs.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val key = Seq("subj", "pred", "obj")
    a.select(key.map(col): _*).withColumn("in_a", lit(true))
      .join(b.select(key.map(col): _*).withColumn("in_b", lit(true)),
        key, "full_outer")
      .select(col("subj"), col("pred"), col("obj"),
        when(col("in_a").isNotNull && col("in_b").isNotNull, "kept")
          .when(col("in_b").isNotNull, "added")
          .otherwise("removed").as("status"))
  }

  /** Temporal scoping of facts — the provenance window a temporal KG
    * attaches to each `(subj, pred)`: over triples carrying a crawl
    * timestamp column `ts_s` (epoch seconds), the first/last time the
    * fact was observed, how many distinct pages ground it, and the
    * validity span: `(subj, pred, n_obs, first_seen_s, last_seen_s,
    * span_s)`.
    *
    * One map-side-combined aggregate keyed by (subj, pred); min/max/count
    * only, so a head entity grounded by millions of pages costs
    * comparisons, never a buffer.
    */
  def temporalScope(triples: DataFrame): DataFrame =
    triples.groupBy(col("subj"), col("pred"))
      .agg(count(lit(1)).as("n_obs"),
        min(col("ts_s")).as("first_seen_s"),
        max(col("ts_s")).as("last_seen_s"))
      .withColumn("span_s", col("last_seen_s") - col("first_seen_s"))
}

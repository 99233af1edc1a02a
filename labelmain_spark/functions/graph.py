"""Connected components — the wallet-clustering operator.

The reference's walletexplorer source is precisely this: addresses
belong to one wallet when they co-occur (walletexplorer/main.go:73-106
wallet → addresses pages — the site itself derives clusters from
co-spending). The engine form: a bipartite co-occurrence graph
(user ↔ attribute) and hash-min label propagation to a fixpoint —
every node ends labeled with the smallest user id reachable from it.

Algorithm (alternating hash-min on the bipartite graph):
  comp(u) := u
  repeat: comp(p) := min comp(u) over edges; comp(u) := min(comp(u),
  min comp(p) over edges) — converges in O(component diameter) rounds.
Each round is two keyed aggregations + joins (all shuffles on u or p,
map-side combinable); the driver only counts changed labels to detect
the fixpoint — the same driver-coordinated loop structure GraphX/
GraphFrames use for iterative algorithms. Lineage is truncated every
round by materializing the persisted label table (otherwise the plan
doubles per iteration and planning time explodes by round ~15).

The DuckDB oracle computes the identical fixpoint with a recursive
CTE (propagate smaller labels through 2-hop bipartite edges, take the
per-node minimum) — a full value-hash oracle for an iterative graph
algorithm.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

MAX_ITER = 30


def connected_components(
    edges: DataFrame,
    max_iter: int = MAX_ITER,
    stats: dict | None = None,
    driver_tier: bool = True,
) -> DataFrame:
    """edges: (u long, p *) bipartite adjacency. Returns (u, component)
    where component = min u in the connected component.

    TIERED on the measured edge count (the heavy_hitters discipline —
    a runtime statistic picks the plan, and both tiers are
    output-identical by construction):

    - ``n_edges ≤ SMALL_PLAN_ROWS`` (200k distinct edge rows): DRIVER
      union-find. The distributed loop costs O(diameter) rounds of
      2 joins + 2 partial aggs + a fixpoint-probe action EACH — pure
      dispatch at this size (measured r12: dedup_clusters 7.36 →
      ~3.4 s at sf0.1, the loop was HALF the key's wall on a graph of
      a few thousand edges). The collect is bounded by the same
      constant that already gates small_plan_conf (~200k narrow rows,
      single-digit MB); path-compressed union-find labels it in one
      driver pass and ships the labels back as one small frame.
    - above the bound: the distributed hash-min loop below, unchanged
      — at 100 TB the LSH-pruned pair graph blows the bound and this
      is the tier that runs (``driver_tier=False`` forces it; the
      loop-shape pytests pin it explicitly).

    The distributed tier raises RuntimeError if the fixpoint is not
    reached within ``max_iter`` rounds — silently returning
    half-propagated labels would be a WRONG answer for any component
    with diameter beyond the budget (each alternating round
    propagates labels ~2 hops, so max_iter=30 covers diameter ≈ 60;
    real co-occurrence graphs are far shallower). ``stats['rounds']``
    reports the rounds actually used (0 = driver tier;
    ``stats['tier']`` names the tier), so tests can pin convergence =
    O(diameter) — in particular that a giant star component (one hub
    attribute, the 100 TB skew hazard) converges in 2 effective
    rounds, not O(n): both per-round aggregations are Catalyst
    partial-agg (map-side local min, then global min per key), so the
    hub key receives one partial row per upstream partition rather
    than the whole membership."""
    from labelmain_spark.session import SMALL_PLAN_ROWS, small_plan_conf

    edges = edges.select("u", "p").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()
    if driver_tier and n_edges <= SMALL_PLAN_ROWS:
        out = _driver_union_find(edges, stats)
        edges.unpersist()
        return out
    comp = (
        edges.select("u").distinct().select("u", F.col("u").alias("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # The node count this prime returns doubles as the runtime
    # statistic gating the loop's execution conf: a fixpoint loop over
    # a few hundred cached label rows is scheduling-bound under the
    # session's AQE conf (each round fans into 7+ near-empty-task
    # jobs), so small graphs iterate single-partition — see
    # session.small_plan_conf for the measurement and the
    # why-this-is-not-hand-scheduling argument.
    n_nodes = comp.count()
    if stats is not None:
        stats["tier"] = "distributed"
    with small_plan_conf(edges.sparkSession, n_nodes <= SMALL_PLAN_ROWS):
        return _hash_min_loop(edges, comp, max_iter, stats)


def _driver_union_find(edges: DataFrame, stats: dict | None) -> DataFrame:
    """Path-compressed union-find over a BOUNDED collected edge list —
    bit-identical labels to the hash-min loop (component = min u, both
    are the connected-components fixpoint, which is unique). One
    collect + one createDataFrame replace O(diameter) × (2 joins +
    2 aggs + 1 action)."""
    from pyspark.sql.types import StructField, StructType

    spark = edges.sparkSession
    pdf = edges.toPandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    anchor: dict = {}  # p -> first u seen (pair-nodes never labeled)
    for u, p in zip(pdf["u"], pdf["p"]):
        if u not in parent:
            parent[u] = u
        a = anchor.setdefault(p, u)
        if a != u:
            ra, ru = find(a), find(u)
            if ra != ru:
                # attach larger root under smaller so roots trend to
                # the min (final labels still take an explicit min)
                if ru < ra:
                    ra, ru = ru, ra
                parent[ru] = ra
    lo: dict = {}
    for u in parent:
        r = find(u)
        if r not in lo or u < lo[r]:
            lo[r] = u
    rows = [(u, lo[find(u)]) for u in parent]
    if stats is not None:
        stats["rounds"] = 0
        stats["tier"] = "driver"
    ufield = edges.schema["u"]
    schema = StructType(
        [
            StructField("u", ufield.dataType, ufield.nullable),
            StructField("component", ufield.dataType, True),
        ]
    )
    return spark.createDataFrame(
        [(_py(u), _py(c)) for u, c in rows], schema
    )


def _py(v):
    """numpy scalar → plain python for createDataFrame."""
    return v.item() if hasattr(v, "item") else v


def _hash_min_loop(
    edges: DataFrame, comp: DataFrame, max_iter: int, stats: dict | None
) -> DataFrame:
    rounds = 0
    for _ in range(max_iter):
        comp_p = (
            edges.join(comp, "u").groupBy("p").agg(F.min("comp").alias("pcomp"))
        )
        proposed = (
            edges.join(comp_p, "p").groupBy("u").agg(F.min("pcomp").alias("newcomp"))
        )
        merged = (
            comp.join(proposed, "u", "left")
            .select(
                "u",
                F.least(F.col("comp"), F.coalesce(F.col("newcomp"), F.col("comp"))).alias("comp"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            merged.join(comp.withColumnRenamed("comp", "old"), "u")
            .filter(F.col("comp") != F.col("old"))
            .count()  # fixpoint probe — one scalar per round, as in GraphX
        )
        comp.unpersist()
        comp = merged
        rounds += 1
        if changed == 0:
            break
    else:
        edges.unpersist()
        comp.unpersist()
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            f"({changed} labels still changing) — component diameter exceeds "
            f"the iteration budget; raise max_iter"
        )
    if stats is not None:
        stats["rounds"] = rounds
    edges.unpersist()
    return comp.select("u", F.col("comp").alias("component"))


def user_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wallet-cluster analog: users linked by sharing a props attribute
    on signup events; output per-component membership plus size."""
    ev = load_table(spark, sf_dir, "events")
    edges = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("p"),
    ).filter(F.col("p").isNotNull())
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return cc.join(sizes, "component").select(
        F.col("u").alias("user_id"), "component", "component_size"
    )


PR_ITERS = 5
PR_SCALE = 1_000_000_000  # rank carried as integer 1e-9 units
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (Brin/Page 1998) over the directed
    user → attribute graph (src = user_id, dst = props.k — the same
    co-occurrence edges user_components clusters, directed): influence
    scoring for wallet-graph / citation-graph analytics.

    INTEGER PageRank: rank is carried as exact 1e-9 units (longs) and
    every operation is integer — r0 = SCALE DIV N, per-edge
    contribution = units DIV outdeg, damping = (85·Σ) DIV 100 — so
    the five unrolled iterations are bit-exact in ANY engine (no
    float sum order, nothing to round; the ≤1e-9-per-step quantization
    is far below any ranking-relevant difference). Dangling mass
    (nodes without out-edges) is dropped rather than redistributed —
    the common simplification; the Google-matrix variant adds one
    broadcast 1-row dangling aggregate per iteration.

    Scale: per iteration — one shuffle join of ranks onto edges keyed
    src, one map-side-combinable long-sum agg keyed dst, one left
    join back onto the node set. Edges/degrees/node-base persist once
    (the connected_components lineage discipline); five iterations =
    bounded plan depth, no fixpoint probe (the iteration count is
    fixed by contract, matching the oracle's unrolled CTEs). The
    corpus-scale passes (edge distinct, node count) run under the
    session conf; the ITERATIONS run under small_plan_conf gated on
    the MEASURED node count and materialize once at the end — a tiny
    cached graph otherwise pays 15 stages of AQE job fan-out (the
    connected_components measurement), while a big graph keeps AQE.
    The node-count probe + final materialization are the same
    eager-bounded-action class as the CC fixpoint probe."""
    from labelmain_spark.operators.parity import stable_round
    from labelmain_spark.session import SMALL_PLAN_ROWS, small_plan_conf

    ev = load_table(spark, sf_dir, "events")
    e = (
        ev.select(
            F.col("user_id").alias("src"),
            F.get_json_object("props", "$.k").cast("long").alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .distinct()
    )
    return integer_pagerank(spark, e)


def integer_pagerank(
    spark: SparkSession, edges: DataFrame, driver_tier: bool = True
) -> DataFrame:
    """The integer-PageRank core over an arbitrary ``(src, dst)`` edge
    frame (node type free — longs for the event graph, domain strings
    for the web graph): the :func:`pagerank` contract (exact 1e-9-unit
    longs, fixed PR_ITERS, dangling mass dropped, small-graph
    iterations under the gated conf) factored out so every graph
    source shares one verified loop.

    TIERED like connected_components (r12): below SMALL_PLAN_ROWS
    distinct edges (bounded single-digit-MB collect) the five
    iterations run as driver-side integer arithmetic — the SAME exact
    math (floor-div contributions, integer damping ratio; integer
    sums are order-free, so the result is bit-identical by
    construction, pinned by a tier-equivalence pytest) — because at
    this size each distributed iteration is one join + one agg + one
    left join of pure dispatch. The returned frame still computes
    ``pr`` with the Spark-side stable_round expression so the one
    float in the output has a single engine spelling. Above the bound
    the distributed loop below runs unchanged
    (``driver_tier=False`` forces it)."""
    from labelmain_spark.operators.parity import stable_round
    from labelmain_spark.session import SMALL_PLAN_ROWS, small_plan_conf

    e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    if driver_tier and e.count() <= SMALL_PLAN_ROWS:
        out = _driver_pagerank(spark, e)
        e.unpersist()
        return out
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    deg = e.join(outdeg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    st = nodes.agg(F.count(F.lit(1)).alias("n"))
    base_nodes = (
        nodes.crossJoin(F.broadcast(st))
        .select(
            "node",
            F.expr(f"{PR_SCALE} DIV n").alias("units"),
            F.expr(
                f"(({PR_SCALE} DIV n) * {PR_D_DEN - PR_D_NUM}) DIV {PR_D_DEN}"
            ).alias("base"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = base_nodes.count()  # materializes the corpus passes too
    r = base_nodes.select("node", "units")
    for _ in range(PR_ITERS):
        s = (
            deg.join(r, deg["src"] == r["node"])
            .select(F.col("dst"), F.expr("units DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            base_nodes.select("node", "base")
            .join(s, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.col("base")
                    + F.expr(f"({PR_D_NUM} * coalesce(s, 0)) DIV {PR_D_DEN}")
                ).alias("units"),
            )
        )
    out = r.select(
        "node",
        F.col("units").alias("rank_units"),
        stable_round(F.col("units").cast("double") / F.lit(1e9), 9).alias("pr"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    with small_plan_conf(spark, n_nodes <= SMALL_PLAN_ROWS):
        out.count()  # run the cached-graph iterations under the gated conf
    return out


def _driver_pagerank(spark: SparkSession, e: DataFrame) -> DataFrame:
    """PR_ITERS of the integer-PageRank recurrence on a BOUNDED
    collected edge list — every operation the distributed loop does
    (r0 = SCALE DIV N, contribution = units DIV outdeg, damping =
    85·Σ DIV 100, dangling mass dropped) as python ints, which are
    exact and order-free, so the rank_units are bit-identical."""
    from collections import Counter, defaultdict

    from pyspark.sql.types import LongType, StructField, StructType

    from labelmain_spark.operators.parity import stable_round

    pdf = e.toPandas()
    src = [_py(v) for v in pdf["src"]]
    dst = [_py(v) for v in pdf["dst"]]
    outdeg = Counter(src)
    nodes = set(src) | set(dst)
    # empty graph → r0 irrelevant (no nodes to seed), empty typed
    # frame below — matching the distributed tier whose DIV n never
    # evaluates on zero rows
    r0 = PR_SCALE // len(nodes) if nodes else 0
    base = (r0 * (PR_D_DEN - PR_D_NUM)) // PR_D_DEN
    units = dict.fromkeys(nodes, r0)
    for _ in range(PR_ITERS):
        s: dict = defaultdict(int)
        for a, b in zip(src, dst):
            s[b] += units[a] // outdeg[a]
        units = {v: base + (PR_D_NUM * s[v]) // PR_D_DEN for v in nodes}
    ntype = e.schema["src"].dataType
    frame = spark.createDataFrame(
        list(units.items()),
        StructType(
            [StructField("node", ntype, True), StructField("rank_units", LongType(), True)]
        ),
    )
    # pr via the SAME Spark expression as the distributed tier — one
    # engine spelling for the output's only float
    return frame.select(
        "node",
        "rank_units",
        stable_round(F.col("rank_units").cast("double") / F.lit(1e9), 9).alias("pr"),
    )


def _pagerank_oracle(
    edge_sql: str = """
            SELECT DISTINCT user_id AS src,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS dst
            FROM events
            WHERE json_extract(props, '$.k') IS NOT NULL
    """,
) -> str:
    """Unrolled-CTE integer-PageRank oracle over an arbitrary edge CTE
    (the :func:`integer_pagerank` twin — same parameterization)."""
    from labelmain_spark.operators.parity import sql_stable_round

    its = []
    for i in range(1, PR_ITERS + 1):
        its.append(f"""r{i} AS (
            SELECT b.node,
                   CAST(b.base + (({PR_D_NUM} * COALESCE(s.s, 0))
                        // {PR_D_DEN}) AS BIGINT) AS units,
                   b.base
            FROM r{i - 1} b LEFT JOIN (
                SELECT e.dst, CAST(SUM(r.units // d.outdeg) AS BIGINT) AS s
                FROM e JOIN r{i - 1} r ON e.src = r.node
                       JOIN deg d ON e.src = d.src
                GROUP BY e.dst
            ) s ON b.node = s.dst
        )""")
    chain = ",\n        ".join(its)
    return f"""
        WITH e AS (
            {edge_sql}
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        st AS (SELECT COUNT(*) AS n FROM nodes),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (
            SELECT node, CAST({PR_SCALE} // n AS BIGINT) AS units,
                   CAST((({PR_SCALE} // n) * {PR_D_DEN - PR_D_NUM})
                        // {PR_D_DEN} AS BIGINT) AS base
            FROM nodes, st
        ),
        {chain}
        SELECT node, units AS rank_units,
               {sql_stable_round("CAST(units AS DOUBLE) / 1e9", 9)} AS pr
        FROM r{PR_ITERS}
    """


QUERIES = {"user_components": user_components, "pagerank": pagerank}

ORACLE = {
    "pagerank": _pagerank_oracle(),
    "user_components": """
        WITH edges AS (
            SELECT DISTINCT user_id AS u,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS p
            FROM events
            WHERE event_type = 'signup'
              AND json_extract(props, '$.k') IS NOT NULL
        ),
        reach AS (
            WITH RECURSIVE r(u, comp) AS (
                SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e2.u, r.comp
                FROM r
                JOIN edges e1 ON e1.u = r.u
                JOIN edges e2 ON e2.p = e1.p
                WHERE r.comp < e2.u
            )
            SELECT u, MIN(comp) AS component FROM r GROUP BY u
        )
        SELECT reach.u AS user_id, component,
               COUNT(*) OVER (PARTITION BY component) AS component_size
        FROM reach
    """,
}

"""Graph query suite: BFS k-hop and transitive reachability.

The reference's traversal surface (J6-J8) over an arithmetic synthetic
edge table; oracles are DuckDB recursive CTEs — a genuinely different
evaluation strategy (semi-naive recursion) validating the iterated
self-join plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import graph
from .registry import register

_SEEDS = [0, 1, 2]


@register(
    "bfs_khop",
    graph.bfs_oracle(_SEEDS, 4),
    doc="BFS ≤4 hops from seeds {0,1,2} with min-depth labels "
    "(edge_store.py:592-631 analog; SURVEY.md J6). Oracle: recursive CTE.",
)
def q_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.bfs_khop(spark, graph.edges_df(spark, "bfs"), _SEEDS, 4)


@register(
    "reachability",
    graph.reach_oracle(0),
    doc="Transitive closure from vertex 0 on a layered DAG — fixpoint "
    "iterated self-join (class_hierarchy.py:222-328; SURVEY.md J8).",
)
def q_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.reach_fixpoint(spark, graph.edges_df(spark, "dag"), 0)


@register(
    "shortest_path_trace",
    graph.shortest_path_trace_oracle(0, 1813, 14),
    doc="Witness shortest path 0→1813 as a vertex chain (path "
    "reconstruction, call_path.py:520-639; SURVEY.md J7): BFS min-depth "
    "labels + deterministic min-pred chain, walked back from the target. "
    "Oracle: linear recursive CTE over the identical pred table.",
)
def q_shortest_path_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.shortest_path_trace(
        spark, graph.edges_df(spark, "dag"), 0, 1813, 14
    )


@register(
    "weighted_sssp",
    graph.weighted_sssp_oracle(0),
    doc="Single-source shortest WEIGHTED distances from vertex 0 "
    "(distributed Bellman-Ford: per round one edge-relaxation join + "
    "min-agg, fixpoint on the layered DAG; deterministic md5-derived "
    "integer weights 1-5 shared with the oracle's recursive CTE). "
    "Extends J7 beyond hop counts to true edge weights.",
)
def q_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.weighted_sssp(spark, graph.weighted_edges_df(spark), 0)


@register(
    "shortest_path",
    graph.shortest_path_oracle(0, 1813, 20),
    doc="Bidirectional meet-in-the-middle shortest path 0→1813 on the DAG "
    "(call_path.py:210-276, SURVEY.md J7). Oracle: recursive CTE min depth.",
)
def q_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.bidirectional_shortest_path(
        spark, graph.edges_df(spark, "dag"), 0, 1813, 20
    )


@register(
    "bidir_path",
    graph.bidir_paths_oracle(),
    doc="Weighted bidirectional path search with path-signature dedup "
    "(call_path.py:210-276, 520-639 — round-4 verdict #5): exact "
    "Bellman-Ford distances, then forward/backward half-signature "
    "enumeration over the TIGHT-edge (shortest-path) DAG meeting on "
    "the split vertex; the same full path arrives once per valid "
    "split, so count(DISTINCT sig) is the signature dedup. Emits "
    "(dst, dist, n_paths, best_path) for the 1800+ destination layer; "
    "dist is pinned equal to weighted_sssp by pytest.",
)
def q_bidir_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.bidir_paths(spark, graph.weighted_edges_df(spark))


@register(
    "connected_components",
    graph.connected_components_oracle("bfs"),
    doc="Connected components of the undirected event graph via min-label "
    "propagation (per-round neighbor join + min-agg, scalar convergence "
    "probe) — the classic iterative graph algorithm Spark expresses as "
    "joins; oracle: undirected reachability closure (recursive CTE), a "
    "genuinely different evaluation strategy.",
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.connected_components(spark, graph.edges_df(spark, "bfs"))


@register(
    "pagerank3",
    graph.pagerank_oracle(3),
    doc="Fixed-3-iteration PageRank with integer-quantized ranks "
    "(micro-units, floor at every step): the flagship iterative "
    "join-algebra algorithm made bit-reproducible across engines and "
    "partitionings — per iteration one vertex-keyed contribution join + "
    "sum-agg, never all-pairs. Simplified variant (dangling mass not "
    "redistributed), documented in operators/graph.py.",
)
def q_pagerank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.pagerank_fixed(spark, graph.edges_df(spark, "dag"), 3)


@register(
    "triangle_count",
    graph.triangle_count_oracle("bfs"),
    doc="Triangle count on the undirected event graph — the classic "
    "multi-way distributed self-join (canonical a<b<c ordering counts "
    "each triangle once; every hop is a vertex-keyed equi-join). Oracle: "
    "the same 3-way join, naive SQL.",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.triangle_count(graph.edges_df(spark, "bfs"))


@register(
    "degree_histogram",
    f"""
WITH base AS ({graph.edges_sql("bfs")}),
deg AS (SELECT src AS v, count(*) AS degree FROM base GROUP BY src)
SELECT degree, count(*) AS n_vertices FROM deg GROUP BY degree
""",
    doc="Out-degree distribution of the event graph (two-level "
    "aggregation: per-vertex degree, then vertices per degree) — the "
    "graph-health profile every edge-table needs before traversals.",
)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    deg = (
        graph.edges_df(spark, "bfs")
        .groupBy("src")
        .agg(F.count("*").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").alias("n_vertices"))


@register(
    "kcore_community",
    graph.kcore_oracle_sql(),
    doc="k-core decomposition (k=8, fixed 8-round unrolled peel, "
    "convergence pinned by pytest): the planted 300-vertex dense block "
    "survives, the sparse background peels away in cascades — the "
    "community-detection primitive. Spark: degree agg + two semi-joins "
    "per round, vertex-keyed only, lineage cut every second round; "
    "oracle: chained MATERIALIZED CTEs (materialization is load-bearing "
    "— each level is referenced twice and would otherwise re-evaluate "
    "exponentially).",
)
def q_kcore_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.kcore(spark, graph.core_edges_df(spark))


@register(
    "hits_ranks",
    graph.hits_oracle(2),
    doc="HITS hubs & authorities (Kleinberg 1999), 2 fixed iterations in "
    "pure integer arithmetic (no per-step normalization needed in 64-bit; "
    "single end max-normalization to 0..1e6) — per iteration two "
    "vertex-keyed equi-joins + sum-aggs, the PageRank join algebra with "
    "the transposed second step. Oracle: unrolled CTEs.",
)
def q_hits_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.hits_fixed(spark, graph.edges_df(spark, "bfs"), 2)


@register(
    "link_prediction",
    graph.link_prediction_oracle(),
    doc="Common-neighbor + Adamic-Adar link prediction (Liben-Nowell & "
    "Kleinberg 2003): distance-2 non-edge candidates generated THROUGH "
    "the shared neighbor (wedge equi-join, aggregated in-stream — the "
    "pair list never materializes), 1/ln(deg) replaced by the exact "
    "integer bit-length log2, celebrity cap deg<=64 bounds the wedge "
    "fan, anti-join removes existing edges, deterministic top-50.",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.link_prediction(spark, graph.edges_df(spark, "bfs"))


@register(
    "ppr_seed0",
    graph.ppr_oracle(0),
    doc="Personalized PageRank from seed vertex 0 (random walk with "
    "restart — the graph recommender primitive), 3 fixed iterations, "
    "integer micro-unit ranks flooring at every step: same vertex-keyed "
    "contribution join + sum-agg algebra as pagerank3 with teleport "
    "mass concentrated on the seed. Oracle: unrolled CTEs.",
)
def q_ppr_seed0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.ppr_fixed(spark, graph.edges_df(spark, "dag"), 0)


@register(
    "label_propagation",
    graph.label_propagation_oracle(),
    doc="Deterministic synchronous label propagation (plurality label of "
    "undirected neighbors, smallest-label tie-break), 2 rounds: per "
    "round one adjacency join + two-level aggregate with the argmax "
    "folded into a single packed bigint max — community detection "
    "beside connected_components' min-label propagation.",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.label_propagation(spark, graph.edges_df(spark, "bfs"))


@register(
    "ktruss_edges",
    graph.ktruss_oracle_sql(),
    doc="4-truss decomposition (Cohen 2008) of the planted-core graph: "
    "edges kept only while supported by ≥2 triangles, 5 unrolled peel "
    "rounds (pytest pins rounds == rounds+1 convergence); triangles "
    "enumerated canonically a<b<c through two vertex-keyed equi-joins, "
    "per-edge support aggregated in-stream, peel = one semi-join. "
    "Oracle: chained MATERIALIZED CTEs (each level referenced 3x).",
)
def q_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.ktruss(spark, graph.core_edges_df(spark))


@register(
    "modularity_score",
    graph.modularity_oracle_sql(),
    doc="Newman modularity of the label-propagation partition, exact in "
    "integers via Q+1 = (4m*sum_intra - sum_D2 + 4m^2)/(4m^2) (Q >= -1/2 "
    "keeps the numerator positive, so DIV is engine-identical): "
    "per-community members/intra-edges/degree-mass plus the global "
    "q_plus1_micro replicated from a broadcast one-row frame — the "
    "partition-quality audit beside the partition itself.",
)
def q_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.modularity(spark, graph.edges_df(spark, "bfs"))


@register(
    "rich_club",
    graph.rich_club_oracle(),
    doc="Rich-club coefficient ladder (Zhou & Mondragon 2004): for each "
    "degree threshold k in (4,5,6,7), the per-mille density among "
    "nodes of degree > k — exact integers, one degree aggregation + "
    "two broadcast vertex joins + a 4-row ladder fan over bounded "
    "frames; the edge list is read once for the whole ladder.",
)
def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.rich_club(spark, graph.edges_df(spark, "bfs"))


@register(
    "edge_reciprocity",
    graph.reciprocity_oracle(),
    doc="Directed-edge reciprocity (Newman): fraction of non-loop edges "
    "whose reverse also exists — one semi-join of the edge list against "
    "its own transpose; scalar envelope stays a DataFrame (no collect).",
)
def q_edge_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.reciprocity(graph.edges_df(spark, "bfs"))


@register(
    "walk_corpus",
    graph.walk_corpus_oracle(),
    doc="Deterministic random-walk skip-gram corpus (DeepWalk/node2vec "
    "p=q=1 preprocessing): one walk per vertex, step r = md5(v, step) % "
    "outdeg picks the rank-r neighbor — both engines replay the "
    "identical corpus; output is the (center, context, cnt) "
    "co-occurrence table (window <= 2) an embedding trainer consumes. "
    "Each step is one vertex-keyed equi-join; pair fan linear in walk "
    "mass.",
)
def q_walk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.walk_corpus(spark, graph.edges_df(spark, "bfs"))


@register(
    "diameter_sweep",
    graph.diameter_oracle(),
    doc="Graph diameter lower bound by the double BFS sweep (Magnien et "
    "al. 2009): BFS from a fixed root, restart from the farthest vertex "
    "(max depth, min id), report its eccentricity + the far endpoint. "
    "Reuses the broadcast-guarded two-hops-per-round BFS; the only "
    "driver value is the one-row argmax pick between sweeps.",
)
def q_diameter_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.diameter_sweep(spark, graph.edges_df(spark, "bfs"))


@register(
    "local_clustering",
    graph.local_clustering_oracle(),
    doc="Per-vertex local clustering coefficient (Watts & Strogatz): "
    "triangles through each vertex over its possible wedges, "
    "lcc_pm = 2000*t_v DIV (deg*(deg-1)); triangles enumerated once in "
    "canonical a<b<c order, each crediting its three corners through an "
    "in-stream explode aggregate; deg>=2 vertices with no triangles "
    "appear with lcc 0.",
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.local_clustering(graph.edges_df(spark, "bfs"))


@register(
    "assortativity",
    graph.assortativity_oracle(),
    doc="Rank-based degree assortativity (Newman via Spearman, exact in "
    "integers) on the planted-core graph: both endpoint-degree "
    "coordinates re-ranked over the symmetric endpoint list with the "
    "unique (deg,a,b,dir) order, rho = 1 - 6*sum(d^2)/(M(M^2-1)) as "
    "sign + abs milli. The dense block makes the degree elite genuinely "
    "interconnected: rho ~ +0.49, real signal.",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.assortativity(spark, graph.core_edges_df(spark))


@register(
    "stress_centrality",
    graph.stress_oracle(),
    doc="Sampled-source stress centrality (Shimbel 1953; Brandes & Pich "
    "2007 sampling): number of shortest (source, target) paths passing "
    "through each vertex, top-20 — the all-integer betweenness-family "
    "member: forward BFS carries shortest-path counts sigma, backward "
    "pass folds continuation counts f by descending depth, sigma*f is "
    "exactly the interior path count. Depth cap 9 > max source ecc 7 "
    "(pinned), chained-MATERIALIZED-CTE oracle, per-round frontier "
    "checkpoints; each round one frontier equi-join + vertex-keyed agg.",
)
def q_stress_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.stress_centrality(spark, graph.edges_df(spark, "bfs"))


@register(
    "bipartite_check",
    graph.bipartite_oracle("bfs"),
    doc="Two-colorability per component with deterministic witnesses: "
    "color = BFS-layer parity from the component's canonical min-id "
    "root (the connected_components label), odd-edge count = edges "
    "joining equal-parity endpoints (self-loops are length-1 odd "
    "cycles). Per component: sizes, odd-edge witnesses, bipartite "
    "verdict, eccentricity-from-root. Min-label CC pass + one "
    "frontier BFS (frontier-only checkpoints) + two hash joins for "
    "the witness pass.",
)
def q_bipartite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.bipartite_check(spark, graph.edges_df(spark, "bfs"))


@register(
    "harmonic_centrality",
    graph.harmonic_oracle("bfs"),
    doc="Harmonic centrality (Boldi & Vigna 2014) of 8 deterministic "
    "seed vertices, depth-capped at 12: every reciprocal distance "
    "enters as the integer 27720/d (lcm(1..12) — no float harmonic "
    "sum), H in exact 1/27720 units plus reached counts and distance "
    "sums. One multi-source frontier BFS carrying (seed, v) state; "
    "frontier-only checkpoints; vertex-keyed shuffled joins.",
)
def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.harmonic_centrality(spark, graph.edges_df(spark, "bfs"))


@register(
    "katz_centrality",
    graph.katz3_oracle("dag"),
    doc="3-truncated Katz centrality (Katz 1953) with beta=1/4 scaled "
    "by 64 so everything is an exact walk count: katz_q = 16*w1 + "
    "4*w2 + w3, walk counts via the textbook x_{k+1}(v) = sum of "
    "x_k over in-neighbors — one vertex-keyed join + agg per round, "
    "walks never materialized. Oracle: 3 unrolled CTE steps. The "
    "damped-influence ranking beside pagerank3's stochastic one and "
    "hits_ranks' mutual-reinforcement one.",
)
def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.katz3(spark, graph.edges_df(spark, "dag"))


# --- round 3 (cont. 9): motif census + parallel Louvain move -----------------


@register(
    "motif_counts",
    graph.motif_counts_oracle("bfs"),
    doc="Subgraph motif census: wedges ΣC(deg,2) and 3-stars ΣC(deg,3) "
    "off the degree dimension, triangles via the oriented two-hop "
    "join, 4-cycles via the diagonal identity C4 = ½ΣC(codeg,2) with "
    "the codegree frame aggregated in-stream (pair rows die inside "
    "their join stage). The graphlet primitives beyond triangle_count.",
)
def q_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.motif_counts(spark, graph.edges_df(spark, "bfs"))


@register(
    "louvain_move",
    graph.louvain_move_oracle("bfs"),
    doc="One synchronized parallel-Louvain move phase from a 16-block "
    "seed partition: exact cross-multiplied modularity gain (x2m, no "
    "floats), argmax move per vertex with smallest-community ties, "
    "per-community-floored milli modularity before/after with the "
    "sign discipline (synchronized moves are honestly non-monotone). "
    "The distributed community-detection building block beside "
    "label_propagation and kcore_community.",
)
def q_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.louvain_move(spark, graph.edges_df(spark, "bfs"))


@register(
    "mst_boruvka",
    graph.mst_oracle_sql(),
    doc="Minimum spanning forest via distributed Borůvka: per round every "
    "component picks its min-unique-weight outgoing edge (cut property "
    "=> all picks are MST edges), picks form a functional pointer "
    "graph whose 2-cycles break to the smaller root, pointer JUMPING "
    "collapses chains in log steps. Unique packed weights make the MST "
    "unique, so the engine-parity oracle (UNCAPPED recursive pointer "
    "chase) and the algorithm-independent python Kruskal replay must "
    "both produce the identical edge set.",
)
def q_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.mst_boruvka(spark)


@register(
    "luby_mis",
    graph.luby_mis_oracle(),
    doc="Luby maximal independent set — the classic parallel "
    "symmetry-breaking primitive: per round every live vertex draws a "
    "deterministic unique priority (md5(round, v) packed with v) and "
    "enters the MIS iff it beats every live neighbor; winners + their "
    "neighbors leave. One vertex-keyed join + max-agg per round, "
    "frontier-only checkpoints; 8 rounds provably drain the graph "
    "(pinned). Oracle: identical rounds as chained MATERIALIZED CTEs.",
)
def q_luby_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.luby_mis(spark, graph.edges_df(spark, "bfs"))


@register(
    "maximal_matching",
    graph.maximal_matching_oracle(),
    doc="Parallel maximal matching (Israeli-Itai local-minimum rounds) "
    "— the edge-side symmetry-breaking primitive beside luby_mis, and "
    "a 2-approx minimum vertex cover (the matched endpoints): per "
    "round every live edge draws a unique deterministic key and joins "
    "the matching iff it is the minimum at BOTH endpoints; matched "
    "endpoints leave. One vertex-keyed min-agg + equi-join per round; "
    "8 rounds provably drain the graph (pinned). Oracle: identical "
    "rounds as chained MATERIALIZED CTEs.",
)
def q_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.maximal_matching(spark, graph.edges_df(spark, "bfs"))


@register(
    "critical_path",
    graph.critical_path_oracle(),
    doc="CPM critical path with slack (Kelley-Walker 1959) over the "
    "deterministic 8-layer md5-seeded DAG on part-key residues: "
    "forward pass (longest path ending at n) and backward pass "
    "(longest path starting at n) each relax ONE LAYER PER ROUND — "
    "7+7 bounded rounds, one vertex-keyed equi-join + max-agg each, "
    "never a frontier explosion; CP = max(es + ls), slack = CP - es "
    "- ls, slack-0 nodes are the critical path(s). Oracle: identical "
    "layer relaxations as chained CTEs.",
)
def q_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    return graph.critical_path(parts)


@register(
    "dag_path_census",
    graph.dag_path_census_oracle(),
    doc="Exact maximal-path counting over the critical_path DAG (the "
    "Brandes forward/backward shape without per-source blowup): "
    "f = paths entering, b = paths leaving, through = f*b = paths "
    "THROUGH each node; one layer relaxed per round. The audit "
    "certificate counts total maximal paths TWICE independently — "
    "at sources (sum b) and at sinks (sum f) — and asserts equality "
    "in every row.",
)
def q_dag_path_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = spark.read.parquet(f"{sf_dir}/part.parquet")
    return graph.dag_path_census(parts)


@register(
    "spectral_radius",
    graph.spectral_radius_oracle(),
    doc="Spectral radius of the fixed graph's adjacency by three "
    "power-iteration steps (Perron-Frobenius: nonnegative matrix + "
    "positive start keeps every iterate positive), exact Rayleigh "
    "quotient cross-multiplied in milli, with the Collatz-Wielandt "
    "min/max-ratio bounds emitted as a certificate — the epidemic "
    "threshold 1/lambda quantity behind epidemic_reach, and the "
    "graph-side sibling of pca_power.",
)
def q_spectral_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.spectral_radius(spark, graph.edges_df(spark, "bfs"))


# --- R397: FW-BW pivot SCC decomposition (directed) ---------------------------

_SCC_CAP = 24


def _scc_oracle() -> str:
    return f"""
WITH RECURSIVE scc_e0 AS ({graph.edges_sql("bfs")}),
scc_e AS (SELECT src, dst FROM scc_e0 WHERE (src * 31 + dst) % 2 = 0),
scc_f(v, d) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT x.dst, f.d + 1 FROM scc_f f JOIN scc_e x ON x.src = f.v
  WHERE f.d < {_SCC_CAP}),
scc_b(v, d) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT x.src, b.d + 1 FROM scc_b b JOIN scc_e x ON x.dst = b.v
  WHERE b.d < {_SCC_CAP}),
scc_f2 AS (SELECT v, CAST(min(d) AS INT) AS fd FROM scc_f GROUP BY v),
scc_b2 AS (SELECT v, CAST(min(d) AS INT) AS bd FROM scc_b GROUP BY v)
SELECT coalesce(f.v, b.v) AS v,
       CASE WHEN f.v IS NOT NULL AND b.v IS NOT NULL THEN 'scc'
            WHEN f.v IS NOT NULL THEN 'descendant'
            ELSE 'ancestor' END AS cls,
       coalesce(f.fd, -1) AS fd, coalesce(b.bd, -1) AS bd
FROM scc_f2 f FULL OUTER JOIN scc_b2 b ON b.v = f.v"""


@register(
    "scc_pivot",
    _scc_oracle(),
    doc="FW-BW pivot SCC decomposition (Fleischer et al. 2000 — THE "
    "distributed strongly-connected-components algorithm) on the "
    "half-density directed event graph: forward and backward BFS from "
    "pivot 0, SCC(0) = the intersection, and the remaining reachable "
    "vertices classified descendant/ancestor — the three-way partition "
    "the recursive algorithm peels. Directed completion of the "
    "undirected connected_components; both frontier loops inherit "
    "bfs_khop's broadcast guard + two-hop checkpoint discipline.",
)
def q_scc_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = graph.edges_df(spark, "bfs").where("(src * 31 + dst) % 2 = 0")
    fwd = graph.bfs_khop(spark, edges, [0], _SCC_CAP).selectExpr(
        "v AS fv", "CAST(depth AS INT) AS fd"
    )
    rev = edges.selectExpr("dst AS src", "src AS dst")
    bwd = graph.bfs_khop(spark, rev, [0], _SCC_CAP).selectExpr(
        "v AS bv", "CAST(depth AS INT) AS bd"
    )
    j = fwd.join(bwd, fwd.fv == bwd.bv, "full_outer")
    return j.selectExpr(
        "coalesce(fv, bv) AS v",
        "CASE WHEN fv IS NOT NULL AND bv IS NOT NULL THEN 'scc' "
        "WHEN fv IS NOT NULL THEN 'descendant' "
        "ELSE 'ancestor' END AS cls",
        "coalesce(fd, -1) AS fd",
        "coalesce(bd, -1) AS bd",
    )

"""Trajectory / movement analytics queries (SURVEY §2.12 R36-R39).

Synthetic GPS pings — an all-integer random walk on the res-12 grid,
seeded per-event from the events table (operators/trajectory.py) — feed
four classic movement operators. The reference's per-file ordered-symbol
analysis (sequence order inside one partition key) maps onto per-entity
ordered fixes; the Spark shapes are one entity-keyed window exchange plus
entity-/bucket-keyed joins, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import trajectory as traj
from .registry import register


def _pings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.pings_df(spark, sf_dir)


@register(
    "traj_stats",
    traj.traj_stats_oracle(),
    doc="Per-user trajectory summary: ping count, Chebyshev path length "
    "(grid units), net start→end displacement, distinct res-9 cells "
    "visited. One user-keyed exchange; all-bigint parity.",
)
def q_traj_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.traj_stats(_pings(spark, sf_dir))


@register(
    "od_flows",
    traj.od_flows_oracle(),
    doc="Origin→destination flow matrix at res 7: first-cell → last-cell "
    "per user trajectory, aggregated to (origin, dest, n_users) — the "
    "movement-demand rollup (min_by/max_by vs arg_min/arg_max).",
)
def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.od_flows(_pings(spark, sf_dir))


@register(
    "traj_stops",
    traj.stop_detect_oracle(),
    doc="Stop detection: maximal runs of >=4 consecutive fixes in one "
    "res-9 cell (gaps-and-islands via seq - row_number). 40% of steps "
    "are dwells by construction, so stops exist at every SF.",
)
def q_traj_stops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.stop_detect(_pings(spark, sf_dir))


@register(
    "colocation_pairs",
    traj.colocation_pairs_oracle(),
    doc="Co-location contact join: user pairs sharing a (res-8 cell, day) "
    "spacetime bucket — presence rows deduped then bucket-keyed "
    "equi-self-join (a.user < b.user), never all-pairs.",
)
def q_colocation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.colocation_pairs(_pings(spark, sf_dir))


@register(
    "traj_jaccard",
    traj.traj_jaccard_oracle(),
    doc="Trajectory similarity: visited-cell Jaccard per user pair — "
    "candidates ONLY from shared res-9 cells (inverted-index join with "
    "a df-cap on ubiquitous cells, the dedup noise-suppression "
    "discipline in space); integer-milli similarity.",
)
def q_traj_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.traj_jaccard(_pings(spark, sf_dir))


@register(
    "traj_bearing_mix",
    traj.bearing_mix_oracle(),
    doc="Per-user directional mix: dominant 8-sector bearing of moving "
    "steps (integer sign/magnitude sectors — no trig), its milli-share, "
    "and sector diversity. Ties broken by sector name; all-bigint "
    "except the sector label.",
)
def q_traj_bearing_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.bearing_mix(_pings(spark, sf_dir))


# --- round 3 (cont.): map-matching -------------------------------------------

from .operators import mapmatch  # noqa: E402


@register(
    "map_match",
    mapmatch.map_match_oracle_sql(
        f"WITH {traj.pings_oracle_cte()}"
    ),
    doc="Map-matching: pings snap to the nearest road segment within 60 "
    "grid units — exact rational point-to-segment distances (num/len2, "
    "all-bigint; cross² interior, clamped endpoints) with segment-id "
    "tie-break; per-segment load (n_pings, n_users, avg snap d²). "
    "Candidates via a LOSSLESS bbox+1-ring bucket fan of the broadcast "
    "segment dimension (bucket 256 ≥ rho): the ping side never shuffles "
    "for candidate generation; the oracle joins segments naively and "
    "must agree exactly.",
)
def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mapmatch.map_match(_pings(spark, sf_dir))


# --- round 3 (cont.): simplification + revisitation ---------------------------

@register(
    "traj_simplify",
    traj.simplify_oracle(),
    doc="One-sweep Visvalingam polyline simplification per user: interior "
    "vertices survive iff their doubled-triangle effective area >= 400 "
    "grid-units² (exact bigint cross product; endpoints always kept). "
    "Dwells and collinear runs drop, so kept_milli is the trajectory's "
    "information density and dropped_area2 the discarded error mass. "
    "One user-keyed window + groupBy on the same key — a single "
    "exchange, the shared trajectory-op shape.",
)
def q_traj_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.simplify_stats(_pings(spark, sf_dir))


@register(
    "traj_revisits",
    traj.revisit_oracle(),
    doc="Returner/explorer mobility profile (Pappalardo et al. 2015): per "
    "user, distinct res-9 cells visited, cells RE-entered after leaving "
    "(visit islands >= 2 via the seq - row_number gaps-and-islands id), "
    "total returns, revisit share, and the returner/explorer class "
    "(revisited >= half of cells). All windows and rollups share the "
    "user-keyed exchange.",
)
def q_traj_revisits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.revisit_stats(_pings(spark, sf_dir))


@register(
    "knox_spacetime",
    traj.knox_oracle(),
    doc="Knox space-time interaction test over the case pings (every "
    "10th user): among all case pairs, does the count close in BOTH "
    "space (d ≤ 40 units) and time (≤ 6 h) exceed the independence "
    "expectation from the space-close and time-close margins? "
    "ratio_milli > 1000 ⟹ contagion-like clustering. All three pair "
    "counts use the lossless one-sided band fan (left expands 3×3 "
    "cells / ±1 epoch band, right stays home, unique-key order — each "
    "pair joins exactly once, no distinct, never all-pairs); the naive "
    "oracle re-derives every count from a true all-pairs join.",
)
def q_knox_spacetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.knox_test(_pings(spark, sf_dir))


@register(
    "traj_gyration",
    traj.gyration_profile_oracle(),
    doc="Per-user mobility profile: exact-integer squared radius of "
    "gyration ×100 over start-relative coordinates (Gonzalez 2008), "
    "distinct res-9 locations, Simpson collision count (log-free "
    "diversity), and top-location share in per-mille. Two-level "
    "aggregation — (user, cell) partials then a user rollup over the "
    "visited-cell frame; the second exchange never carries pings.",
)
def q_traj_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.gyration_profile(_pings(spark, sf_dir))


@register(
    "cell_cusum",
    traj.cell_cusum_oracle(),
    doc="Change-point detection per res-7 cell: integer CUSUM of daily "
    "ping counts (cum = Σ D·n_d − T, exactly ∝ deviation from the mean, "
    "no float mean crosses engines), change day = argmax |cum| with "
    "min-day tie-break. One (cell, day) agg + a cell-keyed window "
    "cumsum + a cell rollup — all on one hash partitioning; the frame "
    "is cells × days, never pings.",
)
def q_cell_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.cell_cusum(_pings(spark, sf_dir))


@register(
    "epidemic_reach",
    traj.epidemic_reach_oracle(),
    doc="Time-respecting contact reachability: who is reachable from the "
    "seed users (id % 10, infected at first active day) through contact "
    "chains whose days never decrease — the temporal closure a plain "
    "transitive closure would overcount. (cell, day)-bucketed contact "
    "join + min-day Bellman-Ford relaxation (two rounds per checkpoint, "
    "scalar fixpoint probe); min-day state is provably lossless (an "
    "earlier infection dominates). Oracle: capped recursive walk — "
    "equal whether or not the loop converged inside the cap.",
)
def q_epidemic_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.epidemic_reach(spark, _pings(spark, sf_dir))


@register(
    "convoy_pairs",
    traj.convoy_oracle(),
    doc="Convoy detection (sustained co-movement): pairs co-located on "
    ">= 2 CONSECUTIVE days — colocation contacts deduped to meet-days, "
    "then gaps-and-islands (day - row_number) per pair for the longest "
    "consecutive run. Pair-keyed windows downstream of the bucketed "
    "contact join; per-pair day lists are calendar-bounded.",
)
def q_convoy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.convoy_pairs(_pings(spark, sf_dir))


@register(
    "od_gravity",
    traj.od_gravity_oracle(),
    doc="Gravity-model fit over the OD matrix: null model T_ij = "
    "O_i*D_j/T per observed OD pair, expected flow in micro-trips and "
    "obs/expected ratio in milli — all-positive integer arithmetic "
    "(spatial-interaction modeling over R37's flows; marginals are two "
    "rollups of the OD frame, the null-model join is per-OD-pair).",
)
def q_od_gravity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.od_gravity(_pings(spark, sf_dir))


@register(
    "covisit_topk",
    traj.covisit_oracle(),
    doc="Item-item co-visitation recommender (Sarwar 2001 collaborative "
    "filtering) over the ping walk: coarse visit cells as items, exact "
    "integer SQUARED cosine (1000*cooc^2 DIV na*nb — sqrt removed, "
    "ranking preserved), top-3 per cell with deterministic ties. "
    "Per-user bounded pair fan aggregated in-stream to (a, b, cooc); "
    "popularity joins by key; one window for the top-K.",
)
def q_covisit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.covisit_topk(spark, sf_dir)


@register(
    "hausdorff_pairs",
    traj.hausdorff_oracle(),
    doc="Symmetric Hausdorff trajectory distance (max of the two "
    "directed max-min Chebyshev distances on the exact res-12 integer "
    "walk) per candidate user pair — the metric companion to the "
    "set-based traj_jaccard. Candidates come only from the shared-rare-"
    "cell equi-join; each trajectory enters the fan down-sampled (every "
    "4th fix, seq<=256) so the per-pair point fan caps at 64x64 and "
    "aggregates in-stream (map-side partial min, then max) — the "
    "quadratic point rows die inside the join stage.",
)
def q_hausdorff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.hausdorff_pairs(_pings(spark, sf_dir))


@register(
    "ipf_balance",
    traj.ipf_oracle(),
    doc="IPF / Furness matrix balancing (Deming-Stephan 1940) of the "
    "res-7 OD flow matrix toward deterministic symmetric in/out "
    "margins, in milli-mass integers (floors compound identically "
    "cross-engine). Output is the per-iteration margin-error "
    "convergence table a transport planner reads; structurally-absent "
    "flows keep the error floor honestly non-zero. Every step is a "
    "groupBy + equi-join on the bounded OD-pair dimension.",
)
def q_ipf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.ipf_balance(_pings(spark, sf_dir))


@register(
    "radiation_flows",
    traj.radiation_oracle(),
    doc="Radiation-model flows (Simini 2012) — the parameter-free "
    "spatial-interaction law beside od_gravity's fitted null: per "
    "observed inter-cell OD pair, T_i*m_i*n_j / ((m_i+s_ij)*"
    "(m_i+n_j+s_ij)) with s_ij = activity mass strictly inside the "
    "d_ij disk around the origin, both endpoints excluded — exact on "
    "integer squared cell-center distances, evaluated as two staged "
    "integer floors so intermediates stay ~10^13. Locations are the "
    "bounded active-cell dimension: the disk sum is a broadcast "
    "theta-join of OD pairs against it (pairs x locations, never "
    "pings x anything).",
)
def q_radiation_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.radiation_flows(_pings(spark, sf_dir))


@register(
    "spatial_markov",
    traj.spatial_markov_oracle(),
    doc="Rey 2001 spatial Markov chain on the res-9 occupancy raster: "
    "two-epoch split at the mid-day, fixed count classes (<=2, <=5, "
    ">5; 0 = emptied), epoch transitions conditioned on the epoch-1 "
    "8-neighbor max class — does a hot neighborhood pull a cell up? "
    "All arithmetic on the bounded cell dimension after one (cell, "
    "epoch) agg; aggregate-first neighbor fan.",
)
def q_spatial_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.spatial_markov(_pings(spark, sf_dir))


@register(
    "msd_ladder",
    traj.msd_oracle(),
    doc="Mean-squared-displacement ladder (lags 1,2,4,8,16 fixes): the "
    "mobility-physics diffusion diagnostic over the ping walk — exact "
    "integer squared displacements, staged-floor milli means, and the "
    "lag-doubling ratio (~2000 = normal diffusion, <2000 = dwell "
    "trapping). Every lead() shares ONE user-keyed window exchange; "
    "the (lag, sq) stream collapses map-side into 5 rows.",
)
def q_msd_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.msd_ladder(_pings(spark, sf_dir))


@register(
    "home_work_commute",
    traj.home_work_oracle(),
    doc="Home/work anchor inference (the CDR mobility anchor model): "
    "modal night-hour vs day-hour res-8 cell per user (deterministic "
    "argmax via n DESC, cx, cy), Chebyshev commute distance, colocated "
    "flag. One counted aggregation + one user-keyed window + a "
    "one-row-per-user self-join; hours from epoch-micros on the NTZ "
    "timestamp (session-TZ-proof).",
)
def q_home_work_commute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return traj.home_work(_pings(spark, sf_dir))

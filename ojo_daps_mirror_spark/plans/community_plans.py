"""Skill community detection (SURVEY.md §2 — reference parity for
flows/enrich/labs/skills/cluster_utils.py:23 ConsensusClustering).

The reference builds a skills taxonomy by clustering a skill
co-occurrence / kNN graph with a driver-side Leiden ensemble
(build_kNN_matrix:357, build_graph:389, ConsensusClustering:23),
consumed by notebooks/PIPELINE_surface_form_clustering.py. The
distributed analog: surface-form lexicon → per-document co-occurrence
edges → synchronous weighted label propagation
(operators/graph.py:label_propagation) with a fixed iteration count and
deterministic tie-break, which makes the whole pipeline — including the
iterative community loop — exactly expressible as unrolled SQL CTEs for
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import sql_tokens, tokens
from ..operators.graph import (
    LPA_ITERS,
    label_propagation,
    label_propagation_ensemble,
)
from ..operators.lineage import cut_lineage
from ..sources import load_table
from . import register
from .enrich_plans import MIN_FORM_LEN, STOPWORDS

# A larger lexicon than A18's: communities need enough vocabulary for
# non-trivial structure, but the lexicon stays driver/broadcast-sized
# (the reference's surface-form table is likewise thousands of rows).
COMM_LEXICON_SIZE = 40
MIN_COOC = 2  # co-occurrence support threshold (noise edge floor)
# kNN sparsification (the reference's build_kNN_matrix:357): keep each
# skill's top-K strongest co-occurrence arcs, then symmetrize. Without
# it the hub tokens connect everything and LPA collapses to one
# community; K=2 recovers real cluster structure.
KNN_K = 2

_sw = ", ".join(f"'{w}'" for w in STOPWORDS)


def _skill_communities_oracle() -> str:
    """Lexicon → co-occurrence edges → kNN prune → LPA_ITERS unrolled
    rounds of argmax-weight label propagation (ties → smallest label)."""
    sql = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
),
lexicon AS (
  SELECT tok FROM toks
  WHERE length(tok) >= {MIN_FORM_LEN} AND tok NOT IN ({_sw})
  GROUP BY tok
  ORDER BY COUNT(*) DESC, tok
  LIMIT {COMM_LEXICON_SIZE}
),
doc_forms AS (
  SELECT DISTINCT doc_id, t.tok FROM toks t JOIN lexicon USING (tok)
),
cooc AS (
  SELECT a.tok AS ta, b.tok AS tb, CAST(COUNT(*) AS DOUBLE) AS w
  FROM doc_forms a JOIN doc_forms b
    ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_COOC}
),
sym AS (
  SELECT ta AS src, tb AS dst, w FROM cooc
  UNION ALL
  SELECT tb AS src, ta AS dst, w FROM cooc
),
knn AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM sym
  ) WHERE rn <= {KNN_K}
),
edges AS (
  -- DISTINCT-over-UNION-ALL, not bare UNION: inside a WITH RECURSIVE
  -- block DuckDB parses a top-level UNION CTE as a recursive union and
  -- skips cross-branch dedup (verified: WITH RECURSIVE t AS (SELECT 1
  -- UNION SELECT 1) yields 2 rows), which the consensus oracle hits.
  SELECT DISTINCT src, dst, w FROM (
    SELECT src, dst, w FROM knn
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM knn
  )
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
l0 AS (SELECT id, id AS lbl FROM nodes),
"""
    for i in range(LPA_ITERS):
        sql += f"""v{i} AS (
  SELECT e.dst AS id, l.lbl, SUM(e.w) AS wsum
  FROM edges e JOIN l{i} l ON e.src = l.id
  GROUP BY e.dst, l.lbl
),
b{i} AS (
  SELECT id, lbl FROM (
    SELECT id, lbl,
           ROW_NUMBER() OVER (
             PARTITION BY id ORDER BY wsum DESC, lbl
           ) AS rn
    FROM v{i}
  ) WHERE rn = 1
),
l{i + 1} AS (
  SELECT n.id, COALESCE(b.lbl, n.id) AS lbl
  FROM nodes n LEFT JOIN b{i} b ON b.id = n.id
),
"""
    sql = sql.rstrip().rstrip(",")
    sql += f"""
SELECT id AS skill, lbl AS community
FROM l{LPA_ITERS}
ORDER BY community, skill
"""
    return sql


def skill_cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-form co-occurrence edges, both directions.

    Per-document pair expansion happens MAP-SIDE from each document's
    sorted lexicon-token array (documents hold ≤ |lexicon| forms), so
    the only wide shuffle is the (ta, tb) count aggregate — the same
    one-shuffle shape as the LSH bucket pair expansion. The reference
    instead builds a dense driver-side co-occurrence matrix
    (cluster_utils.py:build_kNN_matrix).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    counts = (
        toks.where(
            (F.length("tok") >= MIN_FORM_LEN) & ~F.col("tok").isin(*STOPWORDS)
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    lexicon = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= COMM_LEXICON_SIZE)
        .select("tok")
    )
    doc_forms = (
        toks.join(F.broadcast(lexicon), "tok")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("tok")).alias("ts"))
    )
    ts = F.col("ts")
    pair_arr = F.flatten(
        F.transform(
            ts,
            lambda x, i: F.transform(
                F.slice(ts, i + F.lit(2), F.size(ts)),
                lambda y: F.struct(x.alias("ta"), y.alias("tb")),
            ),
        )
    )
    cooc = (
        doc_forms.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.ta").alias("ta"), F.col("p.tb").alias("tb"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .where(F.col("w") >= MIN_COOC)
    )
    both = F.explode(
        F.array(
            F.struct(F.col("ta").alias("src"), F.col("tb").alias("dst"), F.col("w")),
            F.struct(F.col("tb").alias("src"), F.col("ta").alias("dst"), F.col("w")),
        )
    )
    sym = cooc.select(both.alias("e")).select("e.*")
    # kNN sparsification: each node keeps its KNN_K strongest arcs
    # (deterministic tie-break), then the kept arc set is symmetrized —
    # the reference's build_kNN_matrix step, as a per-src window.
    w_knn = Window.partitionBy("src").orderBy(F.desc("w"), F.asc("dst"))
    knn = (
        sym.withColumn("rn", F.row_number().over(w_knn))
        .where(F.col("rn") <= KNN_K)
        .select("src", "dst", "w")
    )
    rev = knn.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    return (
        knn.union(rev)
        .distinct()
        .select("src", "dst", F.col("w").alias("weight"))
    )


@register("skill_communities", oracle=_skill_communities_oracle())
def skill_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skill-taxonomy communities over the surface-form co-occurrence
    graph — the engine analog of the reference's consensus clustering
    (cluster_utils.py:23), as deterministic distributed label
    propagation. Hash-matched against the identical unrolled iteration
    in DuckDB."""
    labels = label_propagation(skill_cooc_edges(spark, sf_dir))
    return labels.select(
        F.col("id").alias("skill"), "community"
    ).orderBy("community", "skill")


# ---------------------------------------------------------------- A36

# Ensemble salts — each is one deterministic LPA member whose argmax
# ties break by md5(salt || label), the distributed stand-in for the
# reference's Leiden ensemble members (cluster_utils.py:23 runs N
# clusterings then keeps the consensus partition).
CONSENSUS_SALTS = ("e0", "e1", "e2")
CONSENSUS_MIN_AGREE = 2  # pair co-clustered in ≥ 2 of 3 runs


def _lpa_run_sql(
    salt: str, suffix: str, edges: str = "edges", nodes: str = "nodes"
) -> str:
    """One unrolled LPA run over the given edge/node CTEs with a
    salted tie-break; emits l{LPA_ITERS}{suffix}(id, lbl)."""
    sql = f"l0{suffix} AS (SELECT id, id AS lbl FROM {nodes}),\n"
    for i in range(LPA_ITERS):
        sql += f"""v{i}{suffix} AS (
  SELECT e.dst AS id, l.lbl, SUM(e.w) AS wsum
  FROM {edges} e JOIN l{i}{suffix} l ON e.src = l.id
  GROUP BY e.dst, l.lbl
),
b{i}{suffix} AS (
  SELECT id, lbl FROM (
    SELECT id, lbl,
           ROW_NUMBER() OVER (
             PARTITION BY id ORDER BY wsum DESC, md5('{salt}' || lbl)
           ) AS rn
    FROM v{i}{suffix}
  ) WHERE rn = 1
),
l{i + 1}{suffix} AS (
  SELECT n.id, COALESCE(b.lbl, n.id) AS lbl
  FROM {nodes} n LEFT JOIN b{i}{suffix} b ON b.id = n.id
),
"""
    return sql


def _consensus_oracle() -> str:
    """Three salted LPA runs → co-assignment pairs → ≥2-vote consensus
    edges → transitive closure (recursive CTE) → min-id communities."""
    head = _skill_communities_oracle().split("l0 AS")[0]  # shared graph CTEs
    head = head.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    runs = "".join(
        _lpa_run_sql(salt, f"_{k}") for k, salt in enumerate(CONSENSUS_SALTS)
    )
    pair_sel = "\nUNION ALL\n".join(
        f"""SELECT a.id AS i, b.id AS j
  FROM l{LPA_ITERS}_{k} a JOIN l{LPA_ITERS}_{k} b
    ON a.lbl = b.lbl AND a.id < b.id"""
        for k in range(len(CONSENSUS_SALTS))
    )
    return f"""{head}{runs}
co AS ({pair_sel}),
consensus AS (
  SELECT i, j FROM co GROUP BY i, j
  HAVING COUNT(*) >= {CONSENSUS_MIN_AGREE}
),
ce AS (
  SELECT i AS x, j AS y FROM consensus
  UNION ALL
  SELECT j AS x, i AS y FROM consensus
),
reach AS (
  SELECT id AS v, id AS w FROM nodes
  UNION
  SELECT r.v, e.y FROM reach r JOIN ce e ON r.w = e.x
)
SELECT v AS skill, MIN(w) AS community
FROM reach GROUP BY v ORDER BY community, skill
"""


def _ensemble_votes(edges: DataFrame, salts: tuple[str, ...]) -> DataFrame:
    """Co-assignment vote counts (i, j, votes) over the salted LPA
    ensemble, i < j: how many members co-clustered the pair. ONE fused
    round loop for the whole ensemble (member dimension threaded
    through the LPA frames) — per member bit-identical to sequential
    label_propagation(salt=...) calls at a fraction of the fixed-point
    scheduling/checkpoint barriers."""
    return _votes_from_labels(label_propagation_ensemble(edges, salts))


def _votes_from_labels(labels: DataFrame) -> DataFrame:
    """(i, j, votes) from an ensemble label frame (member, id,
    community). Pairs expand MAP-SIDE from per-(member, community)
    sorted member lists (lexicon-bounded)."""
    grouped = labels.groupBy("member", "community").agg(
        F.array_sort(F.collect_set("id")).alias("ms")
    )
    ms = F.col("ms")
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    co = grouped.select(F.explode(pair_arr).alias("p")).select(
        F.col("p.i").alias("i"), F.col("p.j").alias("j")
    )
    return co.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("votes")
    )


def _consensus_components(
    edges: DataFrame,
    nodes: DataFrame,
    salts: tuple[str, ...],
    min_agree: int = CONSENSUS_MIN_AGREE,
) -> DataFrame:
    """The reference's full ConsensusClustering shape
    (cluster_utils.py:23): ensemble → majority co-assignment edges →
    connected components. Returns (id, community) for EVERY node in
    ``nodes`` (isolates are their own singleton community)."""
    from ..operators.dedup import connected_components

    consensus = (
        _ensemble_votes(edges, salts)
        .where(F.col("votes") >= min_agree)
        .select(F.col("i").alias("first_id"), F.col("j").alias("second_id"))
    )
    comps = connected_components(consensus, nodes, id_col="id")
    return comps.select("id", F.col("component_id").alias("community"))


# Stage version: bump whenever any part's schema or build recipe
# changes, so a shared-dir stage written by older code is never misread.
_CONSENSUS_STAGE_VERSION = 1


def _consensus_stage(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The consensus-clustering family's shared materialized stage.

    Six keys (A34/A36/A40/A41/A42/A43) derive from the SAME chain:
    document scan → co-occurrence kNN graph → fused LPA ensemble →
    co-assignment votes → level-1 consensus components → level-2
    subcluster components. Re-running that chain per query was the
    family's whole cost — the only part that grows with the corpus is
    the tokenize scan inside ``skill_cooc_edges`` (everything after it
    is lexicon-bounded), and each key re-paid it, plus the ensemble's
    scheduling barriers, from scratch.

    Like the ExactSubstr suffix stage (operators/suffix.py), the chain
    is materialized ONCE per (application, sf_dir, config version) via
    operators/stagecache.py, each tier its own parquet part (the writes
    double as the iterative builders' lineage cuts), and every family
    key reads finished artifacts: at 100 TB this is one corpus scan and
    one ensemble for the whole taxonomy + QC suite instead of six, and
    the stage is exactly the intermediate a lake pipeline would keep
    beside the corpus (the reference likewise builds its ensemble once
    and derives the taxonomy, affinity and stability views from it —
    cluster_utils.py:23 ConsensusClustering feeding :437/:517/:674).

    Parts: ``edges`` (src, dst, weight), ``labels`` (member, id,
    community — CONSENSUS_SALTS ensemble), ``votes`` (i, j, votes),
    ``comps1`` (id, community), ``comps2`` (id, subcommunity —
    SUBCLUSTER_SALTS ensemble on the comps1-induced subgraphs).

    The stage key includes a cheap fingerprint of the input table
    (documents.parquet total bytes + freshest mtime), so overwriting
    the sf_dir's data WITHIN one application (replica stress harnesses
    rebuild in place; a lake pipeline re-lands a partition) can never
    serve a stale stage — the changed fingerprint simply keys a fresh
    build. File-metadata arithmetic only, no Spark job.
    """
    from ..operators.stagecache import input_fingerprint, materialized_stage

    key = sf_dir + "|" + input_fingerprint(
        os.path.join(sf_dir, "documents.parquet")
    )

    def b_edges(parts: dict[str, DataFrame]) -> DataFrame:
        return skill_cooc_edges(spark, sf_dir)

    def b_labels(parts: dict[str, DataFrame]) -> DataFrame:
        return label_propagation_ensemble(parts["edges"], CONSENSUS_SALTS)

    def b_votes(parts: dict[str, DataFrame]) -> DataFrame:
        return _votes_from_labels(parts["labels"])

    def b_comps1(parts: dict[str, DataFrame]) -> DataFrame:
        from ..operators.dedup import connected_components

        nodes = parts["edges"].select(F.col("src").alias("id")).distinct()
        consensus = (
            parts["votes"]
            .where(F.col("votes") >= CONSENSUS_MIN_AGREE)
            .select(F.col("i").alias("first_id"), F.col("j").alias("second_id"))
        )
        comps = connected_components(consensus, nodes, id_col="id")
        return comps.select("id", F.col("component_id").alias("community"))

    def b_comps2(parts: dict[str, DataFrame]) -> DataFrame:
        level1 = parts["comps1"]
        lab_src = level1.select(
            F.col("id").alias("src"), F.col("community").alias("c_src")
        )
        lab_dst = level1.select(
            F.col("id").alias("dst"), F.col("community").alias("c_dst")
        )
        sub_edges = (
            parts["edges"]
            .join(F.broadcast(lab_src), "src")
            .join(F.broadcast(lab_dst), "dst")
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst", "weight")
        )
        level2 = _consensus_components(
            sub_edges, level1.select("id"), SUBCLUSTER_SALTS
        )
        return level2.withColumnRenamed("community", "subcommunity")

    return materialized_stage(
        spark,
        "consensus",
        _CONSENSUS_STAGE_VERSION,
        key,
        [
            ("edges", b_edges),
            ("labels", b_labels),
            ("votes", b_votes),
            ("comps1", b_comps1),
            ("comps2", b_comps2),
        ],
    )


@register("skill_communities_consensus", oracle=_consensus_oracle())
def skill_communities_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consensus clustering over an LPA ensemble — the reference's
    actual taxonomy-build shape (cluster_utils.py:23
    ConsensusClustering: run N clusterings, keep pairs the majority
    agrees on, take components of the consensus graph).

    Scale shape: the whole chain (scan → graph → fused ensemble →
    votes → components) lives in the family's shared materialized
    stage (_consensus_stage) — built once per session/sf_dir, read by
    every consensus-family key; co-assignment pairs expand map-side
    from per-community sorted member lists (communities are
    lexicon-bounded); the ≥2-vote consensus is one narrow (i, j)
    count; final components reuse the dedup CC loop. Every stage is
    deterministic, so the whole ensemble hash-matches its unrolled SQL.
    """
    comps = _consensus_stage(spark, sf_dir)["comps1"]
    return comps.select(
        F.col("id").alias("skill"), "community"
    ).orderBy("community", "skill")


# ---------------------------------------------------------------- A40

# Step 3 of the reference's ConsensusClustering
# (flows/enrich/labs/skills/cluster_utils.py:272 consensus_communities):
# score every ensemble member by its MEAN pairwise agreement with the
# other members and keep the most agreeable one. The reference scores
# with sklearn adjusted mutual information; the engine scores with NMI
# (arithmetic-mean normalisation) — the closed-form chance-UNcorrected
# twin, identical argmax behaviour on same-sized partitions and, unlike
# AMI's hypergeometric E[MI] term, exactly expressible in SQL for the
# oracle.


def _nmi_pair_sql(a: int, b: int) -> str:
    """NMI between unrolled LPA members a and b over the shared CTEs."""
    return f"""cont_{a}{b} AS (
  SELECT x.lbl AS ca, y.lbl AS cb, CAST(COUNT(*) AS BIGINT) AS nij
  FROM l{LPA_ITERS}_{a} x JOIN l{LPA_ITERS}_{b} y ON x.id = y.id
  GROUP BY 1, 2
),
mi_{a}{b} AS (
  SELECT SUM((nij * 1.0 / n.nn)
             * ln(nij * 1.0 * n.nn / (ma.ai * 1.0 * mb.bj))) AS mi
  FROM cont_{a}{b} c
  JOIN (SELECT ca, SUM(nij) AS ai FROM cont_{a}{b} GROUP BY ca) ma
    USING (ca)
  JOIN (SELECT cb, SUM(nij) AS bj FROM cont_{a}{b} GROUP BY cb) mb
    USING (cb),
  nn n
),
nmi_{a}{b} AS (
  SELECT mi / ((ha.h + hb.h) / 2) AS nmi
  FROM mi_{a}{b}, h_{a} ha, h_{b} hb
),
"""


def _consensus_select_oracle() -> str:
    from ..functions.rounding import sql_round

    head = _skill_communities_oracle().split("l0 AS")[0]
    # DuckDB inlines plain CTEs per reference; this oracle references
    # the shared graph and each member's final labels MANY times, so
    # without MATERIALIZED the unrolled LPA chains re-expand
    # multiplicatively and the query never finishes.
    for cte in ("toks", "lexicon", "doc_forms", "cooc", "knn", "edges",
                "nodes"):
        head = head.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    runs = "".join(
        _lpa_run_sql(salt, f"_{k}") for k, salt in enumerate(CONSENSUS_SALTS)
    )
    for k in range(len(CONSENSUS_SALTS)):
        runs = runs.replace(
            f"l{LPA_ITERS}_{k} AS (", f"l{LPA_ITERS}_{k} AS MATERIALIZED (", 1
        )
    hs = "".join(
        f"""h_{k} AS (
  SELECT -SUM((cnt * 1.0 / n.nn) * ln(cnt * 1.0 / n.nn)) AS h
  FROM (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM l{LPA_ITERS}_{k} GROUP BY lbl) g, nn n
),
"""
        for k in range(len(CONSENSUS_SALTS))
    )
    nmis = _nmi_pair_sql(0, 1) + _nmi_pair_sql(0, 2) + _nmi_pair_sql(1, 2)
    ncomm = "\nUNION ALL\n".join(
        f"  SELECT {k} AS member, CAST(COUNT(DISTINCT lbl) AS BIGINT)"
        f" AS n_communities FROM l{LPA_ITERS}_{k}"
        for k in range(len(CONSENSUS_SALTS))
    )
    return f"""{head}
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nodes),
{runs}{hs}{nmis}scores AS (
  SELECT 0 AS member, (a.nmi + b.nmi) / 2 AS mean_nmi
  FROM nmi_01 a, nmi_02 b
  UNION ALL
  SELECT 1 AS member, (a.nmi + c.nmi) / 2 FROM nmi_01 a, nmi_12 c
  UNION ALL
  SELECT 2 AS member, (b.nmi + c.nmi) / 2 FROM nmi_02 b, nmi_12 c
),
ncomm AS (
{ncomm}
),
ranked AS (
  SELECT s.member, n_communities, mean_nmi,
         ROW_NUMBER() OVER (ORDER BY mean_nmi DESC, s.member) AS rk
  FROM scores s JOIN ncomm USING (member)
)
SELECT CAST(member AS BIGINT) AS member, n_communities,
       {sql_round('mean_nmi', 6)} AS mean_nmi,
       (rk = 1) AS selected
FROM ranked ORDER BY member
"""


@register("consensus_partition_select", oracle=_consensus_select_oracle())
def consensus_partition_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'most agreeable member' selection that finishes the
    reference's consensus procedure (cluster_utils.py:272: mean row of
    the pairwise-AMI matrix, argmax): every salted LPA ensemble member
    is scored by its mean pairwise normalized mutual information with
    the other members, and the winner is flagged. A36 builds the
    consensus EDGES; this op reproduces the reference's partition-
    SELECTION semantics over the same ensemble, so a user gets both
    halves of ConsensusClustering.

    Exactness: contingency tables, marginals and community counts are
    exact integers; MI/H/NMI are the identical double trees in both
    engines over those integers, rounded at 6dp.

    Scale shape: the ensemble label frame comes straight from the
    family's shared materialized stage (_consensus_stage — the scan,
    graph build and fused LPA loop are paid once per session, not per
    key); every NMI runs on |communities|^2-at-most contingency cells;
    the scoreboard is a 3-row frame.
    """
    from ..functions.rounding import round_eps
    from ..operators.attach import attach_scalars

    stage = _consensus_stage(spark, sf_dir)

    # ONE wide (id, lbl0..lblN) frame, then ONE materialized per-pair
    # contingency frame that every downstream number (MI, marginals,
    # entropies, community counts, nn) is a tiny aggregate of. The
    # previous shape built each pair's contingency / marginals /
    # entropies as separate scalar subtrees composed with cross-joins —
    # 90 Exchange nodes and an 1820-line physical plan whose
    # analyzer/codegen cost dwarfed the (lexicon-bounded) data. Every
    # count below is the identical integer the old shape produced, and
    # every double expression tree is unchanged, so the 6-dp result is
    # identical.
    npair = len(CONSENSUS_SALTS)  # pairs (0,1) (0,2) (1,2) indexed 0..2
    pair_ab = [(a, b) for a in range(npair) for b in range(a + 1, npair)]
    wide = stage["labels"].groupBy("id").agg(
        *[
            F.max(
                F.when(F.col("member") == k, F.col("community"))
            ).alias(f"lbl{k}")
            for k in range(len(CONSENSUS_SALTS))
        ]
    )
    cells = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"),
                        F.col(f"lbl{a}").alias("la"),
                        F.col(f"lbl{b}").alias("lb"),
                    )
                    for p, (a, b) in enumerate(pair_ab)
                ]
            )
        ).alias("c")
    ).select("c.*")
    # (pair, label_a, label_b) → exact joint count; materialized once
    # (|pairs| × |communities|² rows at most) so marginals, entropies
    # and MI all read a finished tiny table instead of re-running the
    # pivot per consumer.
    joint = (
        cells.groupBy("p", "la", "lb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        .transform(cut_lineage)
    )
    ma = joint.groupBy("p", "la").agg(F.sum("nij").alias("ai"))
    mb = joint.groupBy("p", "lb").agg(F.sum("nij").alias("bj"))
    nn = joint.where(F.col("p") == 0).agg(
        F.sum("nij").cast("bigint").alias("nn")
    )
    mi = (
        attach_scalars(
            joint.join(F.broadcast(ma), ["p", "la"]).join(
                F.broadcast(mb), ["p", "lb"]
            ),
            nn,
        )
        .groupBy("p")
        .agg(
            F.sum(
                (F.col("nij") * 1.0 / F.col("nn"))
                * F.log(
                    F.col("nij") * 1.0 * F.col("nn")
                    / (F.col("ai") * 1.0 * F.col("bj"))
                )
            ).alias("mi")
        )
    )
    # Per-member label counts are the pair marginals (member 0 = a-side
    # of pair 0, member 1 = b-side of pair 0, member 2 = b-side of
    # pair 1) — identical integers to a direct wide.groupBy(lbl_k).
    memb_counts = (
        ma.where(F.col("p") == 0)
        .select(F.lit(0).cast("bigint").alias("member"), F.col("ai").alias("cnt"))
        .unionByName(
            mb.where(F.col("p") == 0).select(
                F.lit(1).cast("bigint").alias("member"),
                F.col("bj").alias("cnt"),
            )
        )
        .unionByName(
            mb.where(F.col("p") == 1).select(
                F.lit(2).cast("bigint").alias("member"),
                F.col("bj").alias("cnt"),
            )
        )
    )
    ent = (
        attach_scalars(memb_counts, nn)
        .groupBy("member")
        .agg(
            (
                -F.sum(
                    (F.col("cnt") * 1.0 / F.col("nn"))
                    * F.log(F.col("cnt") * 1.0 / F.col("nn"))
                )
            ).alias("h"),
            F.count(F.lit(1)).cast("bigint").alias("n_communities"),
        )
    )
    am = F.lit(None).cast("bigint")
    bm = F.lit(None).cast("bigint")
    for p, (a, b) in enumerate(pair_ab):
        am = F.when(F.col("p") == p, F.lit(a).cast("bigint")).otherwise(am)
        bm = F.when(F.col("p") == p, F.lit(b).cast("bigint")).otherwise(bm)
    ha = ent.select(F.col("member").alias("ma_"), F.col("h").alias("hA"))
    hb = ent.select(F.col("member").alias("mb_"), F.col("h").alias("hB"))
    nmi = (
        mi.select("p", "mi", am.alias("a"), bm.alias("b"))
        .join(F.broadcast(ha), F.col("a") == F.col("ma_"))
        .join(F.broadcast(hb), F.col("b") == F.col("mb_"))
        .select(
            "a",
            "b",
            (F.col("mi") / ((F.col("hA") + F.col("hB")) / 2)).alias("nmi"),
        )
    )
    rows = (
        nmi.select(
            F.explode(
                F.array(F.col("a").alias("m"), F.col("b").alias("m"))
            ).alias("member"),
            "nmi",
        )
        .groupBy("member")
        # each member sits in exactly 2 pairs: sum/2 == the old
        # (nmi_xy + nmi_xz) / 2 (two-term IEEE addition is commutative)
        .agg((F.sum("nmi") / 2).alias("mean_nmi"))
    )
    ranked = rows.join(F.broadcast(ent.select("member", "n_communities")), "member").select(
        "member",
        "n_communities",
        "mean_nmi",
        F.row_number()
        .over(Window.orderBy(F.col("mean_nmi").desc(), "member"))
        .alias("rk"),  # 3-row scoreboard: dimension-scale window
    )
    return ranked.select(
        "member",
        "n_communities",
        round_eps(F.col("mean_nmi"), 6).alias("mean_nmi"),
        (F.col("rk") == 1).alias("selected"),
    ).orderBy("member")


# ---------------------------------------------------------------- A41

# The reference's HIERARCHICAL CLUSTERING PIPELINE
# (cluster_utils.py:674 subcluster_nodes + :886 collect_subclusters):
# take the level-l consensus partition, induce each cluster's subgraph,
# re-run the full ensemble→consensus procedure INSIDE each cluster with
# fresh seeds, and collect the per-cluster subpartitions into the
# level-(l+1) table. Distinct salts play the reference's fresh
# np.random seeds; identical ensemble/consensus machinery otherwise.
SUBCLUSTER_SALTS = ("s0", "s1", "s2")


def _graph_head_sql() -> str:
    """The shared lexicon→edges→nodes CTE block, RECURSIVE-enabled and
    MATERIALIZED (these CTEs are referenced many times; DuckDB inlines
    plain CTEs per reference, which re-expands unrolled LPA chains
    multiplicatively — the A40 lesson)."""
    head = _skill_communities_oracle().split("l0 AS")[0]
    head = head.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)
    for cte in ("toks", "lexicon", "doc_forms", "cooc", "knn", "edges",
                "nodes"):
        head = head.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return head


def _ensemble_runs_sql(
    salts: tuple[str, ...],
    tag: str,
    edges: str = "edges",
    nodes: str = "nodes",
) -> str:
    """All of an ensemble's unrolled LPA runs, finals MATERIALIZED
    (each final is referenced twice by the co-assignment self-join)."""
    runs = "".join(
        _lpa_run_sql(salt, f"_{tag}{k}", edges=edges, nodes=nodes)
        for k, salt in enumerate(salts)
    )
    for k in range(len(salts)):
        runs = runs.replace(
            f"l{LPA_ITERS}_{tag}{k} AS (",
            f"l{LPA_ITERS}_{tag}{k} AS MATERIALIZED (",
            1,
        )
    return runs


def _co_pairs_sql(n_members: int, tag: str) -> str:
    """Per-member co-assignment pair selection over the finals."""
    return "\nUNION ALL\n".join(
        f"""SELECT a.id AS i, b.id AS j
  FROM l{LPA_ITERS}_{tag}{k} a JOIN l{LPA_ITERS}_{tag}{k} b
    ON a.lbl = b.lbl AND a.id < b.id"""
        for k in range(n_members)
    )


def _consensus_close_sql(tag: str, nodes: str, min_agree: int) -> str:
    """votes → majority edges → symmetric closure → min-id partition;
    emits part_{tag}(id, community)."""
    return f"""co_{tag} AS (
{_co_pairs_sql(len(CONSENSUS_SALTS), tag)}
),
consensus_{tag} AS (
  SELECT i, j FROM co_{tag} GROUP BY i, j
  HAVING COUNT(*) >= {min_agree}
),
ce_{tag} AS (
  SELECT i AS x, j AS y FROM consensus_{tag}
  UNION ALL
  SELECT j AS x, i AS y FROM consensus_{tag}
),
reach_{tag} AS (
  SELECT id AS v, id AS w FROM {nodes}
  UNION
  SELECT r.v, e.y FROM reach_{tag} r JOIN ce_{tag} e ON r.w = e.x
),
part_{tag} AS MATERIALIZED (
  SELECT v AS id, MIN(w) AS community FROM reach_{tag} GROUP BY v
),
"""


def _subclusters_oracle() -> str:
    runs1 = _ensemble_runs_sql(CONSENSUS_SALTS, "a")
    runs2 = _ensemble_runs_sql(
        SUBCLUSTER_SALTS, "b", edges="sub_edges", nodes="sub_nodes"
    )
    sql = f"""{_graph_head_sql()}{runs1}{_consensus_close_sql(
        "a", "nodes", CONSENSUS_MIN_AGREE
    )}sub_edges AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM edges e
  JOIN part_a pa ON e.src = pa.id
  JOIN part_a pb ON e.dst = pb.id
  WHERE pa.community = pb.community
),
sub_nodes AS (SELECT id FROM nodes),
{runs2}{_consensus_close_sql("b", "sub_nodes", CONSENSUS_MIN_AGREE)}"""
    sql = sql.rstrip().rstrip(",")
    return sql + """
SELECT p1.id AS skill, p1.community AS community,
       p2.community AS subcommunity
FROM part_a p1 JOIN part_b p2 ON p1.id = p2.id
ORDER BY p1.community, subcommunity, skill
"""


@register("skill_taxonomy_subclusters", oracle=_subclusters_oracle())
def skill_taxonomy_subclusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's recursive second-level clustering
    (cluster_utils.py:674 ``subcluster_nodes`` + :886
    ``collect_subclusters``): the level-1 consensus partition's
    clusters are each split further by re-running the full
    ensemble→consensus procedure on the cluster's INDUCED subgraph,
    and the per-cluster subpartitions are collected into one
    level-2 table (skill, community, subcommunity).

    Where the reference loops clusters on the driver (one igraph
    ensemble per cluster), the engine runs ALL induced subgraphs in
    ONE fused ensemble pass: intra-community edges never cross
    clusters, so label propagation on the union of induced subgraphs
    is exactly the per-cluster loop — the `member` thread of
    label_propagation_ensemble carries the fresh-seed ensemble and the
    final components stay within their parent community by
    construction. Nodes isolated inside their community become
    singleton subcommunities (the reference's small clusters likewise
    split to singletons).

    Scale shape: both consensus rounds (level-1 components, induced
    sub-edges, level-2 components) are parts of the family's shared
    materialized stage (_consensus_stage) — this key is one join of
    two finished lexicon-sized parquet parts; the only new shuffle the
    stage pays vs A36 is the broadcast-joined edge induction (level-1
    labels are dimension-sized) and the second CC loop, paid once per
    session rather than per key.
    """
    stage = _consensus_stage(spark, sf_dir)
    return (
        stage["comps1"].join(stage["comps2"], "id")
        .select(F.col("id").alias("skill"), "community", "subcommunity")
        .orderBy("community", "subcommunity", "skill")
    )


# ---------------------------------------------------------------- A42

# cluster_utils.py:437 node_affinity: each node's affinity to every
# cluster = the MEAN co-clustering occurrence between the node and the
# cluster's members (ensemble votes / N, missing pairs count 0, the
# node's self co-occurrence is 1), optionally row-normalised — the
# membership-confidence QC score the skills-taxonomy notebooks plot.


def _affinity_raw_sql() -> str:
    """Shared SQL through the dense (node, cluster) raw-affinity grid:
    graph head + level-1 ensemble/consensus + votes + `raw`/`part_a`
    CTEs; finishers append their own aggregate + final SELECT."""
    n = len(CONSENSUS_SALTS)
    runs1 = _ensemble_runs_sql(CONSENSUS_SALTS, "a")
    return f"""{_graph_head_sql()}{runs1}co_a AS (
{_co_pairs_sql(n, "a")}
),
votes AS MATERIALIZED (
  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS v FROM co_a GROUP BY i, j
),
consensus_a AS (SELECT i, j FROM votes WHERE v >= {CONSENSUS_MIN_AGREE}),
ce_a AS (
  SELECT i AS x, j AS y FROM consensus_a
  UNION ALL
  SELECT j AS x, i AS y FROM consensus_a
),
reach_a AS (
  SELECT id AS v, id AS w FROM nodes
  UNION
  SELECT r.v, e.y FROM reach_a r JOIN ce_a e ON r.w = e.x
),
part_a AS MATERIALIZED (
  SELECT v AS id, MIN(w) AS community FROM reach_a GROUP BY v
),
vsym AS (
  SELECT i, j, v FROM votes
  UNION ALL
  SELECT j AS i, i AS j, v FROM votes
  UNION ALL
  SELECT id AS i, id AS j, CAST({n} AS BIGINT) AS v FROM nodes
),
sizes AS (
  SELECT community, CAST(COUNT(*) AS BIGINT) AS csize
  FROM part_a GROUP BY community
),
cells AS (
  SELECT nd.id, cl.community
  FROM nodes nd CROSS JOIN (SELECT DISTINCT community FROM part_a) cl
),
sums AS (
  SELECT s.i AS id, l.community, SUM(s.v) AS sv
  FROM vsym s JOIN part_a l ON s.j = l.id
  GROUP BY 1, 2
),
raw AS MATERIALIZED (
  SELECT c.id, c.community,
         COALESCE(m.sv, 0) * 1.0 / ({n} * z.csize) AS aff
  FROM cells c
  LEFT JOIN sums m ON m.id = c.id AND m.community = c.community
  JOIN sizes z ON z.community = c.community
),
"""


def _node_affinity_oracle() -> str:
    from ..functions.rounding import sql_round

    return f"""{_affinity_raw_sql()}nrm AS (
  SELECT id, community, aff,
         aff / SUM(aff) OVER (PARTITION BY id) AS affn
  FROM raw
)
SELECT r.id AS skill, r.community AS cluster,
       (o.community = r.community) AS is_own,
       {sql_round('aff', 6)} AS affinity,
       {sql_round('affn', 6)} AS affinity_norm
FROM nrm r JOIN part_a o ON o.id = r.id
ORDER BY skill, cluster
"""


@register("node_affinity_audit", oracle=_node_affinity_oracle())
def node_affinity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node cluster-membership confidence — the reference's
    ``node_affinity`` (cluster_utils.py:437): affinity(i, c) is the
    mean ensemble co-clustering occurrence between node i and cluster
    c's members (votes / N over ALL of c's members, absent pairs 0,
    self-occurrence 1), plus the row-normalised variant its
    ``normalise=True`` mode returns. ``is_own`` marks the node's own
    consensus cluster — a low own-cluster affinity is the reference
    notebooks' signal of an unstable assignment.

    Scale shape: the votes frame is the SAME co-assignment aggregate
    A36 builds (computed once, checkpointed, reused for the consensus
    partition AND the affinity sums); the node×cluster affinity grid
    is lexicon×communities — dimension-scale, dense by construction
    like the reference's matrix; the per-node normaliser is a window
    over ≤|communities| rows.
    """
    from ..functions.rounding import round_eps

    raw, level1 = _affinity_grid(spark, sf_dir)
    w_node = Window.partitionBy("id")
    nrm = raw.withColumn("affn", F.col("aff") / F.sum("aff").over(w_node))
    own = level1.select("id", F.col("community").alias("own_community"))
    return (
        nrm.join(F.broadcast(own), "id")
        .select(
            F.col("id").alias("skill"),
            F.col("community").alias("cluster"),
            (F.col("own_community") == F.col("community")).alias("is_own"),
            round_eps(F.col("aff"), 6).alias("affinity"),
            round_eps(F.col("affn"), 6).alias("affinity_norm"),
        )
        .orderBy("skill", "cluster")
    )


def _affinity_grid(spark: SparkSession, sf_dir: str):
    """The dense (node, cluster) raw-affinity grid + the level-1
    partition — shared by A42 (per-node view) and A43 (per-cluster
    view). Returns (raw(id, community, aff), level1(id, community)).
    votes/comps come from the family's shared materialized stage, so
    neither audit re-pays the scan/ensemble/CC chain."""
    n = len(CONSENSUS_SALTS)
    stage = _consensus_stage(spark, sf_dir)
    votes = stage["votes"]
    level1 = stage["comps1"]
    nodes = level1.select("id")

    vsym = (
        votes.select("i", "j", F.col("votes").alias("v"))
        .unionByName(
            votes.select(
                F.col("j").alias("i"), F.col("i").alias("j"),
                F.col("votes").alias("v"),
            )
        )
        .unionByName(
            nodes.select(
                F.col("id").alias("i"), F.col("id").alias("j"),
                F.lit(n).cast("bigint").alias("v"),
            )
        )
    )
    sums = (
        vsym.join(
            F.broadcast(level1.withColumnRenamed("id", "j")), "j"
        )
        .groupBy(F.col("i").alias("id"), "community")
        .agg(F.sum("v").alias("sv"))
    )
    sizes = level1.groupBy("community").agg(
        F.count(F.lit(1)).cast("bigint").alias("csize")
    )
    cells = nodes.crossJoin(
        F.broadcast(level1.select("community").distinct())
    )
    raw = (
        cells.join(F.broadcast(sums), ["id", "community"], "left")
        .join(F.broadcast(sizes), "community")
        .select(
            "id",
            "community",
            (
                F.coalesce(F.col("sv"), F.lit(0)) * 1.0
                / (F.lit(n) * F.col("csize"))
            ).alias("aff"),
        )
    )
    return raw, level1


# ---------------------------------------------------------------- A43


def _cluster_affinity_oracle() -> str:
    from ..functions.rounding import sql_round

    return f"""{_affinity_raw_sql()}cmat AS (
  SELECT o.community AS ca, r.community AS cb, AVG(r.aff) AS aff
  FROM raw r JOIN part_a o ON o.id = r.id
  GROUP BY 1, 2
)
SELECT c1.ca AS cluster_a, c1.cb AS cluster_b,
       {sql_round('c1.aff', 6)} AS affinity,
       {sql_round('(c1.aff + c2.aff) / 2', 6)} AS affinity_sym,
       (c1.ca = c1.cb) AS is_self
FROM cmat c1 JOIN cmat c2 ON c1.ca = c2.cb AND c1.cb = c2.ca
ORDER BY cluster_a, cluster_b
"""


@register("cluster_affinity_audit", oracle=_cluster_affinity_oracle())
def cluster_affinity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-to-cluster affinity — the reference's
    ``cluster_affinity_matrix`` (cluster_utils.py:517): C[k, l] is the
    mean of cluster k's members' node affinities to cluster l, with
    the ``symmetric=True`` variant (C + Cᵀ)/2 alongside. The diagonal
    (``is_self`` rows) is the reference's ``list_cluster_stability``
    (:602) — the per-cluster stability score the taxonomy notebooks
    print. Closes the last computation in cluster_utils.py.

    Scale shape: one aggregate over A42's dense lexicon×communities
    grid (shared via _affinity_grid) down to the communities² matrix,
    then a self-join on that dimension-scale frame for the transpose.
    """
    from ..functions.rounding import round_eps

    raw, level1 = _affinity_grid(spark, sf_dir)
    own = level1.select("id", F.col("community").alias("ca"))
    cmat = (
        raw.join(F.broadcast(own), "id")
        .groupBy("ca", F.col("community").alias("cb"))
        .agg(F.avg("aff").alias("aff"))
        .transform(cut_lineage)
    )
    t = cmat.select(
        F.col("ca").alias("cb2"),
        F.col("cb").alias("ca2"),
        F.col("aff").alias("aff_t"),
    )
    return (
        cmat.join(
            F.broadcast(t),
            (F.col("ca") == F.col("ca2")) & (F.col("cb") == F.col("cb2")),
        )
        .select(
            F.col("ca").alias("cluster_a"),
            F.col("cb").alias("cluster_b"),
            round_eps(F.col("aff"), 6).alias("affinity"),
            round_eps((F.col("aff") + F.col("aff_t")) / 2, 6).alias(
                "affinity_sym"
            ),
            (F.col("ca") == F.col("cb")).alias("is_self"),
        )
        .orderBy("cluster_a", "cluster_b")
    )

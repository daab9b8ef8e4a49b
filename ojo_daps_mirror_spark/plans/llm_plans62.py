"""Sixty-second sweep (SURVEY.md §2 B116, C131-C132).

Peak session concurrency by sweep-line (the capacity-planning number
behind every "how many servers" question), minimum spanning tree by
Kruskal folded inside one array expression (B98's no-driver-loop
recipe applied to union-find), and BERTopic-style c-TF-IDF cluster
characterisation of the embedding labels (what IS cluster 7, in
words — the step after C41/C105 cluster geometry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps, sql_round
from ..operators.rank import global_order_stats
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- B116

SESSION_GAP_US = 1_800_000_000  # 30 min, matches B5's sessionize

_B116_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
         CAST(MIN(epoch_us(ts)) AS BIGINT) AS s_us,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS e_us
  FROM (SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sidx
        FROM ordered)
  GROUP BY user_id, sidx
),
pts AS (
  SELECT user_id, s_us AS t, CAST(1 AS BIGINT) AS delta FROM sessions
  UNION ALL
  SELECT user_id, e_us + 1 AS t, CAST(-1 AS BIGINT) AS delta FROM sessions
),
swept AS (
  SELECT t, SUM(delta) OVER (ORDER BY t, delta, user_id
                             ROWS UNBOUNDED PRECEDING) AS conc
  FROM pts
)
SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency
FROM swept GROUP BY 1 ORDER BY day
"""


@register("peak_concurrency", oracle=_B116_ORACLE)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak number of simultaneously-open sessions, by the
    classic sweep-line: sessionize (B5's 30-min gap rule), emit
    +1/−1 boundary points (session end exclusive at end+1µs), order
    globally and take the running sum's max per day — the
    capacity-planning number (licenses, connection pools, executor
    counts) that a per-day COUNT(DISTINCT) gets wrong because it
    ignores overlap in time.

    Scale shape: sessionization is one per-user window; the sweep
    collapses to 2 points per SESSION (≪ events) and the running sum
    is one global ordered window over that boundary stream — at 100 TB
    the boundary frame is range-partitionable by time with carry-in
    offsets (the standard distributed prefix-sum split); here the
    deterministic (t, delta, user) order makes both engines sweep
    identically.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
                > SESSION_GAP_US
            ),
            1,
        ).otherwise(0),
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ordered.withColumn("sidx", F.sum("is_new").over(wc))
        .groupBy("user_id", "sidx")
        .agg(
            F.min(F.unix_micros("ts")).cast("bigint").alias("s_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("e_us"),
        )
    )
    # Both boundary points of a session emit MAP-SIDE from its row
    # (one explode), not via a self-union whose two branches each
    # re-ran the sessionize window + aggregate subtree.
    pts = sessions.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("s_us").alias("t"),
                    F.lit(1).cast("bigint").alias("delta"),
                ),
                F.struct(
                    (F.col("e_us") + 1).alias("t"),
                    F.lit(-1).cast("bigint").alias("delta"),
                ),
            )
        ).alias("pt"),
    ).select("user_id", "pt.t", "pt.delta")
    # Running concurrency via the range-partitioned cumulative sum —
    # no unpartitioned window over the event-boundary stream
    # (operators/rank.py).
    swept = global_order_stats(
        pts, ["t", "delta", "user_id"], rn_col="__rn", cumsum={"conc": "delta"}
    ).select("t", "conc")
    return (
        swept.groupBy(
            F.date_format(F.timestamp_micros(F.col("t")), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
        .orderBy("day")
    )


# ---------------------------------------------------------------- C131

MST_COST_NUM = 1_000_000_000


def _c131_oracle() -> str:
    # list_reduce state and elements share one struct type:
    #   comp  : LIST(BIGINT) — union-find labels (25) for the state,
    #           [a, b, w] for a wrapped edge element
    #   picked: LIST(STRUCT(a,b,w)) — MST edges so far (empty on elements)
    # DuckDB 1.0.0 quirk: plain `acc.picked || [..]` inside list_reduce
    # aliases the accumulator and drops prior elements; the
    # list_transform(acc.picked, q -> q) copy forces a fresh list.
    ca = "acc.comp[CAST(x.comp[1] AS BIGINT) + 1]"
    cb = "acc.comp[CAST(x.comp[2] AS BIGINT) + 1]"
    step = f"""
      CASE WHEN {ca} <> {cb} THEN struct_pack(
        comp := list_transform(acc.comp,
                  c -> CASE WHEN c = {cb} THEN {ca} ELSE c END),
        picked := list_transform(acc.picked, q -> q) || [struct_pack(
          a := x.comp[1], b := x.comp[2], w := x.comp[3])])
      ELSE acc END
    """
    return f"""
WITH cnts AS (
  SELECT LEAST(c_nationkey, s_nationkey) AS a,
         GREATEST(c_nationkey, s_nationkey) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY 1, 2
),
edges AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST({MST_COST_NUM} // cnt AS BIGINT) AS w
  FROM cnts
),
ordered AS (
  SELECT list(struct_pack(comp := [w, a, b],
                          picked := []::STRUCT(a BIGINT, b BIGINT,
                                               w BIGINT)[])
              ORDER BY w, a, b) AS es
  FROM edges
),
folded AS (
  SELECT list_reduce(
    [struct_pack(comp := list_transform(range(0, 25), i -> CAST(i AS BIGINT)),
                 picked := []::STRUCT(a BIGINT, b BIGINT, w BIGINT)[])]
    || list_transform(es, e -> struct_pack(
         comp := [e.comp[2], e.comp[3], e.comp[1]], picked := e.picked)),
    (acc, x) -> {step}) AS st
  FROM ordered
)
SELECT CAST(p.i AS BIGINT) AS pick_order,
       p.e.a AS a, p.e.b AS b, p.e.w AS w, mst_total
FROM (
  SELECT unnest(list_transform(st.picked,
           (e, i) -> struct_pack(i := i, e := e))) AS p,
         CAST(list_sum(list_transform(st.picked, q -> q.w)) AS BIGINT)
           AS mst_total
  FROM folded
)
ORDER BY pick_order
"""


@register("mst_kruskal_fold", oracle=_c131_oracle())
def mst_kruskal_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning tree of the undirected nation trade graph by
    Kruskal's algorithm — edges sorted by cost (1e9/trade-count,
    heavier trade = cheaper), union-find labels carried as a 25-slot
    array while the inherently-sequential scan folds INSIDE one array
    expression (B98/C120's no-driver-loop recipe — union-find is
    sequential, so fold it in-expression over the BOUNDED node set
    instead of looping on the driver). The backbone-extraction
    complement of C127's SSSP: SSSP answers "cheapest route", MST
    answers "cheapest network that connects everyone".

    Scale shape: ONE volume-bound aggregate collapses the fact
    stream to ≤|nations|² edges; the sort and fold run on that single
    collapsed row in exact BIGINT arithmetic. At larger node counts
    the same recipe shards: Borůvka rounds (per-component min edge =
    one groupBy) with this fold as the per-round merge.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    edges = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").cast("bigint").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").cast("bigint").alias("b"),
        )
        .agg(
            F.floor(F.lit(MST_COST_NUM) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("w")
        )
    )
    ordered = edges.agg(
        F.array_sort(F.collect_list(F.struct("w", "a", "b"))).alias("es")
    )

    def step(acc, e):
        ca = F.element_at(acc["comp"], (e["a"] + 1).cast("int"))
        cb = F.element_at(acc["comp"], (e["b"] + 1).cast("int"))
        merged = F.struct(
            F.transform(
                acc["comp"], lambda c: F.when(c == cb, ca).otherwise(c)
            ).alias("comp"),
            F.concat(
                acc["picked"],
                F.array(
                    F.struct(
                        e["a"].alias("a"), e["b"].alias("b"), e["w"].alias("w")
                    )
                ),
            ).alias("picked"),
        )
        return F.when(ca != cb, merged).otherwise(acc)

    init = F.struct(
        F.sequence(F.lit(0).cast("bigint"), F.lit(24).cast("bigint")).alias(
            "comp"
        ),
        F.expr(
            "CAST(array() AS array<struct<a:bigint,b:bigint,w:bigint>>)"
        ).alias("picked"),
    )
    folded = ordered.select(
        F.aggregate(F.col("es"), init, step)["picked"].alias("picked")
    )
    return (
        folded.select(
            F.posexplode("picked").alias("pos", "e"),
            F.aggregate(
                F.col("picked"),
                F.lit(0).cast("bigint"),
                lambda s, q: s + q["w"],
            ).alias("mst_total"),
        )
        .select(
            (F.col("pos") + 1).cast("bigint").alias("pick_order"),
            F.col("e.a").alias("a"),
            F.col("e.b").alias("b"),
            F.col("e.w").alias("w"),
            "mst_total",
        )
        .orderBy("pick_order")
    )


# ---------------------------------------------------------------- C132

CTFIDF_TOP = 5

_C132_ORACLE = f"""
WITH labeled AS (
  SELECT e.label, d.text
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
toks AS (
  SELECT label, unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM labeled
),
tf AS (
  SELECT label, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE tok <> '' GROUP BY 1, 2
),
class_tot AS (
  SELECT label, CAST(SUM(tf) AS BIGINT) AS class_toks FROM tf GROUP BY 1
),
df AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS tok_all FROM tf GROUP BY 1),
avg_class AS (
  SELECT SUM(class_toks) * 1.0 / COUNT(*) AS a FROM class_tot
),
scored AS (
  SELECT t.label, t.tok, t.tf,
         (t.tf * 1.0 / c.class_toks) * ln(1.0 + ac.a / d.tok_all) AS score
  FROM tf t
  JOIN class_tot c ON t.label = c.label
  JOIN df d ON t.tok = d.tok
  CROSS JOIN avg_class ac
)
SELECT label, tok, tf, {sql_round('score', 6)} AS ctfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY tf DESC, tok)
            AS BIGINT) AS rnk
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY label ORDER BY tf DESC, tok)
        <= {CTFIDF_TOP}
ORDER BY label, rnk
"""


@register("ctfidf_cluster_terms", oracle=_C132_ORACLE)
def ctfidf_cluster_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERTopic-style cluster characterisation: for each embedding
    label (cluster), the top-5 terms by in-class frequency with their
    c-TF-IDF score (class-normalised tf × ln(1 + avg-class-size/df)) —
    the "what IS cluster 7, in words" step after C41/C105 measure
    cluster geometry, and the Spark-native form of the reference's
    cluster-naming notebooks (surface_form_clustering). Ranking uses
    the EXACT integer tf (ties broken by token) so both engines pick
    identical term sets; the transcendental score is reported, not
    ranked on.

    Scale shape: one (label, token) aggregate is the volume-bound
    shuffle; class totals and document frequencies derive from those
    partials (no re-scan), the scalar average-class-size broadcasts,
    and top-5 is a per-label window on the class-vocabulary frame.
    """
    labeled = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .join(
            load_table(spark, sf_dir, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "label"
            ),
            "doc_id",
        )
    )
    toks = labeled.select(
        "label",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("label", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    tf = tf.persist()
    class_tot = tf.groupBy("label").agg(
        F.sum("tf").cast("bigint").alias("class_toks")
    )
    df = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("tok_all"))
    avg_class = class_tot.agg(
        (F.sum("class_toks") * 1.0 / F.count(F.lit(1))).alias("a")
    )
    scored = (
        tf.join(F.broadcast(class_tot), "label")
        .join(df, "tok")
        .transform(scalars(avg_class))
        .select(
            "label",
            "tok",
            "tf",
            (
                (F.col("tf") * 1.0 / F.col("class_toks"))
                * F.log(1.0 + F.col("a") / F.col("tok_all"))
            ).alias("score"),
        )
    )
    wl = Window.partitionBy("label").orderBy(F.col("tf").desc(), "tok")
    return (
        scored.withColumn("rnk", F.row_number().over(wl))
        .where(F.col("rnk") <= CTFIDF_TOP)
        .select(
            "label",
            "tok",
            "tf",
            round_eps(F.col("score"), 6).alias("ctfidf"),
            F.col("rnk").cast("bigint"),
        )
        .orderBy("label", "rnk")
    )

"""Reference-parity plans, second sweep (SURVEY.md §2.A25–A29).

Closes the remaining gaps found by auditing every reference module
against the §2 inventory: weekly location vacancies, the skills-by-SOC
snapshot (most-common-15 filter), the regex location model, frequent
surface-form removal, and the DQA weekly-counts family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round_eps
from ..operators.snapshot import oracle_weekly_stock_sql, weekly_stock
from ..operators.attach import scalars
from ..sources import load_table
from . import register

# ---------------------------------------------------------------- A25

_A25_ORACLE = oracle_weekly_stock_sql(
    """SELECT o_orderdate::DATE AS d, n_name, n_nationkey
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey""",
    "o_orderdate",
    ["n_name", "n_nationkey"],
)


@register("weekly_locs_vacancies", oracle=_A25_ORACLE)
def weekly_locs_vacancies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly indexed stock per location (name + code), the
    nuts_2_name/nuts_2_code pair of the reference.

    Reference: ojd_daps/flows/aggregate/weekly_locs_vacancies.py —
    same stock machinery as weekly_stock.py but grouped by the
    standardised location dimension, each location indexed to its own
    first-4-week average.

    Scale shape: identical to A1/A2 — each order emits its live Mondays
    map-side, one groupBy of ~|weeks|×|nations| keys; the geography
    dimension is broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    geo = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "n_name", "n_nationkey")
    src = orders.join(F.broadcast(geo), F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("o_orderdate").alias("d"), "n_name", "n_nationkey"
    )
    return weekly_stock(src, "d", ["n_name", "n_nationkey"])


# ---------------------------------------------------------------- A26

TOP_SOC_CODES = 15

_A26_ORACLE = f"""
WITH base AS (
  SELECT p_brand, l_returnflag FROM lineitem JOIN part ON l_partkey = p_partkey
),
cells AS (
  SELECT p_brand, l_returnflag, COUNT(*) AS n FROM base GROUP BY 1, 2
),
totals AS (
  SELECT p_brand, SUM(n) AS total,
         ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, p_brand) AS rk
  FROM cells GROUP BY p_brand
)
SELECT c.p_brand AS soc_code,
       c.l_returnflag AS skill_group,
       ROUND(100.0 * c.n / t.total + 1e-9, 4) AS percentage,
       c.n AS n_ads
FROM cells c JOIN totals t USING (p_brand)
WHERE t.rk <= {TOP_SOC_CODES}
ORDER BY soc_code, skill_group
"""


@register("skills_by_soc_snapshot", oracle=_A26_ORACLE)
def skills_by_soc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skill-mix share within each of the 15 most common SOC codes.

    Reference: flows/aggregate/skill_cats_by_soc_snapshot.py — filter
    ads to the 15 most-common SOC codes (aggregate/common.py:
    most_common), then aggregate_skills per code. Ties in most_common
    are made deterministic here by (count DESC, code ASC).

    Analog: p_brand = SOC code, l_returnflag = skill cluster. Scale
    shape: ONE wide shuffle — the (brand, shipmode) cell aggregate with
    map-side combine; the top-K filter, totals and shares are windows
    over the tiny cell frame (|brands| × |shipmodes| rows). part is
    broadcast into the fact scan.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("soc_code"),
            F.col("l_returnflag").alias("skill_group"),
        )
        .agg(F.count(F.lit(1)).alias("n_ads"))
    )
    brands = (
        cells.groupBy("soc_code")
        .agg(F.sum("n_ads").alias("total"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("total").desc(), "soc_code")),
        )
        .where(F.col("rk") <= TOP_SOC_CODES)
        .select("soc_code", "total")
    )
    return (
        cells.join(F.broadcast(brands), "soc_code")
        .select(
            "soc_code",
            "skill_group",
            round_eps(100.0 * F.col("n_ads") / F.col("total"), 4).alias("percentage"),
            "n_ads",
        )
        .orderBy("soc_code", "skill_group")
    )


# ---------------------------------------------------------------- A27

OUTCODE_REGEX = "[1-9][0-9]{2}"
BOILERPLATE_TEXT = "Customer"

_A27_ORACLE = f"""
SELECT c_custkey AS id,
       CASE WHEN regexp_extract(c_name, '{OUTCODE_REGEX}') <> ''
            THEN replace(regexp_extract(c_name, '{OUTCODE_REGEX}'), ' ', '')
            ELSE trim(replace(lower(replace(string_split(c_name, ',')[1],
                                            '{BOILERPLATE_TEXT}', '')),
                              ' ', '_'), '_')
       END AS location
FROM customer
ORDER BY id
"""


@register("location_regex_extract", oracle=_A27_ORACLE)
def location_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's regex location model as one CASE expression.

    Reference: labs/locations/regex/regex_utils.py:regex_model — try
    the postcode-outcode regex first (first match, spaces removed);
    if it finds nothing, tidy the raw string for place-name matching:
    take the part before the first comma, strip boilerplate, lowercase,
    spaces→underscores, trim underscores.

    Pure whole-stage-codegen expressions over the scan — no shuffle,
    no UDF; at 100 TB this is a map-only pass.
    """
    customer = load_table(spark, sf_dir, "customer")
    raw = F.col("c_name")
    outcode = F.regexp_extract(raw, OUTCODE_REGEX, 0)
    cleaned = F.expr(
        "trim(BOTH '_' FROM replace(lower(replace("
        f"split(c_name, ',')[0], '{BOILERPLATE_TEXT}', '')), ' ', '_'))"
    )
    return (
        customer.select(
            F.col("c_custkey").alias("id"),
            F.when(outcode != "", F.regexp_replace(outcode, " ", ""))
            .otherwise(cleaned)
            .alias("location"),
        )
        .orderBy("id")
    )


# ---------------------------------------------------------------- A28

FORM_LEXICON_SIZE = 40
FORM_MIN_LEN = 4
FORM_PERCENTILE = 0.95
_PREF_LEN = 6  # forms this long are 'label_pref' (preferred-label analog)

from ..functions.text import STOPWORDS, sql_tokens  # noqa: E402

_sw = ", ".join(f"'{w}'" for w in STOPWORDS)

_A28_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
),
lexicon AS (
  SELECT tok AS surface_form, COUNT(*) AS n_mentions
  FROM toks
  WHERE length(tok) >= {FORM_MIN_LEN} AND tok NOT IN ({_sw})
  GROUP BY tok
  ORDER BY COUNT(*) DESC, tok
  LIMIT {FORM_LEXICON_SIZE}
),
typed AS (
  SELECT surface_form,
         CASE WHEN length(surface_form) >= {_PREF_LEN}
              THEN 'label_pref' ELSE 'label_alt' END AS surface_form_type,
         n_mentions
  FROM lexicon
),
thresh AS (
  SELECT quantile_cont(n_mentions, {FORM_PERCENTILE}) AS n_threshold FROM typed
)
SELECT surface_form, surface_form_type, n_mentions,
       CASE WHEN n_mentions > n_threshold
                 AND len(string_split(surface_form, ' ')) <= 1
                 AND surface_form_type <> 'label_pref'
            THEN 0 ELSE 1 END AS keep
FROM typed CROSS JOIN thresh
ORDER BY surface_form
"""


@register("remove_frequent_forms", oracle=_A28_ORACLE)
def remove_frequent_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-based surface-form refinement.

    Reference: labs/skills/skills_detection_utils.py:
    count_surface_forms + frequency_refinement (and
    remove_frequent_forms_flow.py) — corpus-wide mention counts per
    surface form, a percentile threshold (np.percentile 95 ≡ linear
    interpolation ≡ quantile_cont ≡ Spark percentile), and removal of
    forms that are above-threshold AND single-word AND not derived from
    the preferred label.

    Scale shape: the only corpus-wide work is the token-count groupBy
    (map-side combined); the lexicon, threshold and flags are
    driver-scale frames (≤ lexicon size) joined by broadcast.
    """
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    lexicon = (
        toks.where(
            (F.length("tok") >= FORM_MIN_LEN) & (~F.col("tok").isin(*STOPWORDS))
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .orderBy(F.col("n_mentions").desc(), "tok")
        .limit(FORM_LEXICON_SIZE)
        .select(
            F.col("tok").alias("surface_form"),
            F.when(F.length("tok") >= _PREF_LEN, "label_pref")
            .otherwise("label_alt")
            .alias("surface_form_type"),
            "n_mentions",
        )
    )
    thresh = lexicon.agg(
        F.percentile("n_mentions", F.lit(FORM_PERCENTILE)).alias("n_threshold")
    )
    return (
        lexicon.transform(scalars(thresh))
        .select(
            "surface_form",
            "surface_form_type",
            "n_mentions",
            F.when(
                (F.col("n_mentions") > F.col("n_threshold"))
                & (F.size(F.split("surface_form", " ")) <= 1)
                & (F.col("surface_form_type") != "label_pref"),
                0,
            )
            .otherwise(1)
            .alias("keep"),
        )
        .orderBy("surface_form")
    )


# ---------------------------------------------------------------- A29

_A29_ORACLE = """
SELECT strftime(date_trunc('week', ts)::DATE, '%Y-%m-%d') AS week,
       event_type AS board,
       COUNT(*) AS n_ads,
       ROUND(AVG(len(string_split_regex(props, '\\s+'))) + 1e-9, 4) AS mean_words,
       CAST(SUM(length(props)) AS BIGINT) AS total_bytes
FROM events
GROUP BY 1, 2
ORDER BY week, board
"""


@register("dqa_counts_weekly", oracle=_A29_ORACLE)
def dqa_counts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly collection counts + description-length + payload-size QA.

    Reference: dqa/s3_counts.py + s3_counts_utils.py (weekly ad counts
    per job board), dqa/s3_length_of_descriptions.py:count_approx_words
    (whitespace-split word counts), dqa/collect_raw_filesizes.py
    (payload bytes). One pass, one map-side-combined groupBy of
    ~|weeks|×|boards| keys.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias(
                "week"
            ),
            F.col("event_type").alias("board"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_ads"),
            round_eps(F.avg(F.size(F.split(F.col("props"), r"\s+"))), 4).alias(
                "mean_words"
            ),
            F.sum(F.length("props")).alias("total_bytes"),
        )
        .orderBy("week", "board")
    )


# ---------------------------------------------------------------- A31

# (pattern, spark_replacement, duckdb_replacement) — applied in order.
# Reference pipeline labs/skills/text_cleaning_utils.py:clean_text
# (keep_punct=True): detect_sentences → lowercase → clean_punctuation →
# pad_punctuation → [lemmatise: external model, stubbed out like A14] →
# remove_stopwords → unpad_punctuation → clean_up.
_BULLETS = "[•‣◦⁃∙]"
_CLEAN_STEPS_PRE = [
    ("([a-z])([A-Z])([a-z])", "$1. $2$3", "\\1. \\2\\3"),  # detect_sentences
]
_CLEAN_STEPS_PUNCT = [
    (_BULLETS, ",", ","),                                  # bullets → commas
    ("[-/:\\\\]", " ", " "),                               # -/:\ → space
    ("[^a-zA-Z0-9,.; #(++)]", "", ""),                     # drop other symbols
    ("([^a-zA-Z0-9 #(++)+])", " $1 ", " \\1 "),            # pad_punctuation
]
_UNPAD = ("( )([^a-zA-Z0-9 #(++)+])", "$2", "\\2")
_sw_list = ", ".join(f"'{w}'" for w in STOPWORDS)


def _clean_text_spark(col):
    x = col
    for pat, rep, _ in _CLEAN_STEPS_PRE:
        x = F.regexp_replace(x, pat, rep)
    x = F.lower(x)
    for pat, rep, _ in _CLEAN_STEPS_PUNCT:
        x = F.regexp_replace(x, pat, rep)
    x = F.array_join(
        F.filter(F.split(x, " "), lambda t: ~t.isin(*STOPWORDS)), " "
    )
    x = F.regexp_replace(x, _UNPAD[0], _UNPAD[1])
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def _clean_text_duck(expr: str) -> str:
    x = expr
    for pat, _, rep in _CLEAN_STEPS_PRE:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    x = f"lower({x})"
    for pat, _, rep in _CLEAN_STEPS_PUNCT:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    x = (
        f"array_to_string(list_filter(string_split({x}, ' '), "
        f"t -> t NOT IN ({_sw_list})), ' ')"
    )
    x = f"regexp_replace({x}, '{_UNPAD[0]}', '{_UNPAD[2]}', 'g')"
    return f"trim(regexp_replace({x}, '\\s+', ' ', 'g'))"


_A31_ORACLE = f"""
SELECT doc_id, {_clean_text_duck("text")} AS clean_text
FROM documents
ORDER BY doc_id
"""


@register("clean_text", oracle=_A31_ORACLE)
def clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skills text-preprocessing pipeline as one codegen expression
    chain.

    Reference: labs/skills/text_cleaning_utils.py:clean_text
    (keep_punct=True) — camel-case sentence-boundary repair, lowercase,
    punctuation normalisation, punctuation padding, stopword removal,
    unpadding, whitespace collapse. The lemmatisation step calls an
    external NLTK model and is stubbed out exactly like the reference's
    other external models (A14 vectorise, A15 requires-degree). The
    whole chain stays inside whole-stage codegen: a map-only pass with
    zero Python at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", _clean_text_spark(F.col("text")).alias("clean_text")
    ).orderBy("doc_id")


# ---------------------------------------------------------------- A32

_A32_ORACLE = """
WITH o AS (
  SELECT COUNT(*) - COUNT(o_custkey) AS null_fk,
         COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk
  FROM orders
),
c AS (
  SELECT COUNT(*) - COUNT(DISTINCT c_custkey) AS dup_pk FROM customer
),
orphans AS (
  SELECT COUNT(*) AS n FROM orders
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT 'orders.o_custkey_null' AS check_name, null_fk AS n_violations FROM o
UNION ALL
SELECT 'orders.o_orderkey_dup_pk', dup_pk FROM o
UNION ALL
SELECT 'customer.c_custkey_dup_pk', dup_pk FROM c
UNION ALL
SELECT 'orders.o_custkey_fk_orphan', n FROM orphans
ORDER BY check_name
"""


@register("integrity_audit", oracle=_A32_ORACLE)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit: the reference's ORM schema guarantees
    (ojd_daps/orms/raw_jobs.py primary keys / nullable flags, and the
    dqa package's count checks) as an executable data-quality query —
    null FKs, duplicate PKs, FK orphans, one row per check.

    Scale shape: null + dup-PK checks share ONE aggregate pass per
    table (count vs count-distinct partials); the orphan check is a
    broadcast left-anti join counted map-side. Union of four 1-row
    frames — total cost is two scans and one tiny shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    o = orders.agg(
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_fk"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_pk"),
    )
    c = customer.agg(
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).alias("dup_pk")
    )
    orphans = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        o.select(F.lit("orders.o_custkey_null").alias("check_name"),
                 F.col("null_fk").alias("n_violations"))
        .unionAll(
            o.select(F.lit("orders.o_orderkey_dup_pk"), F.col("dup_pk"))
        )
        .unionAll(c.select(F.lit("customer.c_custkey_dup_pk"), F.col("dup_pk")))
        .unionAll(orphans.select(F.lit("orders.o_custkey_fk_orphan"), F.col("n")))
        .orderBy("check_name")
    )

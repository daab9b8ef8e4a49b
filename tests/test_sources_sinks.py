"""Sink/source round-trips and physical-layout assertions."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ojo_daps_mirror_spark.sources import load_table
from ojo_daps_mirror_spark.sources.sinks import (
    read_csv,
    read_json,
    write_bucketed,
    write_csv,
    write_json,
    write_partitioned,
)

TMP = "/root/repo/.tmp_sink_test"


@pytest.fixture(autouse=True, scope="module")
def _clean_tmp():
    shutil.rmtree(TMP, ignore_errors=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def _sorted_rows(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_partitioned_parquet_prunes(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    path = f"{TMP}/part_by_type"
    write_partitioned(part, path, ["p_type"])

    back = spark.read.parquet(path)
    assert _sorted_rows(back, ["p_partkey", "p_brand"]) == _sorted_rows(
        part, ["p_partkey", "p_brand"]
    )

    # A filter on the partition column must prune at the source: the scan
    # reports it under PartitionFilters, not as a post-scan Filter.
    plan = (
        back.where(F.col("p_type") == "ECONOMY")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "p_type" in plan.split("PartitionFilters", 1)[1][:200]


def test_bucketed_table_joins_without_exchange(spark, sf_dir):
    # A previous session's warehouse dir survives while its catalog
    # entries don't — drop both so saveAsTable starts clean.
    for t in ("orders_bucketed_a", "orders_bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/root/repo/spark-warehouse/{t}", ignore_errors=True)

    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(
        orders, "orders_bucketed_a", ["o_custkey"], num_buckets=8
    )
    write_bucketed(
        orders.select("o_orderkey", "o_custkey"),
        "orders_bucketed_b",
        ["o_custkey"],
        num_buckets=8,
    )
    a = spark.table("orders_bucketed_a")
    b = spark.table("orders_bucketed_b").withColumnRenamed(
        "o_orderkey", "b_orderkey"
    )
    joined = a.join(b, "o_custkey")
    assert joined.count() > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # Bucket co-location removes the shuffle on the join key.
    assert "Exchange hashpartitioning(o_custkey" not in plan


def test_csv_round_trip(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    path = f"{TMP}/nation_csv"
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    cols = nation.columns
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)


def test_json_round_trip(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    path = f"{TMP}/customer_json"
    write_json(cust, path)
    back = read_json(spark, path, cust.schema)
    cols = cust.columns
    assert _sorted_rows(back, cols) == _sorted_rows(cust, cols)


def test_orc_round_trip(spark, sf_dir):
    # D6: ORC is the second columnar lake format Spark ships natively;
    # the engine's tables survive a parquet→ORC→DataFrame round trip
    # with schema intact.
    nation = load_table(spark, sf_dir, "nation")
    path = f"{TMP}/nation_orc"
    nation.write.mode("overwrite").orc(path)
    back = spark.read.schema(nation.schema).orc(path)
    cols = nation.columns
    assert back.schema == nation.schema
    assert _sorted_rows(back, cols) == _sorted_rows(nation, cols)


def test_parquet_zstd_codec_round_trip(spark, sf_dir):
    # Compression is a table property, not a semantic one: zstd output
    # must read back identically (zstd is the 100 TB default — better
    # ratio than snappy at similar scan cost).
    cust = load_table(spark, sf_dir, "customer")
    path = f"{TMP}/customer_zstd"
    cust.write.mode("overwrite").option("compression", "zstd").parquet(path)
    back = spark.read.parquet(path)
    cols = cust.columns
    assert _sorted_rows(back, cols) == _sorted_rows(cust, cols)
    import glob
    import os

    files = glob.glob(f"{path}/*.zstd.parquet") + glob.glob(f"{path}/*zstd*")
    assert files, os.listdir(path)


def test_streaming_partitioned_parquet_sink(spark, sf_dir, tmp_path):
    """Stream → date-partitioned parquet: row parity with the batch
    table, partition directories on disk, and pruning in the plan."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from ojo_daps_mirror_spark.sources import load_table
    from ojo_daps_mirror_spark.streaming.stock import (
        stream_to_partitioned_parquet,
    )

    out = str(tmp_path / "lake")
    ck = str(tmp_path / "ck")
    got = stream_to_partitioned_parquet(spark, sf_dir, out, ck)
    batch = load_table(spark, sf_dir, "events")
    assert got.count() == batch.count()
    # partition dirs exist on disk
    import os

    assert any(d.startswith("event_date=") for d in os.listdir(out))
    # a date predicate prunes partitions at the scan
    one_date = got.select(F.min("event_date")).first()[0]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.where(F.col("event_date") == F.lit(one_date)).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_date" in plan


def test_streaming_sink_restart_is_idempotent(spark, sf_dir, tmp_path):
    """Restarting the checkpointed file-sink stream must process zero
    new data and leave the lake byte-identical — the exactly-once
    contract a production backfill relies on."""
    from ojo_daps_mirror_spark.streaming.stock import (
        stream_to_partitioned_parquet,
    )

    out = str(tmp_path / "lake")
    ck = str(tmp_path / "ck")
    first = stream_to_partitioned_parquet(spark, sf_dir, out, ck).count()
    second = stream_to_partitioned_parquet(spark, sf_dir, out, ck).count()
    assert first == second


def test_binary_file_source_reads_blobs(spark, tmp_path):
    """binaryFile source: one row per media file, whole-content binary
    column, glob filtering at listing time — the multimodal landing
    path (SURVEY §2 D8)."""
    import os

    from ojo_daps_mirror_spark.sources.sinks import read_binary_files

    blobs = {
        "a.img": b"\x89IMG" + bytes(range(64)),
        "b.img": b"\x89IMG" + bytes(reversed(range(64))),
        "c.txt": b"not media",
    }
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)

    df = read_binary_files(spark, str(tmp_path), glob="*.img")
    assert {f.name for f in df.schema.fields} == {
        "path",
        "modificationTime",
        "length",
        "content",
    }
    rows = {os.path.basename(r.path): bytes(r.content) for r in df.collect()}
    assert rows == {k: v for k, v in blobs.items() if k.endswith(".img")}

    # the blob feeds straight into the multimodal decode kernel's shape:
    # binary payload + typed metadata, Arrow-batched
    from ojo_daps_mirror_spark.operators.multimodal import decode_media

    docs = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content"),
    ).withColumn("text", F.lit("stub"))
    decoded = decode_media(docs)
    assert decoded.count() == 2


def test_text_source_round_trip(spark, sf_dir, tmp_path):
    """Line-per-doc text round-trip + wholetext (one row per file) —
    the raw corpus interchange formats (SURVEY §2 D9)."""
    from ojo_daps_mirror_spark.sources.sinks import read_text, write_text

    docs = load_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "corpus_txt")
    write_text(docs, path)
    back = read_text(spark, path)
    assert sorted(r.value for r in back.collect()) == sorted(
        r.text for r in docs.collect()
    )

    whole = read_text(spark, path, whole_file=True)
    # each parquet-partition-derived file is one row containing its lines
    n_lines = sum(len(r.value.rstrip("\n").split("\n")) for r in whole.collect())
    assert n_lines == 50


def test_compaction_and_zorder_layout(spark, sf_dir, tmp_path):
    """D11: small-file compaction with Z-order clustering. A fragmented
    write (many small files, insertion order) is compacted into few
    files sorted by the Morton key; per-file min/max ranges on BOTH
    dimensions must shrink — the row-group-pruning benefit the layout
    exists for."""
    import glob
    import os

    from ojo_daps_mirror_spark import plans

    plans.load_all()
    keyed = plans.QUERIES["zorder_key"](spark, sf_dir)

    frag = str(tmp_path / "fragmented")
    keyed.repartition(32).write.mode("overwrite").parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 32

    compact = str(tmp_path / "compacted")
    (
        keyed.repartitionByRange(4, "zvalue")
        .sortWithinPartitions("zvalue")
        .write.mode("overwrite")
        .parquet(compact)
    )
    files = glob.glob(f"{compact}/part-*.parquet")
    assert len(files) == 4

    back = spark.read.parquet(compact)
    assert back.count() == keyed.count()

    def mean_file_area(path):
        import pyarrow.parquet as pq

        areas = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=["x", "y"])
            xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
            if xs:
                areas.append(
                    (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
                )
        return sum(areas) / len(areas)

    # Z-ordered files must cover a materially smaller (x, y) rectangle
    # per file than insertion-ordered fragments
    assert mean_file_area(compact) < 0.5 * mean_file_area(frag)


def test_schema_evolution_merge(spark, sf_dir, tmp_path):
    """D12: parquet schema evolution. A v2 writer adds a column; a
    mergeSchema read unifies the layouts with NULLs for v1 rows — the
    lake contract that lets producers evolve without rewriting
    history."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(40)
    path = str(tmp_path / "evolving")
    v1 = docs.select("doc_id", "lang")
    v1.write.parquet(f"{path}/batch=1")
    v2 = docs.select("doc_id", "lang", F.length("text").alias("text_len"))
    v2.write.parquet(f"{path}/batch=2")

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert {f.name for f in merged.schema.fields} == {
        "doc_id",
        "lang",
        "text_len",
        "batch",
    }
    assert merged.count() == 80
    # v1 rows surface the evolved column as NULL, v2 rows carry values
    assert merged.where(F.col("batch") == 1).where(
        F.col("text_len").isNotNull()
    ).count() == 0
    assert merged.where(F.col("batch") == 2).where(
        F.col("text_len").isNull()
    ).count() == 0


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    # D13: a fact table partitioned by month joined to a FILTERED dim
    # must prune fact partitions at RUNTIME via the dim's build side —
    # Spark's dynamic partition pruning, the mechanism that makes
    # star-schema joins over a 100 TB date-partitioned lake read only
    # the qualifying months. The subquery-duplicate form
    # (dynamicpruningexpression) must appear in the fact scan.
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    path = str(tmp_path / "orders_by_month")
    orders.write.partitionBy("month").parquet(path)

    fact = spark.read.parquet(path)
    months = (
        orders.select("month").distinct().limit(2)
        .withColumn("keep", F.lit(1))
    )
    dim_path = str(tmp_path / "month_dim")
    months.write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("keep") == 1)

    joined = fact.join(dim, "month").groupBy("month").count()
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(True)
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[-2000:]
    # and the join itself broadcasts the tiny dim
    assert "BroadcastHashJoin" in plan


def test_scan_parallelism_tracks_max_partition_bytes(spark, sf_dir, tmp_path):
    # D15: the knob the SURVEY scale posture leans on — input split
    # count must scale with spark.sql.files.maxPartitionBytes so a
    # 100 TB scan can be sized to executor memory
    path = str(tmp_path / "wide")
    spark.range(0, 2_000_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(path)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1MB")
        many = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "512MB")
        few = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert few < many, (few, many)
    assert many >= 8  # ~tens of 1MB splits for a multi-MB file


def test_observation_metrics_piggyback_on_scan(spark, sf_dir):
    # D16: Dataset.observe attaches QC metrics to an existing action —
    # the pipeline-health pattern that avoids a second full scan for
    # row counts / null rates on a 100 TB write
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("qc")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("n_chars")).alias("total_chars"),
        F.count(F.when(F.col("lang").isNull(), 1)).alias("null_langs"),
    )
    # one action drives BOTH the business result and the metrics
    kept = observed.where(F.col("n_chars") > 100).count()
    got = obs.get
    want = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("t"),
    ).collect()[0]
    assert got["n_rows"] == want["n"]
    assert got["total_chars"] == want["t"]
    assert got["null_langs"] == 0
    assert kept <= got["n_rows"]

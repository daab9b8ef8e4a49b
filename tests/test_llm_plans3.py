"""Semantic tests for the C31–C35 corpus-prep operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from ojo_daps_mirror_spark import plans

plans.load_all()


def test_paragraph_dedup_first_occurrence_survives(spark, sf_dir):
    """Every distinct chunk hash survives exactly once corpus-wide, and
    the copy that survives is the earliest (doc_id, idx)."""
    out = plans.QUERIES["paragraph_dedup"](spark, sf_dir)
    rows = out.collect()
    assert rows
    # kept counts never exceed chunk counts, and at least one doc keeps all
    assert all(r.n_kept <= r.n_chunks for r in rows)
    # reassembled text token count == 16 * (n_kept - 1) .. 16 * n_kept
    for r in rows[:50]:
        n_tok = len(r.text_deduped.split())
        assert n_tok <= 16 * r.n_kept
        assert n_tok > 16 * (r.n_kept - 1) - 1


def test_paragraph_dedup_no_duplicate_chunks_remain(spark, sf_dir):
    # reassembly concatenates SURVIVING chunks, so re-chunking the
    # output only aligns to 16-token boundaries for docs that kept every
    # chunk — restrict the invariant to full-length (16-token) chunks of
    # docs that dropped nothing. Those must be globally unique.
    full = plans.QUERIES["paragraph_dedup"](spark, sf_dir).where(
        F.col("n_kept") == F.col("n_chunks")
    )
    toks = F.split("text_deduped", r"\s+")
    chunks = full.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.ceil(F.size(toks) / 16.0).cast("int")),
                lambda i: F.array_join(F.slice(toks, (i - 1) * 16 + 1, 16), " "),
            )
        ).alias("chunk")
    ).where(F.size(F.split("chunk", r"\s+")) == 16)
    dup = (
        chunks.groupBy("chunk").count().where(F.col("count") > 1).count()
    )
    assert dup == 0


def test_temperature_mixing_smallest_lang_kept_whole(spark, sf_dir):
    """The rarest language's rate is exactly 100 → every doc kept."""
    docs = plans.QUERIES["temperature_mixing"](spark, sf_dir)
    from ojo_daps_mirror_spark.sources import load_table

    full = load_table(spark, sf_dir, "documents")
    counts = {
        r.lang: r.n
        for r in full.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rarest = min(counts, key=lambda k: (counts[k], k))
    kept = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert kept[rarest] == counts[rarest]
    # and the largest language is genuinely downsampled
    biggest = max(counts, key=lambda k: (counts[k], k))
    if counts[biggest] > 2 * counts[rarest]:
        assert kept[biggest] < counts[biggest]


def test_sequence_packing_bins_are_contiguous_and_bounded(spark, sf_dir):
    out = plans.QUERIES["sequence_packing"](spark, sf_dir).collect()
    by_bucket: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    for rows in by_bucket.values():
        # seq ids never decrease in doc order, and each seq's token
        # total stays under cap + one doc's spill
        last = -1
        totals: dict[int, int] = {}
        for r in rows:
            assert r.seq_id >= last
            last = r.seq_id
            totals[r.seq_id] = totals.get(r.seq_id, 0) + r.n_tok
        max_tok = max(r.n_tok for r in rows)
        for t in totals.values():
            assert t <= 1024 + max_tok

"""Soundness of the ExactSubstr pair (C226 spans / C227 excision).

The DuckDB oracles pin cross-engine parity; these tests pin the
SEMANTICS: spans are in-bounds, sorted and disjoint; the excision
removes exactly the span mass C226 reports; and the cleaned text
equals a trusted driver-side excision of the original documents.
"""

from __future__ import annotations

from ojo_daps_mirror_spark import plans
from ojo_daps_mirror_spark.sources import load_table

plans.load_all()


def _parse(spans: str) -> list[tuple[int, int]]:
    if not spans:
        return []
    return [tuple(map(int, p.split("-"))) for p in spans.split(";")]


def test_spans_wellformed_and_excision_consistent(spark, sf_dir):
    spans = {
        r["doc_id"]: r
        for r in plans.QUERIES["dedup_substring_spans"](spark, sf_dir).collect()
    }
    clean = {
        r["doc_id"]: r
        for r in plans.QUERIES["dedup_substring_excise"](spark, sf_dir).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    assert set(spans) == set(clean) == set(texts)
    any_spans = False
    for d, r in spans.items():
        iv = _parse(r["spans"])
        assert len(iv) == r["dup_spans"]
        assert sum(e - s for s, e in iv) == r["dup_chars"]
        prev_e = 0
        for s, e in iv:
            assert 1 <= s < e <= r["n_chars"] + 1
            assert s > prev_e  # sorted and disjoint after merging
            prev_e = e
        # trusted excision: drop 1-based [s, e) ranges from the text
        t = texts[d]
        kept, cur = [], 1
        for s, e in iv:
            kept.append(t[cur - 1 : s - 1])
            cur = max(cur, e)
        kept.append(t[cur - 1 :])
        expect = "".join(kept)
        got = clean[d]
        assert got["clean_text"] == expect, d
        assert got["removed_chars"] == r["dup_chars"]
        assert got["clean_chars"] == len(expect)
        any_spans = any_spans or bool(iv)
    assert any_spans  # the corpus genuinely exercises the removal path

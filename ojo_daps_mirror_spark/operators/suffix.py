"""Shared suffix-sort stage for the ExactSubstr family.

Four queries (C207 suffix_lcp_boilerplate, C226 dedup_substring_spans,
C227 dedup_substring_excise, C228 token_yield_waterfall) are built on
the SAME expensive stage: explode every capped suffix of the corpus
(|corpus chars| rows × cap bytes) and sort it once so that each
suffix's longest match with ANY other suffix is readable from its two
sort-neighbours (the suffix-array adjacency trick of Lee et al. 2022,
'Deduplicating Training Data Makes Language Models Better').

Re-running that sort per query is the single biggest avoidable cost in
the family — the oracle side already factors it as shared CTEs, and
``adjacent_suffixes`` is the Spark twin: ONE range-partitioned external
sort (operators/rank.py attach_prev — pid-local lag windows plus a
one-row-per-shard boundary handoff, never a single-reducer window),
materialized ONCE per (application, sf_dir, cap, stride) so every
composing query in a session reads the finished stage instead of
re-sorting.

The stage is materialized to PARQUET, not executor cache, on purpose.
An early version used .persist(): correct, but in a long session the
storage pool fills with other operators' blocks and the LRU evicts the
suffix frame — measured in the 273-query bench, where the second
consumer silently re-paid the whole sort (5.8 s at sf0.1) that a fresh
session served from cache in 0.5 s. A written table cannot be evicted,
is exactly the artifact a 100 TB pipeline would keep in the lake next
to the corpus (the suffix-array build is the expensive step; its
output is reused by every downstream dedup/boilerplate pass), and at
local scale costs one ~seconds write. Set
``SPARK_GRAFT_SUFFIX_CACHE_DIR`` to place it (a lake path on a real
cluster; stages there are reused read-if-exists across sessions,
published via atomic rename, and left for the operator to GC);
default is a per-application directory under the system temp dir,
removed by ``clear_cache`` — registered via ``atexit`` so normal
process exit reaps it, with a mtime-TTL sweep of orphaned
``ojo_suffix_*`` dirs from crashed processes at first stage write.

**The scale knob — content-defined suffix sampling.** Exact mode
explodes EVERY position: the sort input is ~×cap the corpus bytes
(≈5 PB of shuffle at 100 TB), which is what ExactSubstr costs without
a compressed suffix-array build. For corpus scales where that is not
worth it, the stride departs from 1 — but only ever by OPT-IN. The
default (no env, no arg) is always the exact, oracle-parity stride 1:
exactness must never silently depend on input size crossing a
hardware-calibrated threshold. Set ``SPARK_GRAFT_SUFFIX_STRIDE=auto``
(the replica-scale stress harnesses — scripts/scale_stress.py,
scripts/recall_stress.py — setdefault this at entry; bench.py and the
oracle sweeps stay exact) to derive the stride from
estimated sort volume (``auto_stride``: corpus bytes × cap vs the
empirically calibrated exact-mode budget — the 64x stress showed
thrash is predictable from that estimate, so it is predicted instead
of hit; at every local SF the estimate fits and auto still resolves
to 1). To force a value, set
``SPARK_GRAFT_SUFFIX_STRIDE=s`` (or pass ``stride=s``):
only positions whose ``ANCHOR_W``-char content window hashes to
``0 mod s`` are exploded, cutting sort input ~s×. Anchors are
CONTENT-defined (the winnowing/CDC idea), so both copies of a
duplicated span sample the SAME in-span offsets and still collide in
the sort — naive every-s-th-position sampling would only catch pairs
whose alignments agree mod s. Detection stays sound (every reported
span is a real duplicate: sampled coverage is a subset of exact
coverage, per-position LCP is a lower bound) but becomes incomplete:
a duplicated run is found iff an anchor lands in it, so short spans
near the ``ESD_MIN`` threshold are missed with probability
~(1 - 1/s)^(L - ANCHOR_W). Recall floor is asserted in
tests/test_suffix_sampled.py. Oracle parity holds only at stride 1,
which is the unconditional default.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .rank import attach_prev_next

_CACHE: dict[tuple[str, str, int, int], DataFrame] = {}
_DIRS: set[str] = set()

# Stale per-app stage dirs from crashed/killed processes (clear_cache
# never ran) are reaped on this process's first stage write: anything
# matching ojo_suffix_* in the temp dir and untouched for this long is
# assumed orphaned. Live sessions touch their stage at write time AND
# on every in-process cache hit (os.utime in adjacent_suffixes), and
# the TTL is far past any plausible session length, so only genuinely
# dead apps' debris crosses the threshold — a concurrent long-lived
# session cannot have its live stage reaped out from under it.
_STALE_TTL_SECS = 48 * 3600
_swept = False


def _sweep_stale() -> None:
    """Remove ojo_suffix_* temp dirs whose owning app is long gone."""
    global _swept
    if _swept:
        return
    _swept = True
    root = tempfile.gettempdir()
    cutoff = time.time() - _STALE_TTL_SECS
    try:
        entries = os.listdir(root)
    except OSError:  # pragma: no cover - unreadable tempdir
        return
    for name in entries:
        if not name.startswith("ojo_suffix_"):
            continue
        path = os.path.join(root, name)
        if path in _DIRS or any(d.startswith(path) for d in _DIRS):
            continue
        try:
            # Liveness = the freshest mtime of the dir OR any direct
            # child: the in-process heartbeat utimes the stage subdir
            # (and, since r7, the parent too — belt), but a stage
            # written by older code only refreshes the child, and a
            # plain parent-mtime check would reap a live session's
            # stage out from under its persisted reader (suspenders).
            mtimes = [os.path.getmtime(path)]
            for child in os.listdir(path):
                try:
                    mtimes.append(
                        os.path.getmtime(os.path.join(path, child))
                    )
                except OSError:
                    pass
            if max(mtimes) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:  # pragma: no cover - raced with another reaper
            pass


# Stage format version: bumped whenever the materialized schema
# changes (v2 added the precomputed `lcp` column; v3 added `nlcp`,
# the sort-SUCCESSOR's lcp), so a shared-dir stage written by older
# code is never misread by newer consumers.
_STAGE_VERSION = 3


def _stage_path(app_id: str, sf_dir: str, cap: int, stride: int) -> str:
    base = os.environ.get("SPARK_GRAFT_SUFFIX_CACHE_DIR") or os.path.join(
        tempfile.gettempdir(), f"ojo_suffix_{app_id}"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(
        base, f"cap{cap}_s{stride}_v{_STAGE_VERSION}_{tag}"
    )

ANCHOR_W = 8  # content-anchor window (chars) for the sampled mode


# Exact-mode external-sort budget, empirically calibrated by the 64x
# stress record (SURVEY §6.4): the 16x replica corpus (~1.1 GB
# estimated sort input at cap 48) exact-sorts fine on this 128 GiB /
# 32-thread box, the 64x one (~4.6 GB) thrashes the external sort.
# 2 GB splits the measured wall; override with
# SPARK_GRAFT_SUFFIX_EXACT_BUDGET (bytes) for other hardware.
EXACT_SORT_BUDGET_BYTES = 2_000_000_000
# documents.parquet compresses the synthetic text ~2.5x; the estimate
# only needs to be monotone in corpus volume and right within ~2x,
# since stride rounds up to a power of two anyway.
_COMPRESSION_RATIO = 2.5


def _estimate_sort_bytes(sf_dir: str, cap: int) -> int:
    """Estimated exact-mode sort input: every text char explodes to a
    ~cap-byte suffix row, and corpus chars ≈ compressed parquet bytes
    × ratio. Pure file-metadata arithmetic — no Spark job. On a lake
    deployment the same estimate comes from table stats."""
    path = os.path.join(sf_dir, "documents.parquet")
    size = 0
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            size += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
    elif os.path.exists(path):
        size = os.path.getsize(path)
    return int(size * _COMPRESSION_RATIO) * cap


def auto_stride(sf_dir: str, cap: int) -> int:
    """Smallest power-of-two stride whose sampled sort input fits the
    exact-mode budget; 1 (exact, oracle-parity) whenever exact fits.
    The 64x stress showed exact-mode thrash is predictable from this
    volume estimate — so predict it instead of hitting it."""
    est = _estimate_sort_bytes(sf_dir, cap)
    budget = int(
        os.environ.get(
            "SPARK_GRAFT_SUFFIX_EXACT_BUDGET", EXACT_SORT_BUDGET_BYTES
        )
    )
    stride = 1
    while est > budget * stride:
        stride *= 2
    return stride


def resolved_stride(
    stride: int | None = None,
    sf_dir: str | None = None,
    cap: int | None = None,
) -> int:
    """Precedence: explicit ``stride`` arg > SPARK_GRAFT_SUFFIX_STRIDE
    env (a number, or the literal ``auto`` to derive the stride from
    estimated sort volume) > 1. Sampling is strictly OPT-IN: with no
    arg and no env the result is always the exact, oracle-parity
    stride 1 regardless of input size — correctness-gated entry points
    (the driver contract, the oracle sweeps) therefore stay exact by
    construction, and only harnesses that explicitly ask for ``auto``
    (bench/stress at replica scale) get the volume-derived stride,
    with the decision logged."""
    if stride is None:
        env = os.environ.get("SPARK_GRAFT_SUFFIX_STRIDE")
        if env is None:
            stride = 1
        elif env.strip().lower() == "auto":
            if sf_dir is None or cap is None:
                stride = 1
            else:
                stride = auto_stride(sf_dir, cap)
                if stride > 1:
                    import sys

                    print(
                        f"suffix: auto stride={stride} "
                        f"(est sort input {_estimate_sort_bytes(sf_dir, cap)/1e9:.1f} GB "
                        f"> exact budget; set SPARK_GRAFT_SUFFIX_STRIDE=1 to force exact)",
                        file=sys.stderr,
                    )
        else:
            stride = int(env)
    if stride < 1:
        raise ValueError(f"suffix stride must be >= 1, got {stride}")
    return stride


def adjacent_suffixes(
    spark: SparkSession, sf_dir: str, cap: int, stride: int | None = None
) -> DataFrame:
    """The sorted, lag-adjacent capped-suffix frame of the documents
    table: one row per character position with columns

      doc_id, n (doc length), p (1-based position),
      suf (the suffix capped at ``cap`` chars),
      pd / pp / pn / ps (the SORT-PREDECESSOR's doc_id / p / n / suf;
      NULL on the first row of the total (suf, doc_id, p) order),
      lcp (the exact-to-cap longest common prefix of suf and ps;
      NULL where ps is NULL),
      nlcp (the LCP of suf with its SORT-SUCCESSOR — i.e. the next
      row's lcp, readable in place; NULL on the last row).

    ``lcp`` is materialized IN the stage on purpose: it is a pure
    function of (suf, ps) and its ~cap substring comparisons per row
    were the dominant per-query expression cost when every consumer
    recomputed it — paid once at stage build, every consumer reads a
    bigint column instead. ``nlcp`` (v3) completes the pair: a
    position's longest match with ANY other suffix is
    max(lcp, nlcp) — LCP against its two sort neighbours — so the
    ExactSubstr consumers read it as a per-ROW expression instead of
    re-deriving it per query with a corpus-chars-grain union +
    (doc, p) shuffle (the dominant per-consumer cost this column
    removed; LCP is symmetric, so the successor's lcp is one more
    column of the same sorted window pass).

    Materialized once per (application, sf_dir, cap, stride) and shared
    by all ExactSubstr-family consumers in the session. ``stride`` > 1
    switches to content-anchored sampling (module docstring).
    """
    stride = resolved_stride(stride, sf_dir, cap)
    key = (spark.sparkContext.applicationId, sf_dir, cap, stride)
    hit = _CACHE.get(key)
    if hit is not None:
        # Heartbeat for the cross-process stale sweep: a long-lived
        # session keeps its stage fresh on every reuse, so another
        # process's _sweep_stale never mistakes a live stage for
        # crashed-app debris (persist eviction degrades to a read of
        # this path — it must still exist). The sweep reaps by the
        # TOP-LEVEL ojo_suffix_* dir, and touching a child does not
        # refresh the parent's mtime — so utime BOTH the stage subdir
        # (shared-dir layouts GC per-stage) and its parent (the
        # per-app tempdir layout the sweep targets).
        hb = _stage_path(key[0], sf_dir, cap, stride)
        for p in (hb, os.path.dirname(hb)):
            try:
                os.utime(p)
            except OSError:
                pass
        # An external spark.catalog.clearCache() (bench key isolation,
        # sweep harnesses) drops this handle's persist registration;
        # without re-asserting it, every later consumer pays one
        # parquet scan PER SUBTREE for the rest of the session. The
        # parquet floor stays the worst case; block memory stays the
        # designed fast path.
        sl = hit.storageLevel
        if not (sl.useMemory or sl.useDisk):
            hit.persist()
        return hit
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    positions = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n"),
        F.explode(F.expr("sequence(1, length(text))")).alias("p"),
        "text",
    )
    if stride > 1:
        # content-defined anchor: both copies of a duplicated span carry
        # identical windows, so they sample identical in-span offsets
        positions = positions.where(
            F.pmod(
                F.xxhash64(F.expr(f"substring(text, p, {ANCHOR_W})")),
                F.lit(stride),
            )
            == 0
        )
    sufs = positions.select(
        "doc_id",
        "n",
        F.col("p").cast("bigint").alias("p"),
        F.expr(f"substring(text, p, {cap})").alias("suf"),
    )
    ordered = (
        attach_prev_next(
            sufs,
            ["suf", "doc_id", "p"],
            {"pd": "doc_id", "pp": "p", "pn": "n", "ps": "suf"},
            {"ns": "suf"},
        )
        .withColumn(
            "lcp",
            F.when(F.col("ps").isNotNull(), adjacent_lcp(cap)),
        )
        .withColumn(
            # LCP is symmetric: LCP(suf, successor) == the successor
            # row's lcp. Computing it here (one extra expression in the
            # once-per-session stage build) is what lets every
            # ExactSubstr consumer read a position's best-match length
            # as greatest(lcp, nlcp) with zero shuffles.
            "nlcp",
            F.when(F.col("ns").isNotNull(), adjacent_lcp(cap, "suf", "ns")),
        )
        .drop("ns")
    )
    _sweep_stale()
    path = _stage_path(key[0], sf_dir, cap, stride)
    shared = bool(os.environ.get("SPARK_GRAFT_SUFFIX_CACHE_DIR"))
    if shared and os.path.exists(os.path.join(path, "_SUCCESS")):
        # Another session (or a prior run of this one) already built the
        # identical (sf_dir, cap, stride) stage on the shared dir:
        # read-if-exists instead of overwrite, so concurrent sessions
        # never delete files out from under each other's readers.
        pass
    elif shared:
        # A writer that crashed between its tmp write and the rename
        # leaves {path}.__tmp_{app} debris the per-process sweep never
        # covers (shared dirs are the operator's to GC) — reap any
        # tmp sibling older than the stale TTL before writing ours.
        parent = os.path.dirname(path)
        cutoff = time.time() - _STALE_TTL_SECS
        try:
            for name in os.listdir(parent):
                if "__tmp_" not in name:
                    continue
                sib = os.path.join(parent, name)
                try:
                    if os.path.getmtime(sib) < cutoff:
                        shutil.rmtree(sib, ignore_errors=True)
                except OSError:
                    pass
        except OSError:
            pass
        # Concurrency-safe publish: write under a per-app temp name,
        # then atomically rename into place; the rename loser discards
        # its copy and reads the winner's.
        tmp = f"{path}.__tmp_{key[0]}"
        ordered.write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        # Shared-dir stages are the operator's to garbage-collect
        # (lake-resident artifact) — never added to _DIRS.
    else:
        ordered.write.mode("overwrite").parquet(path)
        _DIRS.add(path)
    # Best of both tiers: the parquet file is the un-evictable floor
    # (a 273-query bench's shuffle traffic pushes the stage out of the
    # OS page cache, making every later consumer pay a real disk read),
    # and persist() serves repeat consumers from block memory while
    # it's available — eviction degrades to the parquet read, never to
    # a re-sort.
    stage = spark.read.parquet(path).persist()
    _CACHE[key] = stage
    return stage


def adjacent_lcp(cap: int, suf: str = "suf", prev: str = "ps") -> Column:
    """LCP of a suffix with its sort-predecessor, as a zero-explode
    array expression: prefix equality is monotone in L, so counting the
    L in 1..cap with equal prefixes IS the LCP. Exact up to ``cap``."""
    return F.expr(
        f"size(filter(sequence(1, {cap}),"
        f" L -> substring({suf}, 1, L) = substring({prev}, 1, L)))"
    ).cast("bigint")


def clear_cache(spark: SparkSession | None = None) -> None:
    """Drop the in-process handles and delete the materialized stage
    directories (all of them, or only the given session's). Only
    removes directories this process wrote — an operator-managed
    SPARK_GRAFT_SUFFIX_CACHE_DIR on shared storage is the operator's
    to garbage-collect."""
    app = spark.sparkContext.applicationId if spark is not None else None
    for key in list(_CACHE):
        if app is None or key[0] == app:
            try:
                _CACHE[key].unpersist()
            except Exception:  # pragma: no cover - session already gone
                pass
            del _CACHE[key]
    for path in list(_DIRS):
        if app is None or f"ojo_suffix_{app}" in path:
            shutil.rmtree(path, ignore_errors=True)
            _DIRS.discard(path)
            parent = os.path.dirname(path)
            if os.path.basename(parent).startswith("ojo_suffix_"):
                try:  # remove the per-app base dir once it empties
                    os.rmdir(parent)
                except OSError:
                    pass


# Normal process exit reaps this process's stage dirs even when no
# teardown fixture ran (bench.py, ad-hoc scripts, the driver harness).
atexit.register(clear_cache)

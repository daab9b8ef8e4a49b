"""Generic multi-part materialized stage cache for operator families.

Several query families share one expensive upstream chain that every
member key used to rebuild from scratch. operators/suffix.py pioneered
the fix for the ExactSubstr family: materialize the shared stage to
PARQUET once per (application, inputs, config) and let every consumer
read the finished artifact — parquet because executor-cache blocks get
LRU-evicted mid-session (measured; see suffix.py's module docstring),
and because a written table is exactly what a 100 TB pipeline keeps in
the lake next to the corpus.

This module generalises that pattern to stages with SEVERAL dependent
parts (e.g. the consensus-clustering family's edges → ensemble labels →
votes → level-1 components → level-2 components chain): each part is
written as its own parquet subdir, built from the READ-BACK frames of
the parts before it — so the parquet writes double as the lineage cuts
the iterative builders need, and any consumer can open any part without
re-running its ancestors.

Storage layouts and hardening follow suffix.py exactly:

- default per-app layout: ``<tmp>/ojo_stage_<appId>/<family>_v<V>_<tag>``,
  reaped by ``clear_cache``/atexit on normal exit and by a 48 h
  mtime-TTL sweep of orphaned ``ojo_stage_*`` dirs from crashed
  processes (liveness = freshest mtime of the dir OR any child, so the
  in-process heartbeat keeps a live long session's stage safe).
- shared-dir layout (``SPARK_GRAFT_STAGE_CACHE_DIR``, a lake path on a
  real cluster): stages are published via write-to-tmp + atomic rename,
  reused read-if-exists across sessions, crashed-writer ``__tmp_``
  debris reaped iff past the TTL; published stages are the operator's
  to GC (never auto-removed).
- cache hits heartbeat BOTH the stage dir and its parent, and re-assert
  ``persist()`` after an external ``spark.catalog.clearCache()`` (bench
  key isolation) so repeat consumers keep the block-memory fast path
  while the parquet floor stays un-evictable.

Builds are atomic in both layouts (tmp + rename): a crash mid-build
never leaves a half-written stage that a later run in the same
application would mistake for complete.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, dict[str, DataFrame]] = {}
_DIRS: set[str] = set()
_STALE_TTL_SECS = 48 * 3600
_swept = False

Builder = Callable[[dict[str, DataFrame]], DataFrame]


def input_fingerprint(path: str) -> str:
    """Cheap content fingerprint of an input parquet file/dir: total
    bytes + freshest mtime (seconds). Callers fold this into their
    stage ``key`` so overwriting the input within one application keys
    a fresh build instead of serving a stale stage. Pure file-metadata
    arithmetic — no Spark job; on a lake deployment the same role is
    played by a table snapshot/version id."""
    size = 0
    mtime = 0.0
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in files:
                p = os.path.join(root, f)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                size += st.st_size
                mtime = max(mtime, st.st_mtime)
    elif os.path.exists(path):
        st = os.stat(path)
        size, mtime = st.st_size, st.st_mtime
    return f"{size}_{int(mtime)}"


def _sweep_stale() -> None:
    """Remove ojo_stage_* temp dirs whose owning app is long gone.

    Same liveness rule as suffix._sweep_stale (ADVICE r6): a dir is
    live iff the freshest mtime of the dir or ANY direct child is
    within the TTL — the heartbeat utimes child stage dirs, and a
    parent-only check would reap a live >48 h session's stage.
    """
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
        if not name.startswith("ojo_stage_"):
            continue
        path = os.path.join(root, name)
        if path in _DIRS or any(d.startswith(path) for d in _DIRS):
            continue
        try:
            mtimes = [os.path.getmtime(path)]
            for child in os.listdir(path):
                try:
                    mtimes.append(os.path.getmtime(os.path.join(path, child)))
                except OSError:
                    pass
            if max(mtimes) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:  # pragma: no cover - raced with another reaper
            pass


def _stage_path(app_id: str, family: str, version: int, tag: str) -> str:
    base = os.environ.get("SPARK_GRAFT_STAGE_CACHE_DIR") or os.path.join(
        tempfile.gettempdir(), f"ojo_stage_{app_id}"
    )
    return os.path.join(base, f"{family}_v{version}_{tag}")


def materialized_stage(
    spark: SparkSession,
    family: str,
    version: int,
    key: str,
    builders: list[tuple[str, Builder]],
) -> dict[str, DataFrame]:
    """Build-once / read-everywhere multi-part parquet stage.

    ``builders`` is an ORDERED list of (part_name, fn); each fn
    receives the dict of already-materialized parts (as DataFrames
    read back from their parquet subdirs — real lineage cuts) and
    returns the next part's frame. Returns {part_name: DataFrame},
    every part persisted on top of its parquet floor.

    ``key`` is whatever identifies the inputs (e.g. the sf_dir);
    ``version`` must be bumped whenever a part's schema or the build
    recipe changes, so shared-dir stages written by older code are
    never misread.
    """
    app_id = spark.sparkContext.applicationId
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    cache_key = (app_id, family, version, tag)
    hit = _CACHE.get(cache_key)
    path = _stage_path(app_id, family, version, tag)
    if hit is not None:
        # Heartbeat for the cross-process stale sweep (stage dir AND
        # its parent — the sweep reaps at the parent level), plus the
        # post-clearCache persist re-assert (suffix.py's contract).
        for p in (path, os.path.dirname(path)):
            try:
                os.utime(p)
            except OSError:
                pass
        for df in hit.values():
            sl = df.storageLevel
            if not (sl.useMemory or sl.useDisk):
                df.persist()
        return hit

    _sweep_stale()
    shared = bool(os.environ.get("SPARK_GRAFT_STAGE_CACHE_DIR"))
    # Read-if-exists in BOTH layouts: the _STAGE_OK marker only ever
    # appears via the atomic rename below, so its presence means a
    # complete build (per-app dirs are appId-namespaced; shared dirs
    # are published once and reused across sessions).
    if not os.path.exists(os.path.join(path, "_STAGE_OK")):
        # Reap crashed-writer debris older than the TTL (shared dirs
        # are ours to GC; per-app dirs get the same treatment so a
        # crashed earlier run of THIS layout never accretes).
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
        # Atomic publish in BOTH layouts: build every part under a
        # per-app tmp name, stamp the completeness marker, then rename
        # into place. The rename loser discards its copy and reads the
        # winner's; a crash mid-build leaves only reapable __tmp_.
        tmp = f"{path}.__tmp_{app_id}"
        shutil.rmtree(tmp, ignore_errors=True)
        built: dict[str, DataFrame] = {}
        for name, fn in builders:
            part_tmp = os.path.join(tmp, name)
            fn(built).write.mode("overwrite").parquet(part_tmp)
            built[name] = spark.read.parquet(part_tmp)
        with open(os.path.join(tmp, "_STAGE_OK"), "w") as fh:
            fh.write("ok\n")
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
        if not shared:
            _DIRS.add(os.path.dirname(path))
    out = {
        name: spark.read.parquet(os.path.join(path, name)).persist()
        for name, _ in builders
    }
    _CACHE[cache_key] = out
    return out


def clear_cache(spark: SparkSession | None = None) -> None:
    """Unpersist and remove this process's per-app stage dirs (atexit;
    shared-dir stages are deliberately left for the operator to GC)."""
    for parts in list(_CACHE.values()):
        for df in parts.values():
            try:
                df.unpersist()
            except Exception:  # pragma: no cover - session already gone
                pass
    _CACHE.clear()
    for d in list(_DIRS):
        shutil.rmtree(d, ignore_errors=True)
        _DIRS.discard(d)


atexit.register(clear_cache)

"""Bounded-lifetime cache registry.

Library operators persist intermediates that feed multiple subtrees
(shingle inverted indexes, LSH candidate sets, …). Those frames are
lazy — the operator can't unpersist them before the caller's action
runs, and leaving them cached leaks executor block storage across a
long session (the driver runs 55 queries in one SparkSession).

Pattern: operators persist through :func:`persist_tracked`; the query
entry points call :func:`release_caches` BEFORE building a new query,
at which point every prior query's actions have completed. Releasing
is always correctness-safe — an unpersisted frame simply recomputes —
so an early release can only cost recompute time, never wrong results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["persist_tracked", "track", "release_caches", "tracked_count"]

_REGISTRY: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for the next release sweep."""
    out = df.persist()
    _REGISTRY.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for the next release sweep."""
    _REGISTRY.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = len(_REGISTRY)
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free  # noqa: BLE001
            pass
    return n


def tracked_count() -> int:
    return len(_REGISTRY)

"""Bounded registry for operator-internal ``persist()`` frames.

Several operators persist an intermediate frame that feeds two or more
branches of their output plan (curation ledgers, incremental-dedup hash
and shingle tables). The returned frame stays lazy, so the operator
cannot know when it is safe to unpersist — but never unpersisting leaks
executor storage in a long-lived session, and unpersisting a PREVIOUS
call's frame from a later call silently forces recomputes and is not
concurrency-safe.

The contract here (same as curation's original ledger registry, now
shared): every operator-internal persist is registered under its
OPERATOR FAMILY; a new registration evicts (unpersists) all but the
most recent ``_KEEP_PER_FAMILY`` frames of that family only, so storage
is hard-capped no matter how many calls a service loop makes, while one
family's churn can never evict another family's in-flight frames (the
round-4 gap: a global bound let a few concurrent pipelines silently
evict each other). Within one call, ``register(*frames)`` never evicts
its OWN arguments — the floor is ``max(keep, len(frames))``. An evicted
frame's downstream results stay CORRECT — the plan simply recomputes on
next use — so the bound trades old-frame reuse speed for a memory cap.
Evictions are COUNTED per family (:func:`eviction_counts`) so the perf
cliff is observable instead of silent; callers that materialized their
results can reclaim everything at once via :func:`release_all`.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_CACHES: dict[str, list[DataFrame]] = {}
_EVICTIONS: dict[str, int] = {}
_KEEP_PER_FAMILY = 4
_LOCK = threading.Lock()


def register(*frames: DataFrame, family: str = "default") -> None:
    """Register operator-internal persisted frames under ``family``;
    evict that family's oldest beyond the keep bound (unpersist is safe
    — see module doc). Frames passed in ONE call are never evicted by
    that same call."""
    with _LOCK:
        lst = _CACHES.setdefault(family, [])
        lst.extend(frames)
        floor = max(_KEEP_PER_FAMILY, len(frames))
        while len(lst) > floor:
            lst.pop(0).unpersist()
            _EVICTIONS[family] = _EVICTIONS.get(family, 0) + 1


def eviction_counts() -> dict[str, int]:
    """Per-family eviction counters — a nonzero, growing count under a
    steady workload means the keep bound is forcing recomputes (raise
    ``_KEEP_PER_FAMILY`` or materialize + ``release_all`` sooner)."""
    with _LOCK:
        return dict(_EVICTIONS)


def registered_count() -> int:
    """Total frames currently held (all families) — test/monitor hook."""
    with _LOCK:
        return sum(len(v) for v in _CACHES.values())


def release_all() -> None:
    """Unpersist every registered frame. Call after returned frames have
    been materialized; later use still yields correct results."""
    with _LOCK:
        for lst in _CACHES.values():
            while lst:
                lst.pop().unpersist()

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

# family -> [(plan_key, frame), ...] — plan keys are computed ONCE at
# registration and stored alongside the frame (ADVICE r07): the eviction
# liveness check then compares stored keys instead of re-invoking a py4j
# semanticHash round-trip per frame per victim, and a transient
# semanticHash failure can no longer flip a frame's identity between
# registration and eviction (the id(df) fallback previously could skip
# dedupe or unpersist a still-shared plan).
_CACHES: dict[str, list[tuple[object, DataFrame]]] = {}
_EVICTIONS: dict[str, int] = {}
_KEEP_PER_FAMILY = 4
_LOCK = threading.Lock()


def _plan_key(df: DataFrame):
    """Semantic identity of the frame's analyzed plan — Spark's
    CacheManager keys cache entries by PLAN, not by DataFrame object, so
    two frames with the same analyzed plan share ONE cache entry."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:  # noqa: BLE001 — fall back to object identity
        return id(df)


def register(*frames: DataFrame, family: str = "default") -> None:
    """Register operator-internal persisted frames under ``family``;
    evict that family's oldest beyond the keep bound (unpersist is safe
    — see module doc). Frames passed in ONE call are never evicted by
    that same call.

    Plan-identity safety (round-7 fix): Spark caches by ANALYZED PLAN,
    so re-registering a frame with the same plan (the common case: the
    same operator called twice on the same input) must not grow the
    list — and, critically, evicting an OLD same-plan frame would
    uncache the NEW frame's entry too (this silently stripped the
    persist from q155/q161 mid-test-suite). Registration therefore
    dedupes by semantic hash (refreshing recency), and eviction skips
    the unpersist when any still-registered frame shares the evictee's
    plan."""
    incoming = {}
    for f in frames:
        incoming[_plan_key(f)] = f  # last wins within the call
    with _LOCK:
        lst = _CACHES.setdefault(family, [])
        # same-plan re-registration: refresh position, don't duplicate
        lst[:] = [(k, f) for (k, f) in lst if k not in incoming]
        lst.extend(incoming.items())
        floor = max(_KEEP_PER_FAMILY, len(incoming))
        while len(lst) > floor:
            vkey, victim = lst.pop(0)
            live = any(
                k == vkey
                for fam in _CACHES.values()
                for (k, _f) in fam
            )
            if not live:
                victim.unpersist()
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
                lst.pop()[1].unpersist()

"""Bounded registry for operator-internal ``persist()`` frames.

Several operators persist an intermediate frame that feeds two or more
branches of their output plan (curation ledgers, incremental-dedup hash
and shingle tables). The returned frame stays lazy, so the operator
cannot know when it is safe to unpersist — but never unpersisting leaks
executor storage in a long-lived session, and unpersisting a PREVIOUS
call's frame from a later call silently forces recomputes and is not
concurrency-safe.

The contract here (same as curation's original ledger registry, now
shared): every operator-internal persist is registered; a new
registration evicts (unpersists) all but the most recent ``_KEEP``
frames, so storage is hard-capped no matter how many calls a service
loop makes; callers that materialized their results can reclaim
everything at once via :func:`release_all`. An evicted frame's
downstream results stay CORRECT — the plan simply recomputes on next
use — so the bound trades old-frame reuse speed for a memory cap.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_CACHES: list[DataFrame] = []
_KEEP = 8
_LOCK = threading.Lock()


def register(*frames: DataFrame) -> None:
    """Register operator-internal persisted frames; evict the oldest
    beyond the ``_KEEP`` bound (unpersist is safe — see module doc)."""
    with _LOCK:
        _CACHES.extend(frames)
        while len(_CACHES) > _KEEP:
            _CACHES.pop(0).unpersist()


def release_all() -> None:
    """Unpersist every registered frame. Call after returned frames have
    been materialized; later use still yields correct results."""
    with _LOCK:
        while _CACHES:
            _CACHES.pop().unpersist()

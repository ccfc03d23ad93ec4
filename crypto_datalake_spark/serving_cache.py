"""Serving-layer result cache: TTL'd LRU with superset/partial reuse (O4).

Reference (/root/reference/src/live_data_api_service/service.py:348-550,
1902-1959): timeframe results are cached with a two-tier TTL (stable
windows 21,600 s, recent windows 15 s), bounded LRU, and three hit kinds —
exact, superset (``tail(limit)`` of a larger cached frame — same end with
more rows, OR a newer end whose gap-free rows cover the older requested
sub-window, service.py:358-474), and partial (reuse the cached tail,
fetch only the missing newer head, concat-dedup). In-flight identical
requests are deduplicated (single-flight).

Window clips are INCLUSIVE (``row time <= end``), matching the compute
path's ``ts <= end_time`` — a hit returns exactly what a recompute at
that end would, and the default watermark-resolved request (whose newest
bar is stamped AT the end) stays cacheable. Each entry tracks the
gap-free ``segments`` its merged rows certify, so sub-window serves
never assemble a tail across the hole left by merging disjoint windows.

This is a SERVING concern, deliberately outside the Spark plan: entries
hold small materialized bar lists (≤ max_limit rows), never DataFrames —
caching a lazy plan would pin the session and recompute anyway. The Spark
engine below it stays stateless; at 100 TB the cache's job is to keep the
hot API windows off the cluster entirely.

``clock`` is injected for deterministic tests.
"""

from __future__ import annotations

import threading
import time as _time
from collections import OrderedDict
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

STABLE_TTL_S = 21_600.0  # windows ending well in the past (service.py:195)
RECENT_TTL_S = 15.0      # windows near now (service.py:196)
STABLE_AGE_S = 3_600.0   # end_time older than this → stable tier
LEASE_GRACE_S = 600.0    # handed-out-but-never-acquired locks reap after
# per-entry merged-row bound: a hot key polled at ever-advancing end
# times gains ~1 bar per put forever under keep-last merging — trim to
# the newest rows (always safe: old rows only enable sub-window serves,
# and a clipped window short of `limit` just recomputes)
MAX_ROWS_PER_ENTRY = 8_192


class _KeyLock:
    """``threading.Lock`` plus a lease count of hand-outs not yet
    acquired.  Closes the reap TOCTOU: ``single_flight`` returns the
    lock under ``_global`` but the caller acquires it only after
    releasing ``_global`` — in that window the lock is unlocked, and a
    concurrent ``put`` that reaped it on ``locked()`` alone would hand
    the NEXT requester a fresh lock, running two fetches for one key
    (the exact dedup break single-flight exists to prevent).  A lock is
    reapable only when it is unlocked AND has no outstanding lease (or
    the lease is older than ``LEASE_GRACE_S`` — a caller that took a
    hand-out and never acquired has abandoned it).

    Lease accounting (``pending``/``leased_at``) is guarded by its own
    ``_meta`` lock: an unsynchronized decrement racing the increment can
    lose an update in EITHER direction, and an under-count would re-open
    the premature-reap window this class exists to close.  Lock order is
    strictly ``_global → _meta`` / ``_inner → _meta``, never the
    reverse, so no deadlock.  ``release`` refreshes ``leased_at``: a
    waiter blocked in ``acquire`` behind a fetch slower than the grace
    age must not look abandoned in the hand-over window between the
    holder's release and the waiter's acquire completing."""

    __slots__ = ("_inner", "_meta", "_clock", "pending", "leased_at")

    def __init__(self, clock: Callable[[], float] = _time.time) -> None:
        self._inner = threading.Lock()
        self._meta = threading.Lock()
        self._clock = clock
        self.pending = 0
        self.leased_at = 0.0

    def lease(self) -> None:
        with self._meta:
            self.pending += 1
            self.leased_at = self._clock()

    def acquire(self) -> bool:
        # Deliberately no blocking/timeout parameters: a FAILED try-
        # acquire would return without consuming the lease, leaving the
        # lock unreapable for LEASE_GRACE_S per failed attempt (and
        # repeated try-acquirers would accumulate pending counts only
        # the grace timestamp clears).  Single-flight semantics want
        # every hand-out to block until it holds the lock anyway.
        self._inner.acquire()
        with self._meta:
            if self.pending > 0:
                self.pending -= 1  # hand-out consumed; locked() guards
        return True

    def release(self) -> None:
        with self._meta:
            # restart the abandonment clock for any waiter about to win
            # the hand-over; leases never acquired keep their original
            # stamp (no release ever runs for them) and still expire
            self.leased_at = self._clock()
        self._inner.release()

    def locked(self) -> bool:
        return self._inner.locked()

    def reapable(self, now: float) -> bool:
        if self._inner.locked():
            return False
        with self._meta:
            return self.pending == 0 or now - self.leased_at > LEASE_GRACE_S

    def __enter__(self) -> bool:
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


@dataclass
class _Entry:
    end_time: float          # epoch seconds of the window end
    rows: list               # bars ascending by time; row[0] = bar epoch secs
    cached_at: float
    # sorted disjoint [start, end] intervals over which the rows are
    # guaranteed gap-free (every put's rows cover EVERY bar of a window
    # ending at its end_time).  Merges of DISJOINT windows keep all the
    # rows for equal-end reuse, but a sub-window serve must stay inside
    # one segment — a tail assembled across the hole between two
    # segments is not what a fresh compute at that end would return.
    segments: list = field(default_factory=list)
    # end-sensitivity of the rows, recorded by the caller at put time: a
    # bar qualifies for a SUB-window serve only when bar_time + lag <=
    # the requested end.  0 for point bars and materialized-bucket
    # reads; (tf_minutes-1)*60 for complete-only aggregated buckets
    # (a bucket complete at the cached end may not be complete — and
    # would not exist in a fresh compute — at an older end); None
    # disables sub-window serves (gridless calendar buckets).  Merges
    # keep the most conservative value seen.
    bar_close_lag: float | None = 0.0
    hits: int = 0


@dataclass
class CacheStats:
    exact: int = 0
    superset: int = 0
    partial: int = 0
    miss: int = 0


class ServingCache:
    """Keyed (symbol, timeframe) bar-window cache with reuse tiers."""

    def __init__(
        self,
        max_entries: int = 256,
        # epoch clock, NOT monotonic: _ttl compares the clock against
        # entry.end_time, which is epoch seconds (domain time) — a
        # monotonic clock (process uptime) would make every window's age
        # hugely negative, so nothing ever reached the stable tier and
        # day-old windows re-hit the cluster every RECENT_TTL seconds
        clock: Callable[[], float] = _time.time,
        stable_ttl_s: float = STABLE_TTL_S,
        recent_ttl_s: float = RECENT_TTL_S,
        stable_age_s: float = STABLE_AGE_S,
    ) -> None:
        self._entries: OrderedDict[tuple, _Entry] = OrderedDict()
        self._locks: dict[tuple, _KeyLock] = {}
        self._global = threading.Lock()
        self._clock = clock
        self._max = max_entries
        self._stable_ttl = stable_ttl_s
        self._recent_ttl = recent_ttl_s
        self._stable_age = stable_age_s
        self.stats = CacheStats()

    def _ttl(self, entry: _Entry, now: float) -> float:
        age = now - entry.end_time
        return self._stable_ttl if age >= self._stable_age else self._recent_ttl

    def _fresh(self, entry: _Entry, now: float) -> bool:
        return (now - entry.cached_at) <= self._ttl(entry, now)

    def get(
        self,
        key: tuple,
        end_time: float,
        limit: int,
        *,
        anchor_span: float | None = None,
    ) -> tuple[str, list | None]:
        """Return (hit_kind, rows or None). Kinds: exact | superset |
        partial | miss. ``partial`` returns the reusable cached tail —
        the caller fetches only the missing newer head and calls ``put``.

        SUB-window serves (cached end newer than requested) honor the
        compute path's end-dependent semantics; equal-end hits are
        exempt (the cached rows came from a compute at exactly that
        end).  The entry's own ``bar_close_lag`` (recorded at put time,
        see ``_Entry``) filters bars not yet closed at the requested
        end; ``anchor_span`` additionally requires the served tail to
        start inside ``(end_time - anchor_span, end_time]`` — the
        direct-HTF coverage probe's anchored-window condition, since a
        tail reaching further back means a fresh compute would have
        REJECTED the direct read and fallen back to 1m aggregation.
        """
        with self._global:
            entry = self._entries.get(key)
            if entry is None or not self._fresh(entry, self._clock()):
                self.stats.miss += 1
                return ("miss", None)
            self._entries.move_to_end(key)
            entry.hits += 1
            # the window clip is INCLUSIVE (r[0] <= end) to match
            # serve_timeframe's ``ts <= end_time`` exactly — a hit must
            # return precisely what a recompute at this end would; a
            # strict clip would drop a bar stamped AT the end (the
            # default watermark-resolved path always ends on the last
            # committed bar) and turn every repeat request into a
            # permanent miss.
            if entry.end_time == end_time:
                # same containing-segment rule as the sub-window serve
                # below: a merged entry can hold rows BELOW a hole
                # (an older disjoint put), and a tail assembled across
                # that hole is not what a recompute at this end would
                # return.  end_time is the max of put ends, so it is
                # always inside the newest segment — single-segment
                # entries (every non-merged put) are unaffected.
                seg = next(
                    (
                        (s, e)
                        for s, e in entry.segments
                        if s <= end_time <= e
                    ),
                    None,
                )
                if seg is None:  # defensive: no segment claims this end
                    self.stats.miss += 1
                    return ("miss", None)
                window = [
                    r for r in entry.rows if seg[0] <= r[0] <= end_time
                ]
                if len(window) == limit:
                    self.stats.exact += 1
                    return ("exact", window)
                if len(window) > limit:  # superset: tail(limit)
                    self.stats.superset += 1
                    return ("superset", window[-limit:])
                self.stats.miss += 1
                return ("miss", None)
            if entry.end_time > end_time:
                # sub-window reuse (the reference's superset serve,
                # service.py:358-474): a cached window ending at a NEWER
                # instant already holds every bar of the older window —
                # but only inside the gap-free segment CONTAINING the
                # requested end; a tail assembled across a merge hole,
                # or anchored in a segment that stops short of the end,
                # is not what a fresh compute at that end would return.
                seg = next(
                    (
                        (s, e)
                        for s, e in entry.segments
                        if s <= end_time <= e
                    ),
                    None,
                )
                if seg is not None and entry.bar_close_lag is not None:
                    cutoff = end_time - entry.bar_close_lag
                    window = [
                        r for r in entry.rows if seg[0] <= r[0] <= cutoff
                    ]
                    if len(window) >= limit and (
                        anchor_span is None
                        or window[-limit][0] > end_time - anchor_span
                    ):
                        self.stats.superset += 1
                        return ("superset", window[-limit:])
                self.stats.miss += 1
                return ("miss", None)
            # partial: cached window is a reusable older tail
            self.stats.partial += 1
            return ("partial", list(entry.rows))

    def put(
        self,
        key: tuple,
        end_time: float,
        rows: Sequence,
        *,
        bar_close_lag: float | None = 0.0,
    ) -> None:
        """Insert/extend; merging dedups on bar time keep-last (J9).
        ``bar_close_lag`` records the rows' end-sensitivity for
        sub-window serves (see ``_Entry``); merges keep the most
        conservative value (``None`` dominates)."""
        with self._global:
            now = self._clock()
            old = self._entries.pop(key, None)
            old_live = old is not None and self._fresh(old, now)
            merged: dict = {}
            if old_live:
                for r in old.rows:
                    merged[r[0]] = r
            for r in rows:
                merged[r[0]] = r  # new rows win
            out = [merged[k] for k in sorted(merged)]
            # the entry's end_time may only extend past the caller's when
            # the old rows actually survived the merge: keeping a STALE
            # entry's later end_time while dropping its rows would let a
            # later get() serve an "exact" window whose data ends hours
            # before the end_time it claims
            new_end = (
                max(end_time, old.end_time) if old_live else end_time
            )
            # gap-free segments: a put's rows cover EVERY bar in
            # [min(rows), end_time], so that interval joins the union;
            # two segments merge iff they overlap or touch (we cannot
            # verify bar-grid adjacency across a strict gap here).
            # Keeping DISJOINT segments — rather than only the newest —
            # is what lets an older window computed after a newer one
            # still be cached and served under its own end_time.
            segs = list(old.segments) if old_live else []
            if rows:
                segs.append((min(r[0] for r in rows), end_time))
            segs.sort()
            merged_segs: list = []
            for s, e in segs:
                if merged_segs and s <= merged_segs[-1][1]:
                    merged_segs[-1] = (
                        merged_segs[-1][0],
                        max(merged_segs[-1][1], e),
                    )
                else:
                    merged_segs.append((s, e))
            if old_live:
                if old.bar_close_lag is None or bar_close_lag is None:
                    bar_close_lag = None
                else:
                    bar_close_lag = max(old.bar_close_lag, bar_close_lag)
            if len(out) > MAX_ROWS_PER_ENTRY:
                out = out[-MAX_ROWS_PER_ENTRY:]
                cutoff = out[0][0]
                # segments wholly below the cutoff are gone; a segment
                # straddling it keeps only its surviving upper part
                merged_segs = [
                    (max(s, cutoff), e)
                    for s, e in merged_segs
                    if e >= cutoff
                ]
            self._entries[key] = _Entry(
                end_time=new_end,
                rows=out,
                cached_at=now,
                segments=merged_segs,
                bar_close_lag=bar_close_lag,
            )
            while len(self._entries) > self._max:  # LRU evict
                evicted, _ = self._entries.popitem(last=False)
                # reap the single-flight lock with its entry, but NEVER
                # one that is held OR freshly handed out and not yet
                # acquired (reapable() checks both): popping a lock some
                # fetch is inside — or about to enter — would hand the
                # next requester a fresh lock and silently break
                # in-flight dedup under exactly the churn it exists for
                lk = self._locks.get(evicted)
                if lk is not None and lk.reapable(now):
                    del self._locks[evicted]
            if len(self._locks) > 2 * self._max:
                # keys whose fetch raised before ever put() have no entry
                # to be evicted with — sweep their idle locks here so an
                # open request keyspace cannot grow _locks forever
                for k in [
                    k
                    for k, lk in self._locks.items()
                    if k not in self._entries and lk.reapable(now)
                ]:
                    del self._locks[k]

    def single_flight(self, key: tuple) -> _KeyLock:
        """Per-key lock: concurrent identical requests collapse to one
        compute (service.py:476-550 in-flight dedup).  The hand-out is
        LEASED (pending count + timestamp) until the caller acquires, so
        a concurrent ``put``'s reap cannot delete it in the window
        between return and acquire — see ``_KeyLock``."""
        with self._global:
            lk = self._locks.get(key)
            if lk is None:
                lk = self._locks[key] = _KeyLock(self._clock)
            lk.lease()
            return lk

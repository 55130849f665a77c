"""GTID-set algebra + per-partition offset maps for multi-stream sources.

The engine's scalar ``committed_max_offset`` is exactly right for one totally
ordered WAL, but a multi-stream source (MySQL multi-source replication, a
Kafka-partitioned changelog, N sharded binlogs) needs set-valued positions:

  * ``GtidSet`` — the reference's GTID-set algebra
    (debezium-connector-mysql/.../GtidSet.java:36,48 parse, 69 retainAll,
    106 isContainedWithin, 127 with, 141 getGtidSetBeginning, 151 contains,
    162 subtract; UUIDSet :204-359, Interval :361-433): per-source-UUID sets
    of inclusive transaction-id intervals, with containment / overlay /
    subtraction used for resume-position comparison ("is my restart point
    already covered by the server's executed set?") and new-event filtering.
  * ``PartitionedOffsets`` — the per-partition offset-map analogue of Kafka
    source offsets: one monotone high-water mark per partition, merged by
    elementwise max; containment means "every partition of mine is at or
    behind yours" — the multi-stream generalization of the lake manifest's
    single committed offset.

Both are driver-side position bookkeeping (pure Python, no Spark jobs): at
10^10 events the cost of offset algebra is one dict walk per batch, never a
row-path operation.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Callable, Iterable


# ------------------------------------------------------------------ intervals
@dataclass(frozen=True, order=True)
class Interval:
    """Inclusive transaction-id interval (GtidSet.Interval:361-433)."""

    start: int
    end: int

    def contains(self, txid: int) -> bool:
        return self.start <= txid <= self.end

    def is_contained_within(self, other: "Interval") -> bool:
        return other.start <= self.start and self.end <= other.end


def _merge(intervals: Iterable[Interval]) -> tuple[Interval, ...]:
    """Canonicalize: sort and merge overlapping/adjacent intervals (the
    normalized form MySQL prints, so equality is semantic not textual)."""
    out: list[Interval] = []
    for iv in sorted(intervals):
        if iv.start > iv.end:
            raise ValueError(f"invalid interval {iv.start}-{iv.end}")
        if out and iv.start <= out[-1].end + 1:
            out[-1] = Interval(out[-1].start, max(out[-1].end, iv.end))
        else:
            out.append(iv)
    return tuple(out)


def _subtract_intervals(
    mine: tuple[Interval, ...], theirs: tuple[Interval, ...]
) -> tuple[Interval, ...]:
    out: list[Interval] = []
    for iv in mine:
        pieces = [iv]
        for o in theirs:
            nxt: list[Interval] = []
            for p in pieces:
                if o.end < p.start or o.start > p.end:
                    nxt.append(p)
                    continue
                if p.start < o.start:
                    nxt.append(Interval(p.start, o.start - 1))
                if o.end < p.end:
                    nxt.append(Interval(o.end + 1, p.end))
            pieces = nxt
        out.extend(pieces)
    return _merge(out)


# ------------------------------------------------------------------- UUIDSet
@dataclass(frozen=True)
class UUIDSet:
    """All intervals of one source server (GtidSet.UUIDSet:204-359)."""

    uuid: str
    intervals: tuple[Interval, ...]

    @classmethod
    def parse(cls, text: str) -> "UUIDSet":
        """``uuid:1-5:7-9:12`` (a bare id is the point interval id-id)."""
        parts = text.strip().split(":")
        if len(parts) < 2:
            raise ValueError(f"not a UUIDSet: {text!r}")
        ivs = []
        for p in parts[1:]:
            m = re.fullmatch(r"(\d+)(?:-(\d+))?", p.strip())
            if not m:
                raise ValueError(f"bad interval {p!r} in {text!r}")
            lo = int(m.group(1))
            hi = int(m.group(2)) if m.group(2) else lo
            ivs.append(Interval(lo, hi))
        return cls(parts[0].strip().lower(), _merge(ivs))

    def contains(self, txid: int) -> bool:
        return any(iv.contains(txid) for iv in self.intervals)  # :302-310

    def is_contained_within(self, other: "UUIDSet | None") -> bool:
        """:269-300 — every interval covered by some interval of other."""
        if other is None or self.uuid != other.uuid:
            return False
        return all(
            any(iv.is_contained_within(o) for o in other.intervals)
            for iv in self.intervals
        )

    def as_interval_beginning(self) -> "UUIDSet":
        """:238-246 — collapse to the first transaction (snapshot-position
        comparison uses only the beginning)."""
        first = self.intervals[0].start
        return UUIDSet(self.uuid, (Interval(first, first),))

    def subtract(self, other: "UUIDSet | None") -> "UUIDSet":
        """:346-358 — the intervals of mine not covered by other."""
        if other is None or other.uuid != self.uuid:
            return self
        return UUIDSet(self.uuid, _subtract_intervals(self.intervals, other.intervals))

    def __str__(self) -> str:
        ivs = ":".join(
            f"{iv.start}-{iv.end}" if iv.start != iv.end else str(iv.start)
            for iv in self.intervals
        )
        return f"{self.uuid}:{ivs}"


# -------------------------------------------------------------------- GtidSet
class GtidSet:
    """Set of per-server GTID ranges with the reference's algebra
    (GtidSet.java:36). Immutable; all operations return new sets."""

    def __init__(self, gtids: "str | dict[str, UUIDSet] | None" = None) -> None:
        sets: dict[str, UUIDSet] = {}
        if isinstance(gtids, dict):
            sets = dict(gtids)
        elif gtids:
            text = gtids.replace("\n", "").replace("\r", "")
            for chunk in text.split(","):
                if not chunk.strip():
                    continue
                us = UUIDSet.parse(chunk)
                if us.uuid in sets:  # same server twice -> union the intervals
                    us = UUIDSet(
                        us.uuid, _merge(sets[us.uuid].intervals + us.intervals)
                    )
                sets[us.uuid] = us
        # TreeMap semantics: sorted by server uuid (:38)
        self._sets: dict[str, UUIDSet] = dict(sorted(sets.items()))

    # ----------------------------------------------------------------- access
    def uuid_sets(self) -> list[UUIDSet]:
        return list(self._sets.values())  # :85-92

    def for_server(self, uuid: str) -> UUIDSet | None:
        return self._sets.get(uuid.lower())  # :95-104

    def is_empty(self) -> bool:
        return not self._sets

    # ---------------------------------------------------------------- algebra
    def retain_all(self, source_filter: Callable[[str], bool] | None) -> "GtidSet":
        """:69-83 — keep only servers matching the filter (gtid.source.includes)."""
        if source_filter is None:
            return self
        return GtidSet({u: s for u, s in self._sets.items() if source_filter(u)})

    def is_contained_within(self, other: "GtidSet | None") -> bool:
        """:106-124 — resume check: every one of my ranges covered by other."""
        if other is None:
            return False
        return all(
            s.is_contained_within(other.for_server(u)) for u, s in self._sets.items()
        )

    def with_(self, other: "GtidSet | None") -> "GtidSet":
        """:127-138 — overlay: other's servers REPLACE mine (not interval
        union; the newer position per server wins wholesale)."""
        if other is None or other.is_empty():
            return self
        return GtidSet({**self._sets, **other._sets})

    def beginning(self) -> "GtidSet":
        """:141-149 — every server collapsed to its first transaction."""
        return GtidSet({u: s.as_interval_beginning() for u, s in self._sets.items()})

    def contains(self, gtid: str) -> bool:
        """:151-160 — membership of one ``uuid:txid``."""
        uuid, _, tx = gtid.partition(":")
        us = self.for_server(uuid)
        return us is not None and us.contains(int(tx))

    def subtract(self, other: "GtidSet | None") -> "GtidSet":
        """:162-173 — the GTIDs of mine not in other (the events a restarted
        connector still has to read)."""
        if other is None:
            return self
        out: dict[str, UUIDSet] = {}
        for u, s in self._sets.items():
            if s.is_contained_within(other.for_server(u)):
                continue
            rem = s.subtract(other.for_server(u))
            if rem.intervals:
                out[u] = rem
        return GtidSet(out)

    def add(self, gtid: str) -> "GtidSet":
        """Track one observed GTID (the binlog-client add analogue used by the
        read-only watermark path): returns a set with ``uuid:txid`` merged in,
        coalescing adjacent intervals."""
        uuid, _, tx = gtid.partition(":")
        uuid = uuid.lower()
        txid = int(tx)
        cur = self._sets.get(uuid)
        ivs = (cur.intervals if cur else ()) + (Interval(txid, txid),)
        return GtidSet({**self._sets, uuid: UUIDSet(uuid, _merge(ivs))})

    # -------------------------------------------------------------- identity
    def __eq__(self, other: object) -> bool:
        return isinstance(other, GtidSet) and str(self) == str(other)  # :180-190

    def __hash__(self) -> int:
        return hash(str(self))

    def __str__(self) -> str:
        return ",".join(str(s) for s in self._sets.values())  # :192-201


# --------------------------------------------------------- partitioned offsets
class PartitionedOffsets:
    """Per-partition monotone offset map — the multi-stream generalization of
    the lake's scalar committed offset (Kafka-source offset-map shape; the
    same containment/merge algebra as GtidSet specialized to one growing
    interval ``[0, hi]`` per partition)."""

    def __init__(self, offsets: dict[str, int] | None = None) -> None:
        self._off = {str(k): int(v) for k, v in (offsets or {}).items()}

    def get(self, partition: str) -> int:
        return self._off.get(str(partition), -1)

    def advance(self, partition: str, offset: int) -> "PartitionedOffsets":
        """Monotone: regressions are ignored (a replayed batch can't move a
        partition backwards)."""
        cur = self.get(partition)
        if offset <= cur:
            return self
        return PartitionedOffsets({**self._off, str(partition): int(offset)})

    def merge(self, other: "PartitionedOffsets") -> "PartitionedOffsets":
        out = dict(self._off)
        for p, o in other._off.items():
            out[p] = max(out.get(p, -1), o)
        return PartitionedOffsets(out)

    def is_contained_within(self, other: "PartitionedOffsets") -> bool:
        return all(other.get(p) >= o for p, o in self._off.items())

    def to_json(self) -> str:
        return json.dumps(dict(sorted(self._off.items())))

    @classmethod
    def from_json(cls, text: str) -> "PartitionedOffsets":
        return cls(json.loads(text) if text else {})

    def __eq__(self, other: object) -> bool:
        return isinstance(other, PartitionedOffsets) and self._off == other._off

    def __repr__(self) -> str:
        return f"PartitionedOffsets({self._off})"

"""GTID-set algebra parity (GtidSet.java:36-201, UUIDSet :204-359,
Interval :361-433) + per-partition offset maps. Pure driver-side position
bookkeeping — no SparkSession needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_spark.sources.gtids import (
    GtidSet,
    Interval,
    PartitionedOffsets,
    UUIDSet,
)

A = "036d85a9-64e5-11e6-9b48-42010af0000c"
B = "7c1de3f2-3fd2-11e6-9cdc-42010af000bc"


def test_parse_normalize_and_str():
    g = GtidSet(f"{B}:1-3,{A}:1-2:4-5:3")  # adjacent/out-of-order intervals
    # canonical: merged intervals, servers sorted by uuid (TreeMap, :38)
    assert str(g) == f"{A}:1-5,{B}:1-3"
    # a bare transaction id is the point interval id-id
    assert str(UUIDSet.parse(f"{A}:7")) == f"{A}:7"
    # same server listed twice -> union
    assert str(GtidSet(f"{A}:1-2,{A}:5-6")) == f"{A}:1-2:5-6"


def test_contains_and_for_server():
    g = GtidSet(f"{A}:1-5:8-10")
    assert g.contains(f"{A}:3") and g.contains(f"{A}:8")
    assert not g.contains(f"{A}:6") and not g.contains(f"{B}:1")
    assert g.for_server(A.upper()) is not None  # uuids are case-insensitive
    assert g.for_server(B) is None


def test_is_contained_within():
    """:106-124 — the resume check: restart position ⊆ server executed set."""
    small = GtidSet(f"{A}:2-4")
    big = GtidSet(f"{A}:1-10,{B}:1-3")
    assert small.is_contained_within(big)
    assert not big.is_contained_within(small)
    assert big.is_contained_within(big)  # equal sets contain each other
    assert not small.is_contained_within(None)
    # an interval straddling a gap is NOT contained (:269-300 per-interval cover)
    assert not GtidSet(f"{A}:4-6").is_contained_within(GtidSet(f"{A}:1-5:7-9"))


def test_with_overlays_whole_servers():
    """:127-138 — with() REPLACES per-server ranges, it does not union them."""
    base = GtidSet(f"{A}:1-10,{B}:1-4")
    newer = GtidSet(f"{B}:1-7")
    assert str(base.with_(newer)) == f"{A}:1-10,{B}:1-7"
    assert str(base.with_(GtidSet(""))) == str(base)  # empty overlay = no-op


def test_beginning_and_retain_all():
    g = GtidSet(f"{A}:5-10:12-14,{B}:3-9")
    assert str(g.beginning()) == f"{A}:5,{B}:3"  # :141-149
    only_a = g.retain_all(lambda u: u == A)  # :69-83 (gtid.source.includes)
    assert str(only_a) == f"{A}:5-10:12-14"
    assert g.retain_all(None) is g


def test_subtract():
    """:162-173 — what a restarted connector still has to read."""
    server = GtidSet(f"{A}:1-10,{B}:1-5")
    mine = GtidSet(f"{A}:1-4:7-8,{B}:1-5")
    remaining = server.subtract(mine)
    assert str(remaining) == f"{A}:5-6:9-10"
    assert server.subtract(None) is server
    assert server.subtract(server).is_empty()


def test_add_tracks_observed_gtids():
    g = GtidSet("")
    for tx in (1, 2, 5, 3):
        g = g.add(f"{A}:{tx}")
    assert str(g) == f"{A}:1-3:5"  # adjacent txids coalesce


@settings(max_examples=200, deadline=None)
@given(
    mine=st.lists(st.integers(1, 60), max_size=12),
    theirs=st.lists(st.integers(1, 60), max_size=12),
)
def test_subtract_contains_properties(mine, theirs):
    """Membership model-check vs plain sets: subtract/contains/containment
    agree with Python set algebra on individual transaction ids."""
    gm = GtidSet("")
    for t in mine:
        gm = gm.add(f"{A}:{t}")
    gt = GtidSet("")
    for t in theirs:
        gt = gt.add(f"{A}:{t}")
    diff = gm.subtract(gt)
    expected = set(mine) - set(theirs)
    for t in range(1, 61):
        assert diff.contains(f"{A}:{t}") == (t in expected)
    assert gm.is_contained_within(gt) == set(mine).issubset(set(theirs))


def test_partitioned_offsets():
    a = PartitionedOffsets({"p0": 10, "p1": 5})
    # monotone advance: regressions ignored
    assert a.advance("p0", 7).get("p0") == 10
    b = a.advance("p1", 9).advance("p2", 3)
    assert (b.get("p0"), b.get("p1"), b.get("p2")) == (10, 9, 3)
    # merge = elementwise max
    m = a.merge(PartitionedOffsets({"p0": 2, "p2": 8}))
    assert (m.get("p0"), m.get("p1"), m.get("p2")) == (10, 5, 8)
    # containment: every partition at-or-behind
    assert a.is_contained_within(b) and not b.is_contained_within(a)
    # unknown partitions start at -1 (nothing committed)
    assert a.get("p9") == -1
    # JSON round-trip is stable and sorted
    assert PartitionedOffsets.from_json(b.to_json()) == b

"""High-example-count Hypothesis laws for the PURE engine components
(no SparkSession — hundreds of examples run in milliseconds).

The Spark-backed property tests (test_properties.py) keep few,
adversarial examples because each costs a Spark job; the boundary
logic they depend on — index stab/range semantics, the rollover
boundary, the wire codec — is pure Python and gets the reference's
QuickCheck-scale example counts here (FuzzyTests.hs:150-243 runs 100
cases/law).
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from rados_timestore_spark.codec import decode_blob, encode_points
from rados_timestore_spark.index import Index

# ---------------------------------------------------------- index laws

_entries = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(1, 256)),
    min_size=1, max_size=8,
    unique_by=lambda e: e[0],
).map(lambda es: tuple(sorted(es)))

_t = st.integers(-100, 11_000)


@settings(max_examples=400, deadline=None)
@given(entries=_entries, t=_t)
def test_stab_matches_model(entries, t):
    # Greatest epoch <= t, leftmost for t before all (Index.hs:71-88).
    idx = Index(entries)
    covering = [e for e in entries if e[0] <= t]
    assert idx.stab(t) == (max(covering) if covering else entries[0])


@settings(max_examples=400, deadline=None)
@given(entries=_entries, t0=_t, t1=_t)
def test_range_lookup_complete_and_minimal(entries, t0, t1):
    start, end = min(t0, t1), max(t0, t1)
    idx = Index(entries)
    got = idx.range_lookup(start, end)
    # Complete: the stab of EVERY time in [start, end] is present
    # (sample the interesting times: interval ends + each epoch cut).
    for t in {start, end, *[e for e, _ in entries if start <= e <= end]}:
        assert idx.stab(t) in got, f"stab({t}) missing from range"
    # Minimal + ordered: ascending unique epochs, none past `end`
    # (except the stab fallback entry that covers `start`).
    epochs = [e for e, _ in got]
    assert epochs == sorted(set(epochs))
    assert all(e <= end or (e, _b) == idx.stab(start)
               for e, _b in got)


@settings(max_examples=400, deadline=None)
@given(entries=_entries, w=st.integers(0, 10_000), buckets=st.integers(1, 256))
def test_rollover_boundary_keeps_watermark_time_readable(entries, w, buckets):
    # Regression law for the rollover cut (ADVICE r1, Index.hs:80-88):
    # points at time == watermark live in the OLD epoch; cutting the
    # new epoch at w+1 must keep them visible to reads starting at w.
    if w + 1 <= max(e for e, _ in entries):
        return  # new epoch must be strictly later than all entries
    idx = Index(entries)
    old_epoch = idx.stab(w)
    rolled = Index(entries + ((w + 1, buckets),))
    assert rolled.stab(w) == old_epoch
    assert old_epoch in rolled.range_lookup(w, w)
    assert old_epoch in rolled.range_lookup(w, 1 << 62)


# ---------------------------------------------------------- codec laws

_addr = st.integers(0, (1 << 64) - 1)
_time = st.integers(0, (1 << 64) - 1)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


_simple = st.tuples(
    _addr.map(lambda a: a & ~1), _time, st.integers(0, (1 << 64) - 1)
).map(lambda p: (p[0], p[1], p[2], None))
_extended = st.tuples(
    _addr.map(lambda a: a | 1), _time, st.binary(min_size=0, max_size=64)
).map(lambda p: (p[0], p[1], None, p[2]))
_points = st.lists(st.one_of(_simple, _extended), max_size=32)


@settings(max_examples=400, deadline=None)
@given(points=_points, seq_start=st.integers(0, 1 << 40))
def test_codec_roundtrip_law(points, seq_start):
    # FuzzyTests.hs:150-199: every written point comes back, in blob
    # order, with Word64 fields reinterpreted as i64 bit patterns.
    blob = encode_points(points)
    got = decode_blob(blob, seq_start=seq_start)
    assert len(got) == len(points)
    for i, ((a, t, v, p), (ga, gt, gv, gp, gs)) in enumerate(
        zip(points, got)
    ):
        assert ga == _signed(a)
        assert gt == _signed(t)
        if a & 1:
            assert gv is None and bytes(gp) == p
        else:
            assert gp is None and gv == _signed(v)
        assert gs == seq_start + i


@settings(max_examples=200, deadline=None)
@given(points=_points.filter(lambda ps: ps), cut=st.integers(1, 23))
def test_codec_torn_header_raises(points, cut):
    # A parse error poisons the whole blob (Algorithms.hs:111-127):
    # cutting mid-header must raise, never silently drop bytes.
    blob = encode_points(points)
    torn = blob[: len(blob) - min(cut, len(blob) - 1)]
    try:
        decoded = decode_blob(torn)
    except ValueError:
        return
    # Truncation that lands exactly on a record boundary is a legal
    # shorter blob; anything else must have raised.
    assert encode_points(
        [(a, t, v, p) for a, t, v, p, _ in decoded]
    ) == torn

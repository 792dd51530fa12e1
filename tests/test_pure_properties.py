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


# ------------------------------------------------------ store-model laws
#
# The reference's FuzzyTests run their round-trip/LWW/watermark laws at
# QuickCheck scale (hundreds of cases).  The Spark suite
# (test_properties.py) keeps those laws at ~5 adversarial examples each
# because every example costs Spark jobs; here the SAME laws run
# against the pure store model (tests/store_model.py) at 200-500
# examples — and test_properties.test_spark_matches_model pins the
# model to the real engine.

from tests.store_model import NamespaceNotRegistered, PureKV, PureStore

_m_addr = st.sampled_from(
    [0, 1, 2, 3, 4, 7, 14, 1 << 40, (1 << 62), -2, -1, -(1 << 62)]
)
_m_time = st.integers(0, 60)


@st.composite
def _m_point(draw):
    a = draw(_m_addr)
    t = draw(_m_time)
    if a & 1:
        return (a, t, None, draw(st.binary(min_size=0, max_size=6)))
    return (a, t, draw(st.integers(0, 1 << 32)), None)


_m_chunks = st.lists(
    st.lists(_m_point(), min_size=1, max_size=10), min_size=1, max_size=5
)


def _write_all(chunks):
    s = PureStore()
    s.register_namespace("NS")
    for c in chunks:
        s.write_points("NS", c)
    return s


def _flatten(chunks):
    return [p for c in chunks for p in c]


_ALL = sorted({a for a in
               [0, 1, 2, 3, 4, 7, 14, 1 << 40, (1 << 62), -2, -1,
                -(1 << 62)]})
_LO, _HI = 0, 1 << 62


@settings(max_examples=400, deadline=None)
@given(chunks=_m_chunks, split=st.integers(1, 7))
def test_model_roundtrip_chunking_invariant(chunks, split):
    # FuzzyTests.hs:150-199: the read is a pure function of the point
    # SEQUENCE — how writes were chunked must not matter.  Re-chunk the
    # same flat sequence differently and compare full reads.
    flat = _flatten(chunks)
    rechunked = [flat[i:i + split] for i in range(0, len(flat), split)]
    a = _write_all(chunks)
    b = _write_all(rechunked)
    assert a.read_simple("NS", _LO, _HI, _ALL) \
        == b.read_simple("NS", _LO, _HI, _ALL)
    assert a.read_extended("NS", _LO, _HI, _ALL) \
        == b.read_extended("NS", _LO, _HI, _ALL)
    assert a.latest("NS") == b.latest("NS")


@settings(max_examples=400, deadline=None)
@given(chunks=_m_chunks)
def test_model_first_wins_spec(chunks):
    # Independent spec: scanning the flat sequence, the FIRST
    # occurrence of each (address, time) wins for reads.
    s = _write_all(chunks)
    seen_v, seen_p = {}, {}
    for a, t, v, p in _flatten(chunks):
        d = seen_p if a & 1 else seen_v
        d.setdefault((a, t), p if a & 1 else v)
    assert {(a, t): v for a, t, v, _s in
            s.read_simple("NS", _LO, _HI, _ALL)} == seen_v
    assert {(a, t): p for a, t, p, _s in
            s.read_extended("NS", _LO, _HI, _ALL)} == seen_p


@settings(max_examples=400, deadline=None)
@given(chunks=_m_chunks, t0=st.integers(-5, 70), t1=st.integers(-5, 70))
def test_model_interval_read_is_filtered_full_read(chunks, t0, t1):
    # Closed-interval law (Q4 processSimple): a ranged read equals the
    # full read filtered to start <= t <= end.
    start, end = min(t0, t1), max(t0, t1)
    s = _write_all(chunks)
    assert s.read_simple("NS", start, end, _ALL) == [
        r for r in s.read_simple("NS", _LO, _HI, _ALL)
        if start <= r[1] <= end
    ]
    assert s.read_extended("NS", start, end, _ALL) == [
        r for r in s.read_extended("NS", _LO, _HI, _ALL)
        if start <= r[1] <= end
    ]


@settings(max_examples=300, deadline=None)
@given(chunks=_m_chunks, req=st.lists(_m_addr, max_size=4))
def test_model_request_scoping(chunks, req):
    # Empty request => empty; otherwise only requested addresses come
    # back, with read_simple dropping odd requests and read_extended
    # forcing bit 0 on (Mutable.hs:95 / TimeStore.hs:161-177).
    s = _write_all(chunks)
    assert s.read_simple("NS", _LO, _HI, []) == []
    assert s.read_extended("NS", _LO, _HI, []) == []
    got_s = s.read_simple("NS", _LO, _HI, req)
    assert {r[0] for r in got_s} <= {a for a in req if (a & 1) == 0}
    got_e = s.read_extended("NS", _LO, _HI, req)
    assert {r[0] for r in got_e} <= {a | 1 for a in req}


@settings(max_examples=300, deadline=None)
@given(chunks=_m_chunks, replay=st.integers(0, 4))
def test_model_replay_idempotent(chunks, replay):
    # Re-delivering any already-written chunk changes nothing
    # (first-wins dedup absorbs replays — the streaming_dedup_replay
    # contract at the store level).
    s = _write_all(chunks)
    want_s = s.read_simple("NS", _LO, _HI, _ALL)
    want_e = s.read_extended("NS", _LO, _HI, _ALL)
    s.write_points("NS", chunks[replay % len(chunks)])
    assert [r[:3] for r in s.read_simple("NS", _LO, _HI, _ALL)] \
        == [r[:3] for r in want_s]
    assert [r[:3] for r in s.read_extended("NS", _LO, _HI, _ALL)] \
        == [r[:3] for r in want_e]


@settings(max_examples=400, deadline=None)
@given(chunks=_m_chunks)
def test_model_watermark_law(chunks):
    # latest(ns) == per-kind max time written so far, at EVERY prefix
    # (monotonicity included — StoreHelpers.hs:241-259).
    s = PureStore()
    s.register_namespace("NS")
    ms = me = None
    for c in chunks:
        s.write_points("NS", c)
        for a, t, _v, _p in c:
            if a & 1:
                me = t if me is None else max(me, t)
            else:
                ms = t if ms is None else max(ms, t)
        assert s.latest("NS") == (ms, me)


@settings(max_examples=400, deadline=None)
@given(chunks=_m_chunks)
def test_model_latest_per_key_law(chunks):
    # latestUniques (Algorithms.hs:250-262): per address the (time
    # DESC, seq ASC) winner — i.e. among rows at the max time, the
    # first written.
    s = _write_all(chunks)
    flat = _flatten(chunks)
    got = s.latest_per_key("NS")
    for a in {p[0] for p in flat}:
        rows = [(t, i, v, p) for i, (aa, t, v, p) in enumerate(flat)
                if aa == a]
        t_max = max(t for t, _i, _v, _p in rows)
        _t, _i, v, p = min((r for r in rows if r[0] == t_max),
                           key=lambda r: r[1])
        assert got[a][0] == t_max and got[a][1] == v and got[a][2] == p


@settings(max_examples=300, deadline=None)
@given(ops=st.lists(
    st.tuples(st.sampled_from([4, 6, 20, 21]),
              st.binary(min_size=0, max_size=6)),
    min_size=1, max_size=12,
))
def test_model_kv_lww_law(ops):
    # Mutable LWW (FuzzyTests.hs:122-147): lookup returns the last
    # insert per key; enumerate is exactly the last value per key.
    s = PureStore()
    kv = PureKV(s, "NS")
    expected = {}
    for key, value in ops:
        kv.insert(key, value)
        expected[key | 1] = value
    for key, value in expected.items():
        assert kv.lookup(key) == value
    assert kv.enumerate() == expected


@settings(max_examples=300, deadline=None)
@given(ops=st.lists(
    st.tuples(st.sampled_from([4, 20]), st.binary(min_size=1, max_size=4)),
    min_size=1, max_size=10,
))
def test_model_kv_insert_with_fold_law(ops):
    # insertWith merge == left fold of merge(new, acc) over the insert
    # sequence per key (Mutable.hs:83-103 / merge_with's contract).
    def merge(new, old):
        return old + new

    s = PureStore()
    kv = PureKV(s, "NS")
    acc: dict[int, bytes] = {}
    for key, value in ops:
        got = kv.insert_with(merge, key, value)
        acc[key] = value if key not in acc else merge(value, acc[key])
        assert got == acc[key]
    for key, value in acc.items():
        assert kv.lookup(key) == value


def test_model_unregistered_namespace_raises():
    s = PureStore()
    try:
        s.write_points("nope", [(2, 1, 7, None)])
    except NamespaceNotRegistered:
        pass
    else:
        raise AssertionError("expected NamespaceNotRegistered")


# ------------------------------------------------- maintain_plan laws
# The shared growth-decision rule behind VectorIndex.maintain /
# HNSWIndex.maintain (r14) — pure, so it gets QuickCheck-scale
# example counts here; the Spark-backed tests pin one healing run
# per index.

from rados_timestore_spark.fsutil import maintain_plan  # noqa: E402


@settings(max_examples=500, deadline=None)
@given(n=st.integers(0, 10**7), parts=st.integers(1, 4096),
       bound=st.integers(1, 10**6), skewed=st.booleans(),
       refit=st.booleans())
def test_maintain_plan_laws(n, parts, bound, skewed, refit):
    out = maintain_plan(n, parts, bound, skewed, refit)
    mean_over = n > parts * bound
    if n <= 0 or not (mean_over or skewed):
        # healthy (or empty) index: the caller guarantees a strict
        # no-op, so the plan must be None
        assert out is None
        return
    if mean_over:
        # a mean violation is ALWAYS healable: the plan acts and
        # restores mean density to within the bound in one step
        assert out is not None and out >= 1
        assert n <= out * bound
        if refit:
            assert out <= n      # cannot train more centroids than rows
        else:
            assert out > parts   # a same-count hash relayout is identity
        # convergence: once healed, a skew-free re-plan is satisfied
        assert maintain_plan(n, out, bound, False, refit) is None
        return
    # skew-only: the count doubles (clamped at n) to split the dense
    # partition, or reports healthy once growth is exhausted — never
    # prescribes a provably-identical relayout
    if out is None:
        assert min(max(parts * 2, 1), n) <= parts   # growth exhausted
        return
    assert parts < out <= max(n, 1)
    # strictly-growing and bounded by n: repeated skew-only planning
    # TERMINATES (each step grows, n caps the count)
    steps = 0
    cur = out
    while cur is not None and steps < 64:
        cur = maintain_plan(n, cur, bound, True, refit)
        if cur is not None:
            steps += 1
    assert cur is None or steps < 64

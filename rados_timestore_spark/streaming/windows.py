"""Streaming windowed aggregation + custom stateful operators.

Includes :func:`stream_asof_join` — stream-stream backward as-of join
maintained with per-key state (see its docstring for the delivery
contract).

The reference's streaming surface is ordered chunk delivery +
watermarks (SURVEY.md §2.3); Spark adds real windowed semantics on
top.  These helpers wire them timestore-style:

* :func:`stream_rollup` — tumbling event-time windows with a
  late-data watermark: the streaming version of the hourly rollup
  (queries_timeseries.ts_rollup_hourly).  Late rows inside the
  watermark update their window; rows later than the watermark are
  dropped by Spark — the bounded-state trade the reference never has
  to make because it re-sorts on read (dedup-on-read handles ALL
  lateness in the batch path; use the watermark only when state must
  stay bounded).
* :func:`stream_latest_per_key` — custom stateful operator via
  ``applyInPandasWithState``: the Mutable-KV latest-per-key view
  maintained incrementally (per-key state = (time, seq, value)),
  emitting changed keys each micro-batch.  State is partitioned by
  key across executors — the 100 TB shape for continuously-maintained
  aggregates.
"""

from __future__ import annotations

import bisect
from functools import partial

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)


def stream_rollup(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Tumbling event-time rollup over a streaming points DataFrame.

    ``time_col`` is the engine's µs-long event time; it's lifted to a
    TIMESTAMP for Spark's window machinery.  Returns the streaming
    aggregate (caller attaches the sink): per (window, address) count
    and value sum, state bounded by the watermark.
    """
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window), F.col("address"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.max(time_col).alias("max_time"),
        )
    )


def stream_dedup(
    points: DataFrame,
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("address", "time"),
    time_col: str = "time",
) -> DataFrame:
    """Bounded-state streaming dedup on the point identity (address,
    time) — the streaming face of the engine's dedup-on-read rule
    (core.first_wins_dedup) for the replay case: a re-delivered
    micro-batch's duplicates are dropped as long as they arrive within
    the watermark, so state stays bounded while exactly-once ingest
    survives source replays.  (Batch reads still dedup on read; this
    operator is for pipelines that must emit downstream exactly once.)

    Uses ``dropDuplicatesWithinWatermark`` so two duplicates only need
    to arrive within ``watermark`` of each other — state per key is
    evicted after that horizon, the 100 TB-friendly contract (a plain
    streaming ``dropDuplicates`` would keep every key forever).
    """
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_us: int,
    upper_us: int,
    watermark: str = "30 minutes",
    time_col: str = "time",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Stream-stream inner join on ``key`` equality + an event-time
    interval: right rows within ``[left.time + lower_us, left.time +
    upper_us]`` of each left row.  Both sides are watermarked so Spark
    can bound join state (rows outside the interval + watermark are
    evicted) — the streaming analog of the batch bucketed range join
    (queries_timeseries.ts_range_join), e.g. "events in the 5 minutes
    leading up to each error".

    Columns are suffixed to keep both sides addressable; the joined
    event-time columns come back as ``event_ts{suffix}``.
    """
    ls, rs = suffixes

    def prep(df: DataFrame, s: str) -> DataFrame:
        out = df.withColumn(
            f"event_ts{s}", F.timestamp_micros(F.col(time_col))
        ).withWatermark(f"event_ts{s}", watermark)
        for c in df.columns:
            if c != key:
                out = out.withColumnRenamed(c, f"{c}{s}")
        return out

    lf, rf = prep(left, ls), prep(right, rs)
    cond = (
        (lf[key] == rf[key])
        & (
            F.col(f"event_ts{rs}")
            >= F.col(f"event_ts{ls}") + F.expr(f"INTERVAL {lower_us} MICROSECOND")
        )
        & (
            F.col(f"event_ts{rs}")
            <= F.col(f"event_ts{ls}") + F.expr(f"INTERVAL {upper_us} MICROSECOND")
        )
    )
    return lf.join(rf, cond, "inner").drop(rf[key])


_LATEST_OUT = StructType([
    StructField("address", LongType()),
    StructField("time", LongType()),
    StructField("value", LongType()),
    StructField("seq", LongType()),
])
_LATEST_STATE = StructType([
    StructField("time", LongType()),
    StructField("value", LongType()),
    StructField("seq", LongType()),
])


def _latest_update(key, pdfs, state: GroupState):
    """Per-key reducer: keep the (time DESC, seq ASC) winner — the
    latestUniques rule (Algorithms.hs:250-262) — across micro-batches."""
    if state.exists:
        best_t, best_v, best_s = state.get
    else:
        best_t, best_v, best_s = None, None, None
    for pdf in pdfs:
        for t, v, s in zip(pdf["time"], pdf["value"], pdf["seq"]):
            t, s = int(t), int(s)
            v = None if pd.isna(v) else int(v)
            if (
                best_t is None
                or t > best_t
                or (t == best_t and s < best_s)
            ):
                best_t, best_v, best_s = t, v, s
    state.update((best_t, best_v, best_s))
    yield pd.DataFrame(
        {
            "address": [key[0]],
            "time": [best_t],
            "value": [best_v],
            "seq": [best_s],
        }
    )


_ASOF_OUT = StructType([
    StructField("purchase_id", LongType()),
    StructField("user_id", LongType()),
    StructField("purchase_t", LongType()),
    StructField("view_id", LongType()),
    StructField("view_t", LongType()),
])
#: Per-key as-of state: the right-side (view) buffer and the buffer of
#: still-unmatched left rows (purchases), each as parallel (time, id)
#: arrays sorted by (time, id), plus the key's event-time frontier.
#: Both buffers are pruned relative to the frontier, so state stays
#: bounded (≤ 2 x horizon of event time).
_ASOF_STATE = StructType([
    StructField("vt", ArrayType(LongType())),
    StructField("vid", ArrayType(LongType())),
    StructField("pt", ArrayType(LongType())),
    StructField("pid", ArrayType(LongType())),
    StructField("frontier", LongType()),
])


def _asof_update(key, pdfs, state: GroupState, horizon_us: int):
    """Per-key backward as-of matcher.

    Rows arrive tagged (0 = right/view, 1 = left/purchase) and are
    processed in (t, tag, event_id) order, so a view at time t is
    visible to a purchase at the same t (>= semantics) and equal-time
    views resolve to the largest event_id — the same tie rule as the
    batch ts_asof_join / the DuckDB oracle.

    Cross-batch lateness (both directions):

    * the VIEW buffer persists in state, so a purchase arriving in a
      later micro-batch than its view still matches (right-early);
    * UNMATCHED purchases persist in state too and are re-injected
      into every subsequent batch's merge, so a view arriving in a
      later micro-batch than the purchase still produces the match
      (right-late) — the r3 version silently dropped these.

    A matched purchase emits exactly once and is final (append sinks
    cannot retract); an even-later view that would have been a better
    match for an already-emitted purchase is ignored.  Unmatched
    purchases are retained until the key's event-time frontier passes
    ``purchase.t + horizon_us`` — an implicit watermark delay of one
    horizon — and the view buffer is pruned to one horizon behind
    ``min(frontier, oldest pending purchase)``, keeping every view a
    pending purchase could still need.
    """
    if state.exists:
        vt, vid, pt, pid, frontier = state.get
        buf = list(zip(vt, vid))
        pending = list(zip(pt, pid))
    else:
        buf, pending, frontier = [], [], None
    batch = pd.concat(list(pdfs), ignore_index=True)
    rows = [
        (int(t), int(tag), int(eid))
        for t, tag, eid in zip(batch["t"], batch["tag"], batch["event_id"])
    ]
    # Re-inject still-unmatched purchases from earlier batches: the
    # time-ordered merge below then treats a late view exactly as if
    # it had arrived with the purchase.
    rows.extend((t, 1, eid) for t, eid in pending)
    rows.sort()
    if rows:
        batch_max = rows[-1][0]
        frontier = batch_max if frontier is None else max(frontier, batch_max)
    out_rows = []
    new_pending = []
    for t, tag, eid in rows:
        if tag == 0:
            bisect.insort(buf, (t, eid))
        else:
            pos = bisect.bisect_right(buf, (t, 1 << 62))
            if pos > 0 and t - buf[pos - 1][0] <= horizon_us:
                mt, mid = buf[pos - 1]
                out_rows.append((eid, key[0], t, mid, mt))
            elif frontier is not None and frontier - t <= horizon_us:
                new_pending.append((t, eid))
    pending = new_pending
    if frontier is not None:
        cut_base = min([frontier] + [t for t, _ in pending])
        cut = cut_base - horizon_us
        start = bisect.bisect_left(buf, (cut, -(1 << 62)))
        buf = buf[start:]
    state.update((
        [t for t, _ in buf], [i for _, i in buf],
        [t for t, _ in pending], [i for _, i in pending],
        frontier,
    ))
    if out_rows:
        # silent key-groups (nothing matched/finalized this batch)
        # skip the per-group pd.DataFrame construction entirely
        yield pd.DataFrame(
            out_rows,
            columns=["purchase_id", "user_id", "purchase_t", "view_id",
                     "view_t"],
        )


def _asof_update_exact(key, pdfs, state: GroupState, horizon_us: int,
                       delay_us: int):
    """Per-key backward as-of matcher, WATERMARK-EXACT variant.

    Where :func:`_asof_update` emits a purchase's match the moment it
    first finds one (append sinks can't retract, so a better view
    arriving in a later micro-batch is ignored — the r4 residual),
    this variant delays every emission until the key's event-time
    frontier passes ``purchase.t + delay_us``.  Any view delivered
    within that lateness bound — including one that arrives in a later
    micro-batch and IMPROVES on an interim match — is in the buffer
    before the purchase finalizes, so under the standard watermark
    contract ("rows later than the watermark may be dropped") the
    emitted result is exactly the batch as-of join.

    Rows are tagged 0 = view, 1 = purchase, 2 = flush sentinel (only
    advances the frontier — how a bounded fixture run finalizes its
    tail; live pipelines just keep receiving data).  Because purchases
    only finalize after the frontier passes their lateness bound,
    intra-batch arrival order is irrelevant: each batch ingests
    everything first, then finalizes.  State is bounded by
    ``delay_us + horizon_us`` of event time per key: pending
    purchases live at most ``delay_us`` past their event time, and
    the view buffer is pruned to ``horizon_us`` behind the oldest
    row still able to match.
    """
    if state.exists:
        vt, vid, pt, pid, frontier = state.get
        buf = list(zip(vt, vid))
        pending = list(zip(pt, pid))
    else:
        buf, pending, frontier = [], [], None
    batch = pd.concat(list(pdfs), ignore_index=True)
    for t, tag, eid in zip(batch["t"], batch["tag"], batch["event_id"]):
        t, tag, eid = int(t), int(tag), int(eid)
        frontier = t if frontier is None else max(frontier, t)
        if tag == 0:
            bisect.insort(buf, (t, eid))
        elif tag == 1:
            pending.append((t, eid))
    out_rows = []
    still_pending = []
    for t, eid in pending:
        if frontier - t < delay_us:
            still_pending.append((t, eid))
            continue
        pos = bisect.bisect_right(buf, (t, 1 << 62))
        if pos > 0 and t - buf[pos - 1][0] <= horizon_us:
            mt, mid = buf[pos - 1]
            out_rows.append((eid, key[0], t, mid, mt))
        # no view within the horizon -> the purchase finalizes empty
        # (same drop rule as the batch oracle's inner join)
    pending = still_pending
    if frontier is not None:
        cut_base = min([frontier - delay_us]
                       + [t for t, _ in pending])
        cut = cut_base - horizon_us
        start = bisect.bisect_left(buf, (cut, -(1 << 62)))
        buf = buf[start:]
    state.update((
        [t for t, _ in buf], [i for _, i in buf],
        [t for t, _ in pending], [i for _, i in pending],
        frontier,
    ))
    if out_rows:
        # silent key-groups (nothing matched/finalized this batch)
        # skip the per-group pd.DataFrame construction entirely
        yield pd.DataFrame(
            out_rows,
            columns=["purchase_id", "user_id", "purchase_t", "view_id",
                     "view_t"],
        )


_ASOF_CORR_STATE = StructType([
    StructField("vt", ArrayType(LongType())),
    StructField("vid", ArrayType(LongType())),
    StructField("pt", ArrayType(LongType())),
    StructField("pid", ArrayType(LongType())),
    StructField("mt", ArrayType(LongType())),
    StructField("mid", ArrayType(LongType())),
    StructField("mvt", ArrayType(LongType())),
    StructField("mvid", ArrayType(LongType())),
    StructField("frontier", LongType()),
])


def _asof_update_corrections(key, pdfs, state: GroupState,
                             horizon_us: int, delay_us: int):
    """Per-key backward as-of matcher, UPDATE-mode variant: eager
    latency AND exactness, for sinks that can upsert.

    Emits a purchase's best-so-far match the moment one exists (like
    :func:`_asof_update`) and RE-EMITS a correction whenever a view
    arriving in a later micro-batch improves it — the Flink
    "changelog" answer to the append-sink retraction problem.  A sink
    keyed on purchase_id that keeps the LAST emission converges to the
    exact batch as-of join for every view delivered within
    ``delay_us`` of the key's event-time frontier.

    Per batch: ingest everything, then recompute each live purchase's
    best match from the view buffer and emit rows whose best changed.
    State holds the view buffer, unmatched purchases (retained one
    ``horizon_us``, like eager), and matched purchases with their
    current best (retained until the frontier passes ``t + delay_us``
    — after that an improving view would be off-contract anyway), so
    state is bounded by ``delay_us + horizon_us`` of event time.
    """
    if state.exists:
        vt, vid, pt, pid, mt, mid, mvt, mvid, frontier = state.get
        buf = list(zip(vt, vid))
        pending = list(zip(pt, pid))
        matched = {
            (t, i): (bt, bi) for t, i, bt, bi in zip(mt, mid, mvt, mvid)
        }
    else:
        buf, pending, matched, frontier = [], [], {}, None
    batch = pd.concat(list(pdfs), ignore_index=True)
    for t, tag, eid in zip(batch["t"], batch["tag"], batch["event_id"]):
        t, tag, eid = int(t), int(tag), int(eid)
        frontier = t if frontier is None else max(frontier, t)
        if tag == 0:
            bisect.insort(buf, (t, eid))
        elif tag == 1:
            pending.append((t, eid))
    out_rows = []
    # Unmatched purchases: first match emits and moves them to the
    # matched set; still-unmatched ones are retained for the full
    # lateness contract (delay_us — NOT the eager variant's one
    # horizon: in update mode an on-contract FIRST match may arrive
    # up to delay_us of event time late, same as a correction).
    still_pending = []
    for t, eid in sorted(pending):
        pos = bisect.bisect_right(buf, (t, 1 << 62))
        if pos > 0 and t - buf[pos - 1][0] <= horizon_us:
            best = buf[pos - 1]
            matched[(t, eid)] = best
            out_rows.append((eid, key[0], t, best[1], best[0]))
        elif frontier is not None and frontier - t <= delay_us:
            still_pending.append((t, eid))
    pending = still_pending
    # Matched purchases: recompute best from the (grown) buffer and
    # emit corrections for improvements; a purchase matched for the
    # first time THIS batch recomputes to the same best and stays
    # silent here.
    for (t, eid), (bvt, bvid) in sorted(matched.items()):
        pos = bisect.bisect_right(buf, (t, 1 << 62))
        if pos > 0 and t - buf[pos - 1][0] <= horizon_us:
            best = buf[pos - 1]
            if best != (bvt, bvid):
                matched[(t, eid)] = best
                out_rows.append((eid, key[0], t, best[1], best[0]))
    if frontier is not None:
        matched = {
            (t, eid): b for (t, eid), b in matched.items()
            if frontier - t <= delay_us
        }
        # Keep views one horizon behind the oldest row that can still
        # use them — including a purchase that HASN'T ARRIVED yet but
        # may, up to delay_us of event time late (frontier - delay_us,
        # the same rule as _asof_update_exact).
        cut_base = min(
            [frontier - delay_us] + [t for t, _ in pending]
            + [t for t, _ in matched]
        )
        start = bisect.bisect_left(buf, (cut_base - horizon_us,
                                         -(1 << 62)))
        buf = buf[start:]
    mt_ = sorted(matched)
    state.update((
        [t for t, _ in buf], [i for _, i in buf],
        [t for t, _ in pending], [i for _, i in pending],
        [t for t, _ in mt_], [i for _, i in mt_],
        [matched[k][0] for k in mt_], [matched[k][1] for k in mt_],
        frontier,
    ))
    if out_rows:
        # silent key-groups (nothing matched/finalized this batch)
        # skip the per-group pd.DataFrame construction entirely
        yield pd.DataFrame(
            out_rows,
            columns=["purchase_id", "user_id", "purchase_t", "view_id",
                     "view_t"],
        )


def _asof_update_wm(key, pdfs, state: GroupState, horizon_us: int):
    """Per-key backward as-of matcher, GLOBAL-watermark variant.

    Where :func:`_asof_update_exact` tracks a per-key event-time
    frontier (and so needs one flush sentinel PER KEY to finalize a
    bounded run), this variant finalizes against Spark's own global
    event-time watermark (``state.getCurrentWatermarkMs``) — the
    standard watermark contract: a purchase at ``t`` emits once the
    watermark passes ``t``; any view delivered on-contract (before the
    watermark passed ITS event time) is in the buffer by then, so the
    emitted result equals the batch as-of join for every on-contract
    delivery.  The lateness allowance lives in the ``withWatermark``
    delay of the input stream, not in the operator.

    Keys with pending purchases arm an ``EventTimeTimeout`` at the
    oldest pending event time, so finalization happens even if the key
    never receives another row — including in the final no-data
    micro-batch an availableNow run executes after a bounded source
    drains (verified behavior; this is what makes the variant
    flush-free: ONE far-future row anywhere in the stream — or simply
    live data continuing to flow — advances the global watermark past
    every bound).  Tag-2 rows are watermark carriers only and are
    ignored on ingest.  State stays <= one horizon of event time
    behind ``min(watermark, oldest pending purchase)``.
    """
    if state.exists:
        vt, vid, pt, pid, _wm_seen = state.get
        buf = list(zip(vt, vid))
        pending = list(zip(pt, pid))
    else:
        buf, pending = [], []
    if not state.hasTimedOut:
        for pdf in pdfs:
            for t, tag, eid in zip(pdf["t"], pdf["tag"], pdf["event_id"]):
                t, tag, eid = int(t), int(tag), int(eid)
                if tag == 0:
                    bisect.insort(buf, (t, eid))
                elif tag == 1:
                    pending.append((t, eid))
    wm_us = state.getCurrentWatermarkMs() * 1000
    out_rows, still_pending = [], []
    for t, eid in pending:
        if t > wm_us:
            still_pending.append((t, eid))
            continue
        pos = bisect.bisect_right(buf, (t, 1 << 62))
        if pos > 0 and t - buf[pos - 1][0] <= horizon_us:
            mt, mid = buf[pos - 1]
            out_rows.append((eid, key[0], t, mid, mt))
        # no view within the horizon -> finalizes empty (inner join)
    pending = still_pending
    cut_base = min([wm_us] + [t for t, _ in pending])
    start = bisect.bisect_left(buf, (cut_base - horizon_us, -(1 << 62)))
    buf = buf[start:]
    state.update((
        [t for t, _ in buf], [i for _, i in buf],
        [t for t, _ in pending], [i for _, i in pending],
        wm_us,
    ))
    if pending:
        # Fire when the watermark passes the oldest pending purchase.
        # Remaining pendings all have t > wm_us, so this is always
        # above the current watermark (the API rejects timestamps at
        # or below it); the max() guards the ms-rounding edge.
        ms = min(t for t, _ in pending) // 1000 + 1
        state.setTimeoutTimestamp(max(ms, state.getCurrentWatermarkMs() + 1))
    if out_rows:
        # silent key-groups (nothing matched/finalized this batch)
        # skip the per-group pd.DataFrame construction entirely
        yield pd.DataFrame(
            out_rows,
            columns=["purchase_id", "user_id", "purchase_t", "view_id",
                     "view_t"],
        )


def stream_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon_us: int = 7 * 86_400_000_000,
    emit: str = "eager",
    delay_us: int | None = None,
    flush: DataFrame | None = None,
    finalize: str = "sentinel",
    wm_delay: str = "0 seconds",
) -> DataFrame:
    """Stream-stream backward as-of join: each left row is matched to
    the most recent right row of the same key with ``right.t <=
    left.t`` and ``left.t - right.t <= horizon_us`` — the streaming
    face of ts_asof_join, as ONE operator with an emission-policy knob
    (ROADMAP r5 item 4: the eager and watermark-exact variants
    unified).

    Built as a custom stateful operator (``applyInPandasWithState``,
    the SURVEY §7 escape hatch for operators Structured Streaming
    lacks): state is the per-key right-row buffer plus pending left
    rows, sorted and pruned — bounded like an interval join's state,
    but emitting only the LATEST match instead of every row in the
    window (which a native interval join + post-aggregation would
    shuffle and re-finalize).

    ``emit`` selects the latency/exactness trade every streaming
    engine exposes somewhere (Flink: watermark-gated firing; KDB asof:
    batch only):

    * ``"eager"`` (default, lowest latency): a left row emits the
      moment a match exists.  Right rows arriving in LATER batches
      still match so-far-unmatched left rows (pending-left state,
      bounded at one horizon), but a late right row that would
      IMPROVE an already-emitted match is ignored — append sinks
      cannot retract (see :func:`_asof_update`).  With batch-complete
      delivery (availableNow over a static source) this is exactly
      the batch as-of join.
    * ``"watermark"`` (exact under bounded lateness): emission is
      delayed until the per-key event-time frontier passes ``left.t +
      delay_us``, so every right row delivered within the lateness
      bound — including one that improves an interim match — is
      incorporated before the single, final emission (see
      :func:`_asof_update_exact`).  Requires ``delay_us``.  State per
      key stays <= ``delay_us + horizon_us`` of event time.
    * ``"update"`` (eager latency AND exact, for upsert-capable
      sinks): first match emits immediately, and a later view that
      improves it re-emits a CORRECTION row — a changelog stream
      keyed on purchase_id whose last row per key equals the batch
      join (see :func:`_asof_update_corrections`).  Requires
      ``delay_us`` as the correction-retention bound.

    ``finalize`` selects how watermark mode learns that time has
    passed (ignored for eager mode):

    * ``"sentinel"`` (default): per-key event-time frontier tracked in
      state (:func:`_asof_update_exact`), requires ``delay_us``; a
      bounded run finalizes its tail with one ``flush`` sentinel row
      PER KEY whose ``t`` exceeds every real row's ``t + delay_us``.
    * ``"timeout"``: Spark's own GLOBAL event-time watermark +
      ``EventTimeTimeout`` (:func:`_asof_update_wm`) — the lateness
      allowance is ``wm_delay`` (the ``withWatermark`` delay applied
      to the tagged union), a purchase finalizes when the watermark
      passes its event time, and no per-key sentinels are needed:
      live pipelines finalize from data flow alone, and a bounded
      fixture needs at most ONE far-future row anywhere in the stream
      to push the final watermark past every bound.

    ``flush``: sentinel rows (key, t, event_id) — per-key frontier
    advancers for ``finalize="sentinel"``, or a single global
    watermark carrier for ``finalize="timeout"``.  Rejected in eager
    mode.

    Both inputs need columns ``(key, t, event_id)``.
    """
    if emit not in ("eager", "watermark", "update"):
        raise ValueError(
            f"emit must be 'eager', 'watermark' or 'update': {emit!r}")
    if finalize not in ("sentinel", "timeout"):
        raise ValueError(
            f"finalize must be 'sentinel' or 'timeout': {finalize!r}")
    state_struct = _ASOF_STATE
    output_mode = "append"
    timeout_conf = GroupStateTimeout.NoTimeout
    if emit == "update":
        # Changelog variant: eager first emission + corrections when a
        # later view improves it — for sinks that can upsert on
        # purchase_id (see _asof_update_corrections).  Flush sentinels
        # are honored (the updater ingests tag-2 rows as frontier
        # advances only), so a bounded run can force final pruning.
        if delay_us is None:
            raise ValueError("emit='update' requires delay_us "
                             "(correction-retention bound)")
        update = partial(_asof_update_corrections, horizon_us=horizon_us,
                         delay_us=delay_us)
        state_struct = _ASOF_CORR_STATE
        output_mode = "update"
    elif emit == "watermark":
        if finalize == "timeout":
            update = partial(_asof_update_wm, horizon_us=horizon_us)
            timeout_conf = GroupStateTimeout.EventTimeTimeout
        else:
            if delay_us is None:
                raise ValueError("emit='watermark' with "
                                 "finalize='sentinel' requires delay_us")
            update = partial(_asof_update_exact, horizon_us=horizon_us,
                             delay_us=delay_us)
    else:
        if flush is not None:
            # _asof_update has no sentinel branch — a tag-2 row would
            # be processed as a purchase.  Refuse instead of corrupting.
            raise ValueError("flush sentinels only apply to "
                             "emit='watermark' or emit='update'")
        update = partial(_asof_update, horizon_us=horizon_us)
    tagged = right.select(
        key, "t", "event_id", F.lit(0).alias("tag")
    ).unionByName(
        left.select(key, "t", "event_id", F.lit(1).alias("tag"))
    )
    if flush is not None:
        tagged = tagged.unionByName(
            flush.select(key, "t", "event_id", F.lit(2).alias("tag"))
        )
    if emit == "watermark" and finalize == "timeout":
        # EventTimeTimeout requires a watermarked event-time column on
        # the input; ``wm_delay`` IS the operator's lateness contract.
        tagged = tagged.withColumn(
            "ts", F.timestamp_micros(F.col("t"))
        ).withWatermark("ts", wm_delay)
    return tagged.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=_ASOF_OUT,
        stateStructType=state_struct,
        outputMode=output_mode,
        timeoutConf=timeout_conf,
    )


def stream_asof_join_exact(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon_us: int = 7 * 86_400_000_000,
    delay_us: int = 30 * 60 * 1_000_000,
    flush: DataFrame | None = None,
) -> DataFrame:
    """Back-compat alias for ``stream_asof_join(..., emit="watermark")``
    (the r5-unified operator)."""
    return stream_asof_join(left, right, key=key, horizon_us=horizon_us,
                            emit="watermark", delay_us=delay_us,
                            flush=flush)


def stream_latest_per_key(points: DataFrame) -> DataFrame:
    """Continuously-maintained latest-per-key view (Mutable KV M6) as a
    custom stateful streaming operator: emits the current winner for
    every key that saw new data in the micro-batch."""
    return points.groupBy("address").applyInPandasWithState(
        _latest_update,
        outputStructType=_LATEST_OUT,
        stateStructType=_LATEST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    points: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Session-window aggregation over a streaming points DataFrame —
    the streaming twin of the batch sessionize (queries_timeseries.
    ts_sessionize), using Spark's native ``session_window``: per key,
    events merge into one session while each arrives strictly less
    than ``gap`` after the previous (window = [first, last + gap));
    the watermark closes sessions and bounds state.  Append mode emits
    exactly the sessions whose end <= watermark."""
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap), F.col("address"))
        .agg(
            F.count("*").alias("n"),
            F.min(time_col).alias("first_t"),
            F.max(time_col).alias("last_t"),
        )
    )


def stream_rollup_sliding(
    points: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Sliding event-time rollup: each point contributes to
    window/slide overlapping windows (4 for 1h/15m) — the
    moving-average / rate-dashboard shape tumbling windows can't
    express.  State is bounded by the watermark exactly as in
    :func:`stream_rollup`; Spark expands the per-row window list
    internally, so the plan stays one streaming aggregation."""
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide), F.col("address"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )


def stream_interval_coalesce(
    events: DataFrame,
    watermark: str = "30 minutes",
    time_col: str = "time",
    key_col: str = "user_id",
    dur_s_col: str = "dur_s",
) -> DataFrame:
    """Streaming interval coalescing — the streaming twin of the batch
    ``ts_interval_coalesce``, built on Spark's native DYNAMIC-GAP
    session window: each event opens an interval
    ``[t, t + dur_s)`` (per-row duration column, passed as the
    session gap), and the engine MERGES overlapping intervals of the
    same key incrementally, with watermark-bounded state and
    watermark-closed emission.  Session semantics are half-open, so
    touching endpoints start a new island (the batch op's closed
    intervals merge them — deviation documented in the registered
    query).  The merged window's end is ``max(t + dur)`` over its
    members — exactly the coalesced extent.

    The gap is clamped to >= 1 second: Spark's dynamic-gap
    session_window silently FILTERS rows whose gap is non-positive, so
    a zero-length interval would vanish from the streaming result
    while the batch twin still counts it (ADVICE r9).  Clamping keeps
    the twins aligned on degenerate durations (the registered source
    is always >= 60 s, so the clamp never fires there)."""
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    gap = F.concat(
        F.greatest(F.col(dur_s_col), F.lit(1)).cast("string"),
        F.lit(" seconds"))
    return (
        events.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .groupBy(F.session_window("event_ts", gap), F.col(key_col))
        .agg(
            F.count("*").alias("n_intervals"),
            F.min(time_col).alias("start_us"),
        )
    )


# ------------------------------------------------- streaming EWMA

_EWMA_OUT = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("t", LongType()),
    StructField("v", LongType()),
    StructField("ewma_x65536", LongType()),
])

_EWMA_STATE = StructType([
    StructField("pend_t", ArrayType(LongType())),
    StructField("pend_eid", ArrayType(LongType())),
    StructField("pend_v", ArrayType(LongType())),
    StructField("tail_v", ArrayType(LongType())),
    StructField("frontier", LongType()),
])


def _tail_window_update(key, pdfs, state: GroupState, delay_us: int,
                        depth: int, fold, out_cols):
    """Generic per-key ORDERED tail-window operator, watermark-exact:
    rows buffer until the key's event-time frontier passes
    ``t + delay_us``, then finalize in (t, event_id) order; each
    finalized row emits ``fold(window)`` where ``window`` is the last
    <= ``depth`` finalized values ending at the row — the streaming
    form of every bounded-frame batch window op (EWMA, rolling
    median, ...).  Order-dependence is why this is a custom stateful
    operator and not a windowed aggregate; it IS replayable state —
    the depth-1 tail plus the pending buffer fully determine every
    future emission, which is exactly what the checkpoint holds.

    Rows are tagged 0 = data, 2 = flush sentinel (advances the
    frontier only — the bounded-fixture finalizer; live pipelines
    advance from data flow).  State per key is the depth-1 tail plus
    at most ``delay_us`` of pending event time."""
    if state.exists:
        pt, pe, pv, tail, frontier = state.get
        pending = list(zip(pt, pe, pv))
        tail = list(tail)
    else:
        pending, tail, frontier = [], [], None
    batch = pd.concat(list(pdfs), ignore_index=True)
    for t, tag, eid, v in zip(batch["t"], batch["tag"],
                              batch["event_id"], batch["v"]):
        t, tag = int(t), int(tag)
        frontier = t if frontier is None else max(frontier, t)
        if tag == 0:
            pending.append((t, int(eid), int(v)))
    pending.sort()
    out = []
    i = 0
    while i < len(pending) and frontier - pending[i][0] >= delay_us:
        t, eid, v = pending[i]
        window = (tail + [v])[-depth:]
        out.append((eid, int(key[0]), t) + tuple(fold(window)))
        tail = (tail + [v])[-(depth - 1):]
        i += 1
    pending = pending[i:]
    state.update((
        [t for t, _, _ in pending], [e for _, e, _ in pending],
        [v for _, _, v in pending], tail, frontier,
    ))
    if out:
        # Nothing finalizes in most micro-batches (rows buffer until
        # the frontier passes t + delay_us), and a pd.DataFrame
        # construction per silent key-group costs ~0.3 ms x keys x
        # batches — yield only when there is something to emit.
        cols = ["event_id", "user_id", "t", *out_cols]
        yield pd.DataFrame(
            {c: [row[j] for row in out] for j, c in enumerate(cols)})


def _ewma_fold(depth: int):
    def fold(window):
        ew = 0
        for j, val in enumerate(reversed(window)):
            ew += val << (depth - 1 - j)
        return (window[-1], ew)
    return fold


def _median2x_fold(window):
    a = sorted(window)
    n = len(a)
    return (n, a[(n + 1) // 2 - 1] + a[n // 2])


def _tagged_points(points: DataFrame, flush, key_col: str) -> DataFrame:
    tagged = points.select(
        F.col(key_col).alias("user_id"), "t", "event_id", "v",
        F.lit(0).alias("tag"),
    )
    if flush is not None:
        tagged = tagged.unionByName(flush.select(
            F.col(key_col).alias("user_id"), "t", "event_id", "v",
            F.lit(2).alias("tag"),
        ))
    return tagged


def stream_ewma(points: DataFrame, delay_us: int,
                flush: DataFrame | None = None,
                depth: int = 16, key_col: str = "user_id") -> DataFrame:
    """Streaming dyadic EWMA — the streaming twin of the batch
    ``ts_ewma_smooth`` (alpha=1/2, ``depth`` lags, scale
    ``2**depth``), watermark-exact under bounded lateness: a row
    finalizes (and emits its smoother value) only once the per-key
    event-time frontier passes ``t + delay_us``, so any row delivered
    within the bound lands in its correct sequence position first —
    with batch-complete or bounded-lateness delivery the sink equals
    the batch operator row for row.  Built on
    :func:`_tail_window_update`.

    Input needs columns ``(key_col, t, event_id, v)``; ``flush``
    rows (same columns) are per-key frontier advancers for bounded
    runs."""
    return _tagged_points(points, flush, key_col) \
        .groupBy("user_id").applyInPandasWithState(
            partial(_tail_window_update, delay_us=delay_us,
                    depth=depth, fold=_ewma_fold(depth),
                    out_cols=["v", "ewma_x65536"]),
            outputStructType=_EWMA_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )


_MEDIAN_OUT = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("t", LongType()),
    StructField("n_win", LongType()),
    StructField("median2x", LongType()),
])


def stream_rolling_median(points: DataFrame, delay_us: int,
                          flush: DataFrame | None = None,
                          depth: int = 7,
                          key_col: str = "user_id") -> DataFrame:
    """Streaming rolling median — the streaming twin of the batch
    ``ts_rolling_median`` (trailing ``depth`` observations per
    series, exact 2x-scaled integer median), watermark-exact under
    bounded lateness via the same :func:`_tail_window_update`
    kernel as :func:`stream_ewma` (state = depth-1 tail + pending
    buffer).  Same input/flush contract."""
    return _tagged_points(points, flush, key_col) \
        .groupBy("user_id").applyInPandasWithState(
            partial(_tail_window_update, delay_us=delay_us,
                    depth=depth, fold=_median2x_fold,
                    out_cols=["n_win", "median2x"]),
            outputStructType=_MEDIAN_OUT,
            stateStructType=_EWMA_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

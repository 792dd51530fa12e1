"""Law tests for the r6 operator batch (gap fill / counter rate /
exact quantiles / sequence packing / tf-idf terms / streaming dedup).

Each law is checked on the sf0.001 fixture output — properties that an
oracle hash-match alone wouldn't explain (the WHY behind the numbers),
mirroring the repo's test strategy (SURVEY.md §5)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_gapfill_locf_laws(spark):
    from rados_timestore_spark.queries_timeseries import ts_gapfill_locf

    out = ts_gapfill_locf(spark, SF).toPandas()
    hour = 3_600_000_000
    for _uid, g in out.groupby("user_id"):
        hs = np.sort(g["hour_us"].to_numpy())
        # the per-user hour grid is complete: no holes, span-exact
        assert (np.diff(hs) == hour).all()
        g = g.sort_values("hour_us")
        # first and last grid hours are observed (span is min..max)
        assert g.iloc[0]["n"] > 0 and g.iloc[-1]["n"] > 0
        # filled <=> no samples in the hour; LOCF carries the previous
        # value forward exactly
        assert ((g["n"] == 0) == (g["filled"] == 1)).all()
        vals = g["value_locf"].to_numpy()
        filled = g["filled"].to_numpy().astype(bool)
        assert not np.isnan(vals).any()
        prev = np.roll(vals, 1)
        assert (vals[filled] == prev[filled]).all()


def test_counter_rate_laws(spark):
    from rados_timestore_spark.queries_timeseries import (
        _events, ts_counter_rate,
    )

    out = ts_counter_rate(spark, SF).toPandas()
    ev = _events(spark, SF).toPandas()
    # increase is a sum of non-negative contributions
    assert (out["increase"] >= 0).all()
    # per-user reset count equals the directly-counted negative deltas
    ev = ev.sort_values(["user_id", "t", "event_id"])
    for uid, g in ev.groupby("user_id"):
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        resets = int((np.diff(v) < 0).sum())
        assert int(out[out.user_id == uid]["n_resets"].sum()) == resets


def test_quantiles_rank_rule(spark):
    from rados_timestore_spark.queries_timeseries import (
        _events, ts_quantiles,
    )

    out = ts_quantiles(spark, SF).toPandas().set_index("event_type")
    ev = _events(spark, SF).toPandas()
    for etype, g in ev.groupby("event_type"):
        s = g.sort_values(["value", "event_id"])
        v = s["value"].to_numpy()
        n = len(v)
        for q, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            want = v[(n * q + 99) // 100 - 1]
            assert abs(out.loc[etype, col] - want) < 1e-9
        assert out.loc[etype, "n"] == n
        # the rank rule is monotone: p50 <= p90 <= p99
        assert (out.loc[etype, "p50"] <= out.loc[etype, "p90"]
                <= out.loc[etype, "p99"])


def test_pack_sequences_conservation(spark):
    from pyspark.sql import functions as F

    from rados_timestore_spark.queries_text import (
        PACK_BUDGET, _words_col, text_pack_sequences,
    )

    out = text_pack_sequences(spark, SF).toPandas().sort_values("bin_id")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = docs.select(
        F.count("*").alias("nd"),
        F.sum(F.size(_words_col())).alias("nt"),
    ).collect()[0]
    # conservation: every document lands in exactly one bin, every
    # token is packed
    assert out["n_docs"].sum() == totals["nd"]
    assert out["n_tokens"].sum() == totals["nt"]
    # bins are dense 0..max and doc-id spans never interleave
    assert list(out["bin_id"]) == list(range(len(out)))
    assert (out["first_doc"].to_numpy()[1:]
            > out["last_doc"].to_numpy()[:-1]).all()
    # a bin starts only when the previous one's budget is spent: every
    # non-final bin holds >= budget tokens counting its boundary doc's
    # spillover, i.e. cumulative tokens at bin end >= (bin_id+1)*budget
    cum = out["n_tokens"].cumsum().to_numpy()
    assert (cum[:-1] >= (out["bin_id"].to_numpy()[:-1] + 1)
            * PACK_BUDGET).all()


def test_tfidf_terms_are_rarest_first(spark):
    from pyspark.sql import functions as F

    from rados_timestore_spark.queries_text import (
        _words_col, text_tfidf_top_terms,
    )

    out = text_tfidf_top_terms(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    dw = docs.select(
        "doc_id", F.explode(_words_col()).alias("word")
    ).distinct().toPandas()
    df = dw.groupby("word").size()
    # exactly 3 per doc (fixture docs all have >= 3 distinct words),
    # rank ordered by (df, word), and no doc term beats rank 3's key
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3]
        keys = [(df[w], w) for w in g["word"]]
        assert keys == sorted(keys)
        mine = dw[dw.doc_id == doc_id]["word"]
        best3 = sorted((df[w], w) for w in mine)[:3]
        assert keys == best3


def test_streaming_dedup_docs_is_first_arrival(spark):
    import hashlib

    from rados_timestore_spark.queries_streaming import (
        streaming_dedup_docs,
    )

    out = streaming_dedup_docs(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").toPandas()
    docs["h"] = docs["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    by_hash = docs.groupby("h")["doc_id"].apply(list)
    assert len(out) == len(by_hash)
    got = out.set_index("content_md5")
    for h, ids in by_hash.items():
        # first arrival = min under (parity, doc_id): evens stream first
        want = min(ids, key=lambda d: (d % 2, d))
        assert got.loc[h, "keep_doc_id"] == want
        assert got.loc[h, "n_dups"] == len(ids)


def test_gapfill_and_counter_rate_model_random(spark):
    # Model-based check on a RANDOM (seeded) frame — boundary shapes
    # the fixture can't produce: single-event users, duplicate
    # timestamps (seq tiebreak), same-hour bursts, exact day-boundary
    # samples.  The pandas model re-derives both operators' outputs
    # from first principles.
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n = 400
    hour, day = 3_600_000_000, 86_400_000_000
    pdf = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 6, n),
        "event_type": "x",
        "value": np.round(rng.uniform(0, 500, n), 2),
        "t": np.concatenate([
            rng.integers(0, 3 * day, n - 3),
            [0, day, 2 * day],  # exact day boundaries
        ]),
    })
    # duplicate-timestamp pair for the (t, event_id) tiebreak
    pdf.loc[1, ["user_id", "t"]] = pdf.loc[0, ["user_id", "t"]]

    import tempfile

    src = tempfile.mkdtemp(prefix="r6model_") + "/events.parquet"
    spk = spark.createDataFrame(pdf.assign(
        ts=pd.to_datetime(pdf["t"], unit="us"),
        props="{}",
    )[["event_id", "ts", "user_id", "event_type", "value", "props"]])
    spk.write.parquet(src)
    sf_dir = src.rsplit("/", 1)[0]

    from rados_timestore_spark.queries_timeseries import (
        ts_counter_rate, ts_gapfill_locf,
    )

    # ---- gapfill model
    got = ts_gapfill_locf(spark, sf_dir).toPandas()
    cents = pdf.assign(h=pdf["t"] // hour)
    for uid, g in cents.groupby("user_id"):
        hours = {}
        for h, gg in g.groupby("h"):
            win = gg.sort_values(["t", "event_id"]).iloc[-1]
            hours[h] = (len(gg), round(win["value"], 2))
        h0, h1 = min(hours), max(hours)
        mine = got[got.user_id == uid].sort_values("hour_us")
        assert len(mine) == h1 - h0 + 1
        lastv = None
        for _, row in mine.iterrows():
            h = row["hour_us"] // hour
            if h in hours:
                lastv = hours[h][1]
                assert row["n"] == hours[h][0] and row["filled"] == 0
            else:
                assert row["n"] == 0 and row["filled"] == 1
            assert abs(row["value_locf"] - lastv) < 1e-9

    # ---- counter-rate model (exact integer cents)
    got = ts_counter_rate(spark, sf_dir).toPandas()
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["t", "event_id"])
        v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        days = (g["t"].to_numpy() // day)
        inc: dict = {}
        res: dict = {}
        prev = None
        for val, d in zip(v, days):
            if prev is not None:
                delta = val - prev
                inc[d] = inc.get(d, 0) + (delta if delta >= 0 else val)
                res[d] = res.get(d, 0) + (1 if delta < 0 else 0)
            else:
                inc.setdefault(d, 0)
                res.setdefault(d, 0)
            prev = val
        mine = got[got.user_id == uid]
        assert len(mine) == len(inc)
        for _, row in mine.iterrows():
            d = row["day_us"] // day
            assert round(row["increase"] * 100) == inc[d], (uid, d)
            assert row["n_resets"] == res[d]

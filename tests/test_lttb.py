"""ts_lttb_downsample semantics on a hand-crafted series: the
parallel LTTB (neighbor-bucket mean anchors) must pick the visually
dominant point of each interior bucket."""

import pandas as pd

from rados_timestore_spark.queries_timeseries import ts_lttb_downsample

_DAY = 86_400_000_000


def test_lttb_picks_the_spike(spark, tmp_path):
    # Flat series with one large spike inside the interior bucket —
    # against flat neighbor means, the spike sweeps the largest
    # triangle and must be the selected point.
    rows = []
    eid = 0
    for day in (0, 1, 2):
        for i in range(5):
            v = 10.0
            if day == 1 and i == 3:
                v = 500.0  # the spike
            rows.append((eid, 7, pd.Timestamp(
                day * _DAY + i * 3_600_000_000, unit="us"), v))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    pdf["event_type"] = "view"
    pdf["props"] = "{}"
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    out = ts_lttb_downsample(spark, str(tmp_path)).collect()
    # only day 1 has both neighbors
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 7 and r.day_us == _DAY
    assert r.t_sel == _DAY + 3 * 3_600_000_000
    assert r.v_centi == 50_000


def test_lttb_selected_point_lies_in_its_bucket(spark):
    from tests.conftest import SF_DIR

    out = ts_lttb_downsample(spark, SF_DIR)
    import pyspark.sql.functions as F

    bad = out.filter(
        (F.col("t_sel") < F.col("day_us"))
        | (F.col("t_sel") >= F.col("day_us") + _DAY)
    ).count()
    assert bad == 0
    # one selected point per (user, interior day)
    assert out.groupBy("user_id", "day_us").count() \
        .filter(F.col("count") > 1).count() == 0

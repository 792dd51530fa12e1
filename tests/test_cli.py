"""CLI parity test (src/Store.hs register + the admin verbs)."""

import json

from rados_timestore_spark.cli import main


def test_cli_register_write_read_latest(spark, tmp_path, capsys):
    root = str(tmp_path / "wh")
    base = ["--root", root, "--ns", "PONY"]

    assert main([*base, "register", "--buckets", "8"], spark=spark) == 0
    # double-register is refused, matching registerNamespace's
    # already-registered guard (TimeStore.hs:72-76)
    assert main([*base, "register"], spark=spark) == 1

    src = str(tmp_path / "pts.parquet")
    spark.createDataFrame(
        [(2, 5, 7), (4, 6, 8)], "address long, time long, value long"
    ).write.parquet(src)
    assert main([*base, "write", "--parquet", src], spark=spark) == 0

    capsys.readouterr()
    assert main(
        [*base, "read", "--start", "0", "--end", "10",
         "--addresses", "2,4"],
        spark=spark,
    ) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {(r["address"], r["time"], r["value"]) for r in rows} == {
        (2, 5, 7), (4, 6, 8)}

    assert main([*base, "latest"], spark=spark) == 0
    assert json.loads(capsys.readouterr().out) == {
        "simple": 6, "extended": None}


def test_cli_backfill(spark, tmp_path, capsys):
    root = str(tmp_path / "wh2")
    base = ["--root", root, "--ns", "HIST"]
    assert main([*base, "register", "--buckets", "4"], spark=spark) == 0

    src = str(tmp_path / "hist.parquet")
    day = 86_400_000_000
    spark.createDataFrame(
        [(2, 10, 1), (2, day + 10, 2), (2, 2 * day + 10, 3)],
        "address long, time long, value long",
    ).write.parquet(src)
    capsys.readouterr()
    assert main([*base, "backfill", "--parquet", src], spark=spark) == 0
    # 3 day-batches -> 3 cuts + the initial entry
    assert json.loads(capsys.readouterr().out) == {"epochs": 4}
    assert main(
        [*base, "read", "--start", "0", "--end", str(3 * day),
         "--addresses", "2"],
        spark=spark,
    ) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {(r["time"], r["value"]) for r in rows} == {
        (10, 1), (day + 10, 2), (2 * day + 10, 3)}


def test_cli_compact_gc(spark, tmp_path, capsys):
    root = str(tmp_path / "wh3")
    base = ["--root", root, "--ns", "PONY"]
    assert main([*base, "register", "--buckets", "4"], spark=spark) == 0
    src = str(tmp_path / "pts3.parquet")
    spark.createDataFrame(
        [(2, 5, 7), (4, 6, 8)], "address long, time long, value long"
    ).write.parquet(src)
    assert main([*base, "write", "--parquet", src], spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "compact"], spark=spark) == 0
    assert capsys.readouterr().out.strip() == "ok"
    assert main([*base, "gc"], spark=spark) == 0
    # compact deletes the old generation itself; gc finds no orphans
    assert json.loads(capsys.readouterr().out) == []
    # data survives the compact+gc cycle
    capsys.readouterr()
    assert main([*base, "read", "--start", "0", "--end", "10",
                 "--addresses", "2,4"], spark=spark) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {(r["address"], r["value"]) for r in rows} == {(2, 7), (4, 8)}


def test_cli_store_stats_maintain(spark, tmp_path, capsys):
    # late-r14: the store's stats/maintain verbs (healing path is
    # law-tested in test_store.py; the CLI adds no logic).
    root = str(tmp_path / "wh3m")
    base = ["--root", root, "--ns", "PONY"]
    assert main([*base, "register", "--buckets", "4"], spark=spark) == 0
    src = str(tmp_path / "ptsm.parquet")
    spark.createDataFrame(
        [(2, 5, 7)], "address long, time long, value long"
    ).write.parquet(src)
    assert main([*base, "write", "--parquet", src], spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "stats"], spark=spark) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["over_bound"] == [] and st["stale_generations"] == []
    assert sum(st["files_per_bucket"].values()) >= 1
    assert main([*base, "maintain"], spark=spark) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["action"] == "none"


def test_cli_query_runs_sketches_and_lists(spark, tmp_path, capsys):
    # VERDICT r5 item 8: the sketch family (and the whole registered
    # analytics surface) must be scriptable through the CLI.
    # No --root/--ns needed: the query verb is warehouse-free (r6
    # review finding).
    base = []

    assert main([*base, "query", "--list"], spark=spark) == 0
    names = capsys.readouterr().out.split()
    assert "sketch_hll_ngrams" in names and "dedup_exact" in names

    assert main(
        [*base, "query", "--name", "sketch_cms_heavy_hitters",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"],
        spark=spark,
    ) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and {"gram", "cms_est"} <= set(rows[0])

    assert main([*base, "query", "--name", "nope"], spark=spark) == 1
    # store verbs without --root/--ns fail cleanly
    assert main(["latest"], spark=spark) == 1


def test_cli_expire(spark, tmp_path, capsys):
    root = str(tmp_path / "wh4")
    base = ["--root", root, "--ns", "TTL"]
    assert main([*base, "register", "--buckets", "4"], spark=spark) == 0
    src = str(tmp_path / "ttl.parquet")
    day = 86_400_000_000
    spark.createDataFrame(
        [(2, 10, 1), (2, day + 10, 2), (2, 2 * day + 10, 3)],
        "address long, time long, value long",
    ).write.parquet(src)
    assert main([*base, "backfill", "--parquet", src], spark=spark) == 0
    capsys.readouterr()
    # cutoff at day 2: day-0 and day-1 epochs end before it
    assert main(
        [*base, "expire", "--older-than-us", str(2 * day)], spark=spark
    ) == 0
    dropped = json.loads(capsys.readouterr().out)
    assert len(dropped) == 2
    capsys.readouterr()
    assert main([*base, "read", "--start", "0", "--end", str(3 * day),
                 "--addresses", "2"], spark=spark) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {(r["time"], r["value"]) for r in rows} == {(2 * day + 10, 3)}


def test_cli_vecidx_lifecycle(spark, tmp_path, capsys):
    # build -> append -> probe -> compact through the CLI verbs, the
    # scriptable surface of vector_index.VectorIndex.
    root = str(tmp_path / "vidx")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"
    import pyspark.sql.functions as F

    emb = spark.read.parquet(src)
    a, b = (str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet"))
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(a)
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(b)

    assert main([*base, "vecidx-build", "--parquet", a, "--k", "32"],
                spark=spark) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["k"] == 32 and doc["version"] == 1

    assert main([*base, "vecidx-append", "--parquet", b],
                spark=spark) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["n_vectors"] == emb.count()

    assert main([*base, "vecidx-probe", "--parquet", src,
                 "--ids", "0,1", "--topk", "3", "--nprobe", "2"],
                spark=spark) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(1 <= r["rank"] <= 3 for r in rows)

    assert main([*base, "vecidx-compact"], spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["files"] > 0

    assert main([*base, "vecidx-delete", "--ids", "7,9"],
                spark=spark) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["removed"] == 2


def test_cli_vecidx_pq_verbs(spark, tmp_path, capsys):
    # enable-pq -> probe-pq (plain ADC, then exact-reranked) — the
    # scriptable surface of the compressed read path.
    root = str(tmp_path / "vidxpq")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main([*base, "vecidx-build", "--parquet", src,
                 "--k", "32"], spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "vecidx-enable-pq", "--m", "4",
                 "--ksub", "16"], spark=spark) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["pq"] == {"m": 4, "ksub": 16, "dsub": 16, "gen": 1}

    assert main([*base, "vecidx-probe-pq", "--parquet", src,
                 "--ids", "0,1", "--topk", "3", "--nprobe", "2"],
                spark=spark) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all("approx_d2" in r for r in rows)

    assert main([*base, "vecidx-probe-pq", "--parquet", src,
                 "--ids", "0,1", "--topk", "3", "--nprobe", "2",
                 "--rerank", "20"], spark=spark) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    assert all("cos" in r and 1 <= r["rank"] <= 3 for r in rows)


def test_cli_verify(spark, tmp_path, capsys):
    root = str(tmp_path / "wh9")
    base = ["--root", root, "--ns", "PONY"]
    assert main([*base, "register", "--buckets", "4"], spark=spark) == 0
    src = str(tmp_path / "pts9.parquet")
    spark.createDataFrame(
        [(2, 5, 7)], "address long, time long, value long"
    ).write.parquet(src)
    assert main([*base, "write", "--parquet", src], spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "verify"], spark=spark) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"] and rep["n_rows"] == 1
    # plant a crashed stage -> non-zero exit + reported orphan
    import os
    os.makedirs(f"{root}/PONY/.stage_x")
    assert main([*base, "verify"], spark=spark) == 3
    rep = json.loads(capsys.readouterr().out)
    assert rep["orphan_dirs"] == [".stage_x"] and not rep["ok"]


def test_cli_register_dual_index(spark, tmp_path, capsys):
    # Store.hs:30-88 parity: register takes BOTH per-kind bucket
    # counts; the CLI's --extended-buckets enables the dual index.
    from rados_timestore_spark.store import TimeStore

    root = str(tmp_path / "wh")
    base = ["--root", root, "--ns", "DUAL"]
    assert main([*base, "register", "--buckets", "4",
                 "--extended-buckets", "5"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "4 simple / 5 extended" in out
    store = TimeStore(spark, root)
    assert store.index("DUAL").entries == ((0, 4),)
    assert store.index("DUAL", extended=True).entries == ((0, 5),)


def test_cli_hnsw_build_append_probe(spark, tmp_path, capsys):
    import json as _json

    root = str(tmp_path / "hx")
    sf = "/root/testdata/sf0.001"
    base = ["--root", root, "--ns", "E"]
    src = f"{sf}/embeddings.parquet"
    # build on even ids, append the odds, probe query 0
    even = str(tmp_path / "even.parquet")
    odd = str(tmp_path / "odd.parquet")
    emb = spark.read.parquet(src)
    emb.filter("vec_id % 2 = 0").write.parquet(even)
    emb.filter("vec_id % 2 = 1").write.parquet(odd)
    assert main([*base, "hnsw-build", "--parquet", even,
                 "--shards", "4", "--ef", "128"], spark=spark) == 0
    doc = _json.loads(capsys.readouterr().out.strip())
    assert doc["n_vectors"] == emb.filter("vec_id % 2 = 0").count()
    assert main([*base, "hnsw-append", "--parquet", odd],
                spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "hnsw-probe", "--parquet", src, "--ids", "0",
                 "--topk", "3", "--ef", "128"], spark=spark) == 0
    lines = [_json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert [l["rank"] for l in lines] == [1, 2, 3]
    assert all(l["query_id"] == 0 for l in lines)


def test_cli_hnsw_delete_and_compact(spark, tmp_path, capsys):
    import json as _json

    root = str(tmp_path / "hx")
    sf = "/root/testdata/sf0.001"
    base = ["--root", root, "--ns", "E"]
    src = f"{sf}/embeddings.parquet"
    assert main([*base, "hnsw-build", "--parquet", src,
                 "--shards", "4"], spark=spark) == 0
    capsys.readouterr()
    assert main([*base, "hnsw-delete", "--ids", "7,14,21"],
                spark=spark) == 0
    assert _json.loads(capsys.readouterr().out.strip()) == {"removed": 3}
    assert main([*base, "hnsw-compact"], spark=spark) == 0
    out = _json.loads(capsys.readouterr().out.strip())
    assert out["files"] >= 4


def test_cli_vecidx_retrain_and_stats(spark, tmp_path, capsys):
    # the r14 centroid-growth verbs (VERDICT r13 #2/#3): retrain at a
    # new k through the CLI, and stats reporting per-bucket counts vs
    # the sizing rule.
    root = str(tmp_path / "vidxr")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main([*base, "vecidx-build", "--parquet", src, "--k", "8"],
                spark=spark) == 0
    json.loads(capsys.readouterr().out)

    assert main([*base, "vecidx-stats"], spark=spark) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["k"] == 8 and st["over_bound"] == []
    assert sum(st["per_bucket"].values()) == st["n_vectors"]

    assert main([*base, "vecidx-retrain", "--k", "32"],
                spark=spark) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["k"] == 32 and doc["version"] == 2

    assert main([*base, "vecidx-stats"], spark=spark) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["k"] == 32
    assert len(st["per_bucket"]) > 8            # re-bucketed wider


def test_cli_vecidx_maintain(spark, tmp_path, capsys):
    # r14: the measure-then-heal verb — healthy index reports
    # action=none through the CLI (the healing path is law-tested in
    # test_vector_index.py; the CLI adds no logic).
    root = str(tmp_path / "vmnt")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main([*base, "vecidx-build", "--parquet", src, "--k", "8"],
                spark=spark) == 0
    json.loads(capsys.readouterr().out)
    assert main([*base, "vecidx-maintain"], spark=spark) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["action"] == "none"
    assert res["stats"]["k"] == 8


def test_cli_hnsw_maintain(spark, tmp_path, capsys):
    root = str(tmp_path / "hmnt")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main([*base, "hnsw-build", "--parquet", src,
                 "--shards", "4"], spark=spark) == 0
    json.loads(capsys.readouterr().out)
    assert main([*base, "hnsw-maintain"], spark=spark) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["action"] == "none"
    assert res["stats"]["shards"] == 4


def test_cli_hnsw_stats(spark, tmp_path, capsys):
    root = str(tmp_path / "hst")
    base = ["--root", root, "--ns", "E"]
    src = "/root/testdata/sf0.001/embeddings.parquet"

    assert main([*base, "hnsw-build", "--parquet", src,
                 "--shards", "4"], spark=spark) == 0
    json.loads(capsys.readouterr().out)
    assert main([*base, "hnsw-stats"], spark=spark) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["shards"] == 4 and st["over_bound"] == []
    assert sum(st["per_shard"].values()) == st["n_vectors"]
    assert set(map(int, st["per_shard"])) <= {0, 1, 2, 3}

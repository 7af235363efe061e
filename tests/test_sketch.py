"""HyperLogLog sketch: accuracy, partition invariance, empty input."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from h3ray.ops.sketch import (M, RHO_MAX, cm_topk, estimate_from_registers,
                              hll_distinct)


def test_hll_accuracy_within_error_bound(ray_session):
    rng = np.random.default_rng(7)
    # Three keys with very different cardinalities (dups via small ranges).
    vals = {"a": rng.integers(0, 120, 3000),
            "b": rng.integers(0, 20000, 40000),
            "c": np.arange(3)}
    keys = np.concatenate([np.full(v.shape[0], k, dtype=object)
                           for k, v in vals.items()])
    values = np.concatenate([v for v in vals.values()]).astype(np.int64)
    tbl = pa.table({"k": pa.array(list(keys)), "v": pa.array(values)})
    out = hll_distinct(rd.from_arrow(tbl).repartition(8), "k", "v",
                       out_col="est")
    got = dict(zip(out["k"].to_pylist(), out["est"].to_pylist()))
    for k, v in vals.items():
        exact = np.unique(v).shape[0]
        # 1.04/sqrt(4096) ~ 1.6% standard error; allow 5 sigma.
        assert abs(got[k] - exact) <= max(0.09 * exact, 2), (k, got[k], exact)


def test_hll_partition_invariance(ray_session):
    rng = np.random.default_rng(3)
    tbl = pa.table({"k": pa.array(["x"] * 5000),
                    "v": pa.array(rng.integers(0, 2000, 5000),
                                  type=pa.int64())})
    a = hll_distinct(rd.from_arrow(tbl).repartition(2), "k", "v")
    b = hll_distinct(rd.from_arrow(tbl).repartition(16), "k", "v")
    assert a["hll_distinct"].to_pylist() == b["hll_distinct"].to_pylist()


def test_cm_topk_heavy_hitters(ray_session):
    rng = np.random.default_rng(9)
    # One dominant value (10x the runner-up) + a long tail.
    vals = np.concatenate([np.full(5000, 7), np.full(500, 11),
                           rng.integers(100, 400, 3000)]).astype(np.int64)
    rng.shuffle(vals)
    tbl = pa.table({"v": pa.array(vals)})
    out = cm_topk(rd.from_arrow(tbl).repartition(8), "v", k=5)
    got_vals = out["v"].to_pylist()
    got_est = out["est_count"].to_pylist()
    assert got_vals[0] == 7 and got_vals[1] == 11
    # CM never underestimates; with 4 rows x 2048 buckets over ~300
    # distinct values the overestimate is bounded by a few collisions.
    assert got_est[0] >= 5000 and got_est[0] <= 5000 + 100
    assert got_est[1] >= 500 and got_est[1] <= 500 + 100


def test_cm_topk_partition_invariance(ray_session):
    rng = np.random.default_rng(4)
    tbl = pa.table({"v": pa.array(rng.integers(0, 50, 8000),
                                  type=pa.int64())})
    a = cm_topk(rd.from_arrow(tbl).repartition(2), "v", k=10)
    b = cm_topk(rd.from_arrow(tbl).repartition(16), "v", k=10)
    assert a["v"].to_pylist() == b["v"].to_pylist()
    assert a["est_count"].to_pylist() == b["est_count"].to_pylist()


def test_hll_empty_and_register_validation(ray_session):
    empty = pa.table({"k": pa.array([], type=pa.string()),
                      "v": pa.array([], type=pa.int64())})
    out = hll_distinct(rd.from_arrow(empty), "k", "v")
    assert out.num_rows == 0
    assert out.column_names == ["k", "hll_distinct"]
    with pytest.raises(ValueError, match="registers"):
        estimate_from_registers(np.zeros(7, dtype=np.int8))
    # All-empty registers: linear-counting branch with V == M -> estimate 0.
    assert estimate_from_registers(np.zeros(M, dtype=np.int8)) == 0
    # Saturated registers: raw branch, enormous but finite.
    assert estimate_from_registers(
        np.full(M, RHO_MAX, dtype=np.int8)) > 10 ** 9


def test_bottomk_quantiles_accuracy(ray_session):
    from h3ray.ops.sketch import bottomk_quantiles

    rng = np.random.default_rng(11)
    n = 60000
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(np.repeat(["x", "y", "z"], n // 3)),
        "v": pa.array(np.concatenate([
            rng.normal(10, 2, n // 3),          # gaussian
            rng.exponential(5, n // 3),          # skewed
            rng.uniform(-1, 1, n // 3)])),       # uniform
    })
    out = bottomk_quantiles(rd.from_arrow(tbl).repartition(8), "k", "v",
                            "id", [0.5, 0.9], ["p50", "p90"], k=2048)
    df = out.to_pandas().set_index("k")
    import pandas as pd
    full = tbl.to_pandas()
    for key, grp in full.groupby("k"):
        v = np.sort(grp["v"].to_numpy())
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            est = df.loc[key, col]
            # rank of the estimate within the TRUE distribution must sit
            # within ~5 standard errors of q (se ~ sqrt(q(1-q)/2048)).
            rank = np.searchsorted(v, est) / v.shape[0]
            se = np.sqrt(q * (1 - q) / 2048)
            assert abs(rank - q) <= 5 * se, (key, col, rank)


def test_bottomk_quantiles_partition_invariance_and_empty(ray_session):
    from h3ray.ops.sketch import bottomk_quantiles

    rng = np.random.default_rng(5)
    n = 9000
    tbl = pa.table({
        "id": pa.array(rng.permutation(n).astype(np.int64)),
        "k": pa.array(rng.choice(["a", "b"], n)),
        "v": pa.array(rng.normal(0, 1, n)),
    })
    outs = []
    for parts in (1, 4, 13):
        out = bottomk_quantiles(rd.from_arrow(tbl).repartition(parts),
                                "k", "v", "id", [0.25, 0.75],
                                ["q1", "q3"], k=512)
        outs.append(out.to_pandas().sort_values("k").reset_index(drop=True))
    # bit-identical under any blocking: membership depends only on
    # mix64(id), never on arrival order.
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "k": pa.array([], pa.string()),
                      "v": pa.array([], pa.float64())})
    out = bottomk_quantiles(rd.from_arrow(empty), "k", "v", "id",
                            [0.5], ["p50"], k=16)
    assert out.num_rows == 0
    assert out.column_names == ["k", "p50"]


def test_mg_compress_superset_guarantee():
    """Merged Misra-Gries candidates must contain every key with true
    count > n/(k+1), under adversarial chunking."""
    import numpy as np

    from h3ray.ops.sketch import _mg_compress

    rng = np.random.default_rng(7)
    # Zipf-ish stream: a few hot keys over a huge cold tail.
    hot = np.repeat(np.arange(5), [4000, 3000, 2000, 1500, 900])
    cold = rng.integers(100, 100000, 20000)
    stream = np.concatenate([hot, cold])
    rng.shuffle(stream)
    k = 32
    n = stream.shape[0]
    # simulate per-batch partials + one driver merge
    parts = np.array_split(stream, 13)
    keys = np.zeros(0, dtype=np.int64)
    cnts = np.zeros(0, dtype=np.int64)
    for p in parts:
        u, c = np.unique(p, return_counts=True)
        u, c = _mg_compress(u, c.astype(np.int64), k)
        keys = np.concatenate([keys, u])
        cnts = np.concatenate([cnts, c])
    u, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(u.shape[0], dtype=np.int64)
    np.add.at(acc, inv, cnts)
    cand, _ = _mg_compress(u, acc, k)
    true_u, true_c = np.unique(stream, return_counts=True)
    heavy = true_u[true_c > n // (k + 1)]
    assert np.isin(heavy, cand).all()
    assert cand.shape[0] <= k


def test_mg_heavy_hitters_exact_vs_numpy(ray_session, tmp_path):
    """mg_heavy_hitters returns EXACTLY the keys with cnt*den > n, with
    exact counts, on a high-cardinality skewed stream that forces
    compression."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from h3ray.ops.sketch import mg_heavy_hitters

    rng = np.random.default_rng(11)
    hot = np.repeat(np.arange(8), 700)
    cold = rng.integers(1000, 40000, 30000)
    stream = np.concatenate([hot, cold]).astype(np.int64)
    rng.shuffle(stream)
    path = tmp_path / "s.parquet"
    pq.write_table(pa.table({"k": stream}), path)
    n = stream.shape[0]
    den = 100
    out = mg_heavy_hitters(
        lambda: rd.read_parquet(str(path)).repartition(7),
        "k", k=256, total_rows=n, threshold_den=den)
    got = {r["k"]: r["n_rows"] for r in out.to_pylist()}
    u, c = np.unique(stream, return_counts=True)
    want = {int(a): int(b) for a, b in zip(u, c) if b * den > n}
    assert got == want and len(want) >= 5

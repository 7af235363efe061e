"""Round-4 wave-2 ops: bloom pruning, cube/rollup lattice, window dists."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from h3ray.ops.bloom import bloom_build, bloom_prune
from h3ray.ops.reduce import cube_counts, rollup_counts
from h3ray.ops.window import window_rank


def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    rng = np.random.default_rng(7)
    members = np.unique(rng.integers(0, 1 << 40, 5000).astype(np.int64))
    ds = rd.from_arrow(pa.table({"k": members})).repartition(4)
    bits = bloom_build(ds, "k", m_bits=1 << 18, k=4)
    ref = ray.put(bits)

    probe_keys = np.concatenate(
        [members, rng.integers(1 << 41, 1 << 42, 20000).astype(np.int64)])
    probe = rd.from_arrow(pa.table({"k": probe_keys})).repartition(3)
    kept = bloom_prune(probe, "k", ref, m_bits=1 << 18, k=4).to_pandas()

    member_set = set(members.tolist())
    kept_set = kept.k.tolist()
    # Every true member survives (no false negatives, ever).
    assert member_set.issubset(set(kept_set))
    # False-positive rate is in the designed ballpark (<2% at this load).
    fp = len(kept) - len(members)
    assert fp / 20000 < 0.02


def test_bloom_pruned_join_equals_plain_join(ray_session):
    """Pruning before an exact join must not change the join result."""
    from h3ray.ops.join import hash_join

    rng = np.random.default_rng(11)
    right_keys = np.arange(0, 3000, 3, dtype=np.int64)  # every 3rd key
    right = pa.table({"rk": right_keys,
                      "tag": np.arange(right_keys.size, dtype=np.int64)})
    left = pa.table({"lk": rng.integers(0, 3000, 20000).astype(np.int64),
                     "v": rng.integers(0, 100, 20000).astype(np.int64)})

    right_ds = rd.from_arrow(right).repartition(2)
    bits = ray.put(bloom_build(right_ds, "rk", m_bits=1 << 16, k=4))
    pruned = bloom_prune(rd.from_arrow(left).repartition(4), "lk", bits,
                         m_bits=1 << 16, k=4)
    got = hash_join(pruned, right_ds, "lk", "rk").to_pandas() \
        .sort_values(["lk", "v", "tag"]).reset_index(drop=True)
    exp = hash_join(rd.from_arrow(left).repartition(4), right_ds,
                    "lk", "rk").to_pandas() \
        .sort_values(["lk", "v", "tag"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])


def _lattice_df(tbl: pa.Table, sql_groups: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", tbl)
    df = con.execute(
        f"SELECT a, b, COUNT(*) AS num_rows, "
        f"CAST(SUM(v) AS BIGINT) AS sum_value FROM t "
        f"GROUP BY {sql_groups}(a, b)").fetchdf()
    return df.sort_values(["a", "b"], na_position="last") \
        .reset_index(drop=True)


def _norm(t: pa.Table) -> pd.DataFrame:
    return t.to_pandas().sort_values(["a", "b"], na_position="last") \
        .reset_index(drop=True)


def test_cube_and_rollup_match_duckdb(ray_session):
    rng = np.random.default_rng(5)
    tbl = pa.table({
        "a": pa.array(rng.choice(["x", "y", "z"], 4000)),
        "b": pa.array(rng.choice(["p", "q"], 4000)),
        "v": rng.integers(0, 1000, 4000).astype(np.int64)})
    ds = rd.from_arrow(tbl).repartition(5)

    got_cube = _norm(cube_counts(ds, "a", "b", "v"))
    exp_cube = _lattice_df(tbl, "CUBE")
    pd.testing.assert_frame_equal(got_cube, exp_cube, check_dtype=False)
    assert len(got_cube) == 3 * 2 + 3 + 2 + 1

    got_roll = _norm(rollup_counts(ds, "a", "b", "v"))
    exp_roll = _lattice_df(tbl, "ROLLUP")
    pd.testing.assert_frame_equal(got_roll, exp_roll, check_dtype=False)


def test_window_percent_rank_cume_dist_match_pandas(ray_session):
    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "eid": np.arange(2500, dtype=np.int64),
        "part": rng.integers(0, 6, 2500).astype(np.int64),
        "val": np.round(rng.standard_normal(2500), 1),  # heavy ties
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = window_rank(ds, "part", "val", tiebreak_col="eid",
                      dist=True).to_pandas() \
        .sort_values("eid").reset_index(drop=True)

    g = df.groupby("part")["val"]
    n = df.groupby("part")["val"].transform("size")
    rank_min = g.rank(method="min").astype(np.int64)
    exp_pct = np.where(n > 1, (rank_min - 1) / (n - 1), 0.0)
    exp_cume = g.rank(method="max").astype(np.int64) / n
    assert np.array_equal(out.percent_rank.to_numpy(), exp_pct)
    assert np.array_equal(out.cume_dist.to_numpy(), exp_cume.to_numpy())

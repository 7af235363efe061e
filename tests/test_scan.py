"""Distributed prefix scan / sequence packing (h3ray.ops.scan)."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from h3ray.ops import scan


def _table(keys, vals):
    return pa.Table.from_arrays(
        [pa.array(keys, type=pa.int64()), pa.array(vals, type=pa.int64())],
        names=["k", "v"])


def test_global_exclusive_cumsum_matches_reference(ray_session):
    """Two-pass scan == single-machine exclusive cumsum in key order,
    across bucket boundaries, sparse/shuffled keys, and partitions."""
    rng = np.random.default_rng(7)
    keys = rng.permutation(np.arange(0, 5000, 3, dtype=np.int64))  # sparse
    vals = rng.integers(0, 100, keys.shape[0]).astype(np.int64)
    ds = rd.from_arrow(_table(keys, vals)).repartition(9)
    out = scan.global_exclusive_cumsum(
        ds, "k", "v", bucket_width=64).to_pandas().sort_values("k")
    order = np.argsort(keys)
    expected = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    assert np.array_equal(out.excl_cumsum.to_numpy(), expected)
    assert np.array_equal(out.k.to_numpy(), keys[order])
    assert np.array_equal(out.v.to_numpy(), vals[order])  # payload rides


def test_pack_sequences_budget_boundaries(ray_session):
    """pack_id = floor(exclusive running size / budget): docs straddle
    boundaries; a doc starting exactly at a multiple opens the next pack."""
    keys = np.arange(6, dtype=np.int64)
    sizes = np.array([4, 4, 5, 3, 8, 1], dtype=np.int64)
    # exclusive cumsum: 0 4 8 13 16 24 -> //8: 0 0 1 1 2 3
    out = scan.pack_sequences(rd.from_arrow(_table(keys, sizes)),
                              "k", "v", budget=8,
                              bucket_width=2).to_pandas().sort_values("k")
    assert list(out.pack_id) == [0, 0, 1, 1, 2, 3]


def test_scan_rejects_bad_params(ray_session):
    ds = rd.from_arrow(_table([0], [1]))
    with pytest.raises(ValueError, match="bucket_width"):
        scan.global_exclusive_cumsum(ds, "k", "v", bucket_width=0)
    with pytest.raises(ValueError, match="budget"):
        scan.pack_sequences(ds, "k", "v", budget=0)

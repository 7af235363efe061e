"""Partitioned window functions (ops/window.py) vs direct references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from h3ray.ops.window import window_lag_lead, window_rank


def make_events(n=3000, n_parts=7, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "part": rng.integers(0, n_parts, n).astype(np.int64),
        # heavy ties so rank != dense_rank != row_number
        "val": np.round(rng.standard_normal(n), 1),
    })


def test_window_rank_matches_pandas(ray_session):
    df = make_events()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = window_rank(ds, "part", "val", tiebreak_col="eid",
                      descending=True, ntile=4).to_pandas() \
        .sort_values("eid").reset_index(drop=True)

    g = df.sort_values(["part", "val", "eid"],
                       ascending=[True, False, True]).groupby("part")
    exp = df.copy()
    exp["row_number"] = g.cumcount().reindex(
        df.sort_values(["part", "val", "eid"],
                       ascending=[True, False, True]).index).sort_index() + 1
    rn = df.groupby("part")["val"].rank(method="min",
                                        ascending=False).astype(int)
    dr = df.groupby("part")["val"].rank(method="dense",
                                        ascending=False).astype(int)
    assert out.row_number.tolist() == exp.row_number.tolist()
    assert out["rank"].tolist() == rn.tolist()
    assert out.dense_rank.tolist() == dr.tolist()
    # NTILE: per partition, tile sizes differ by at most 1 and are
    # monotone in row_number.
    for p, grp in out.groupby("part"):
        sizes = grp.groupby("ntile_4").size()
        assert sizes.max() - sizes.min() <= 1
        srt = grp.sort_values("row_number")
        assert (np.diff(srt.ntile_4.to_numpy()) >= 0).all()


def test_partitioned_transitions_matches_pandas(ray_session):
    from h3ray.ops.window import partitioned_transitions

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "part": rng.integers(0, 11, n).astype(np.int64),
        "ord": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
        "lab": rng.choice(list("abcde"), n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = partitioned_transitions(ds, "part", "ord", "lab",
                                  tiebreak_col="eid",
                                  prev_col="prev_lab") \
        .to_pandas().groupby(["prev_lab", "lab"], as_index=False)["n"] \
        .sum().sort_values(["prev_lab", "lab"]).reset_index(drop=True)

    s = df.sort_values(["part", "ord", "eid"])
    prev = s.groupby("part")["lab"].shift(1)
    exp = pd.DataFrame({"prev_lab": prev, "lab": s["lab"]}) \
        .dropna().groupby(["prev_lab", "lab"], as_index=False) \
        .size().rename(columns={"size": "n"}) \
        .sort_values(["prev_lab", "lab"]).reset_index(drop=True)
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(out, exp)


def test_window_lag_lead_matches_pandas(ray_session):
    df = make_events(n=2000, n_parts=5, seed=29)
    # non-unique order values force the tiebreak
    df["ts"] = (df.val * 10).astype(np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = window_lag_lead(ds, "part", "ts", "val",
                          tiebreak_col="eid").to_pandas() \
        .sort_values("eid").reset_index(drop=True)

    s = df.sort_values(["part", "ts", "eid"])
    exp_lag = s.groupby("part")["val"].shift(1)
    exp_lead = s.groupby("part")["val"].shift(-1)
    exp = pd.DataFrame({"eid": s.eid, "lag": exp_lag, "lead": exp_lead}) \
        .sort_values("eid").reset_index(drop=True)
    assert np.allclose(out.lag_value.to_numpy(), exp.lag.to_numpy(),
                       equal_nan=True)
    assert np.allclose(out.lead_value.to_numpy(), exp.lead.to_numpy(),
                       equal_nan=True)
    # Exactly one null lag + one null lead per partition.
    assert out.lag_value.isna().sum() == df.part.nunique()
    assert out.lead_value.isna().sum() == df.part.nunique()


def test_kmeans_blocking_invariant_and_assignment(ray_session):
    """Distributed k-means must be bit-deterministic across block
    boundaries (exact integer partial sums): different repartitioning,
    identical centroids; assignment covers all clusters on blobby data."""
    from h3ray.pipelines.ann import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 12)) * 5
    mat = (centers[rng.integers(0, 6, 900)]
           + 0.2 * rng.standard_normal((900, 12))).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(900, dtype=np.int64)),
                    "embedding": pa.array(list(mat))})

    def fit(parts):
        ds = rd.from_arrow(tbl).repartition(parts)
        return kmeans_fit(ds, n_clusters=6, n_iter=4, sample_rows=900)

    c3, c9 = fit(3), fit(9)
    assert np.array_equal(c3, c9)  # bit-identical, not just close
    out = kmeans_assign(rd.from_arrow(tbl).repartition(4), c3).to_pandas()
    assert len(out) == 900
    assert out.cluster.nunique() == 6
    # Blobby data: assignments agree with direct argmax vs the centroids.
    xn = mat.astype(np.float64)
    xn /= np.linalg.norm(xn, axis=1, keepdims=True)
    exp = np.argmax(xn @ c3.T.astype(np.float64), axis=1)
    got = out.sort_values("vec_id").cluster.to_numpy()
    assert (got == exp).all()


def test_kmeans_fit_run_to_run_deterministic(ray_session):
    """Ray's block arrival order under limit+iter_batches varies run to
    run; the fit must still be bit-identical across repeated fits over a
    real parquet read (the emb_kmeans_assign differential oracle re-fits
    and inlines the centroids — any drift would fail the driver hash)."""
    from h3ray.pipelines.ann import kmeans_fit

    def fit():
        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        return kmeans_fit(ds, n_clusters=8, n_iter=3, sample_rows=2048)

    runs = [fit() for _ in range(3)]
    assert np.array_equal(runs[0], runs[1])
    assert np.array_equal(runs[0], runs[2])


def test_ring_smoothed_counts_matches_local(ray_session):
    """Distributed hex box filter == whole-corpus local reference."""
    from h3ray.io import pages as pio
    from h3ray.kernels import grid
    from h3ray.pipelines import geotag

    SF = "/root/testdata/sf0.001"
    out = geotag.ring_smoothed_counts(
        pio.pages_from_documents(SF), res=5, k=1).to_pandas()

    # Local reference: encode all pages, count per cell, gather over disks.
    pages = pio.pages_from_documents(SF).to_pandas()
    from h3ray.kernels import latlng

    lat, lng = pio.geotag(pa.array(pages.url))
    cells = latlng.latlng_to_cell(lat, lng, 5)
    uniq, counts = np.unique(cells, return_counts=True)
    orow, dcell, dist = grid.grid_disk_distances(uniq, 1)
    cnt_map = dict(zip(uniq.tolist(), counts.tolist()))
    smooth: dict = {}
    for r, c in zip(orow, dcell):
        smooth[int(c)] = smooth.get(int(c), 0) + int(counts[r])
    got = {int(np.int64(c)): (int(n), int(s))
           for c, n, s in zip(out.cell, out.num_pages, out.smoothed_pages)}
    exp = {c: (cnt_map.get(c, 0), s) for c, s in smooth.items()}
    assert got == exp
    # Invariant: smoothing never decreases a cell's own count.
    assert (out.smoothed_pages >= out.num_pages).all()

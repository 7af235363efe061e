"""Raster <-> vector (pipelines/raster.py) vs a local NumPy reference."""

import numpy as np
import pyarrow as pa

from h3ray.kernels import bits, latlng
from h3ray.pipelines import raster

W, H = 360, 180  # 1-degree world grid keeps the test fast


def _local_zonal(res: int):
    pix = np.arange(W * H, dtype=np.int64)
    lat, lng = raster.pixel_centers(pix, W, H)
    cells = bits.as_u64(latlng.latlng_to_cell(lat, lng, res))
    vals = raster.raster_values(pix)
    uniq, inv = np.unique(cells, return_inverse=True)
    n = np.bincount(inv).astype(np.int64)
    s = np.zeros(uniq.shape[0], dtype=np.int64)
    np.add.at(s, inv, vals)
    mx = np.full(uniq.shape[0], np.iinfo(np.int64).min)
    np.maximum.at(mx, inv, vals)
    return pix, cells, vals, uniq, n, s, mx


def test_zonal_stats_matches_local_reference(ray_session):
    _, _, _, uniq, n, s, mx = _local_zonal(2)
    zs = raster.zonal_stats(raster.synthetic_raster(W, H), res=2,
                            width=W, height=H)
    assert np.array_equal(
        zs["cell"].to_numpy(zero_copy_only=False).astype(np.uint64), uniq)
    assert zs["n_pixels"].to_pylist() == n.tolist()
    assert zs["sum_value"].to_pylist() == s.tolist()
    assert zs["max_value"].to_pylist() == mx.tolist()
    # every pixel lands in exactly one cell
    assert int(n.sum()) == W * H


def test_cells_to_raster_paints_cell_values(ray_session):
    pix, cells, _, uniq, _, s, _ = _local_zonal(2)
    zs_tbl = pa.table({"cell": pa.array(uniq),
                       "sum_value": pa.array(s)})
    out = raster.cells_to_raster(zs_tbl, res=2, width=W, height=H)
    t = out.take_batch(batch_size=W * H, batch_format="pyarrow")
    assert t.num_rows == W * H
    order = np.argsort(t["pix"].to_numpy(zero_copy_only=False))
    got = t["value"].to_numpy(zero_copy_only=False)[order]
    exp = s[np.searchsorted(uniq, cells)]
    assert np.array_equal(got, exp)
    # row/col addressing is consistent with pix
    rows = t["row"].to_numpy(zero_copy_only=False)[order]
    cols = t["col"].to_numpy(zero_copy_only=False)[order]
    assert np.array_equal(rows * W + cols, np.sort(pix))


def test_cells_to_raster_fill_for_missing_cells(ray_session):
    # paint from a table holding only ONE cell: all other pixels fill
    _, cells, _, uniq, _, s, _ = _local_zonal(2)
    one = pa.table({"cell": pa.array(uniq[:1]),
                    "sum_value": pa.array(s[:1])})
    out = raster.cells_to_raster(one, res=2, width=W, height=H, fill=-7)
    t = out.take_batch(batch_size=W * H, batch_format="pyarrow")
    order = np.argsort(t["pix"].to_numpy(zero_copy_only=False))
    got = t["value"].to_numpy(zero_copy_only=False)[order]
    inside = cells == uniq[0]
    assert np.array_equal(got[inside],
                          np.full(int(inside.sum()), s[0]))
    assert (got[~inside] == -7).all()


def test_zonal_stats_empty_raster(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"pix": pa.array([], pa.int64()),
                                    "value": pa.array([], pa.int64())}))
    zs = raster.zonal_stats(empty, res=2, width=W, height=H)
    assert zs.num_rows == 0
    assert zs.column_names == ["cell", "n_pixels", "sum_value",
                               "max_value"]

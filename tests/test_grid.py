"""Grid traversal tests: fast-vs-safe agreement, counts, geometry."""

import numpy as np
import pytest

from h3ray.kernels import bits, grid, hierarchy, latlng
from h3ray.kernels.constants import DEFAULT_CELL_INDEX, HEX_EDGE_RADS


@pytest.fixture(scope="module")
def base_cells():
    return bits.set_base_cell(
        np.full(122, DEFAULT_CELL_INDEX, dtype=np.int64), np.arange(122))


def test_doctest_neighbors():
    a = np.array([0x8A1FB46622DFFFF], dtype=np.int64)
    b = np.array([0x8A1FB46622D7FFF], dtype=np.int64)
    assert grid.are_neighbor_cells(a, b)[0]
    assert not grid.are_neighbor_cells(a, a)[0]


@pytest.mark.parametrize("res,k", [(0, 1), (0, 3), (1, 2), (2, 1)])
def test_disk_fast_matches_safe(base_cells, res, k):
    cells = base_cells
    for _ in range(res):
        _, cells = hierarchy.cell_to_children(cells, bits.get_resolution(cells[:1])[0] + 1)
    o, c, d = grid.grid_disk_distances(cells, k)
    pent_idx = np.where(bits.is_pentagon(cells))[0]
    sample = np.unique(np.concatenate(
        [pent_idx, np.arange(0, len(cells), max(1, len(cells) // 25))]))
    for s in sample:
        mine = set(zip(c[o == s].tolist(), d[o == s].tolist()))
        sc, sd = grid.grid_disk_safe_single(cells[s], k)
        assert mine == set(zip(sc.tolist(), sd.tolist()))


def test_disk_counts_hexagons():
    cells = latlng.latlng_to_cell(
        np.array([48.8, 37.7, -33.8]), np.array([2.3, -122.4, 151.2]), 8)
    for k in (1, 2, 5):
        o, c, d = grid.grid_disk_distances(cells, k)
        counts = np.bincount(o, minlength=3)
        assert (counts == grid.max_grid_disk_size(k)).all()
        assert bits.is_valid_cell(c).all()


def test_ring_counts_and_closure():
    cells = latlng.latlng_to_cell(
        np.array([48.8, 37.7]), np.array([2.3, -122.4]), 8)
    for k in (1, 2, 4):
        o, c = grid.grid_ring(cells, k)
        assert (np.bincount(o, minlength=2) == 6 * k).all()
        # ring k == disk distance-k subset
        od, cd, dd = grid.grid_disk_distances(cells, k)
        for s in (0, 1):
            assert set(c[o == s].tolist()) == set(cd[(od == s) & (dd == k)].tolist())


def test_disk_geometric_sanity():
    rng = np.random.default_rng(7)
    cells = np.unique(latlng.latlng_to_cell(
        rng.uniform(-85, 85, 500), rng.uniform(-180, 180, 500), 6))
    o, c = grid.grid_ring(cells, 1)
    lat0, lng0 = latlng.cell_to_latlng_rads(cells[o])
    lat1, lng1 = latlng.cell_to_latlng_rads(c)
    sl = np.sin((lat1 - lat0) / 2)
    sg = np.sin((lng1 - lng0) / 2)
    d = 2 * np.arcsin(np.sqrt(sl * sl + np.cos(lat0) * np.cos(lat1) * sg * sg))
    ratio = d / (HEX_EDGE_RADS[6] * np.sqrt(3))
    assert ratio.min() > 0.6 and ratio.max() < 1.3


def test_pentagon_disk_size(base_cells):
    pent = base_cells[bits.is_pentagon(base_cells)]
    o, c, d = grid.grid_disk_distances(pent, 1)
    # A pentagon disk-1 has 6 cells (5 neighbors + itself).
    assert (np.bincount(o, minlength=12) == 6).all()

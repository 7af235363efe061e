"""cellToBoundary tests: vertex counts, neighbor consistency, geometry."""

import numpy as np
import pytest

from h3ray.kernels import bits, boundary, grid, latlng
from h3ray.kernels.constants import DEFAULT_CELL_INDEX, HEX_EDGE_RADS


@pytest.fixture(scope="module")
def corpus_cells(reference_dataset):
    with open(reference_dataset / "cellToBoundary.txt") as f:
        return np.array([int(l, 16) for l in f.read().split()],
                        dtype=np.int64)  # all 118,853 corpus cells


def test_vertex_counts(corpus_cells):
    off, lat, lng = boundary.cell_to_boundary_rads(corpus_cells)
    counts = np.diff(off)
    res = bits.get_resolution(corpus_cells)
    pent = bits.is_pentagon(corpus_cells)
    # Class II hexagons: exactly 6 vertices; class III: 6..10.
    assert (counts[(~pent) & (res % 2 == 0)] == 6).all()
    assert counts.min() >= 5 and counts.max() <= 10
    # Class II pentagons: exactly 5; class III pentagons: 10.
    assert (counts[pent & (res % 2 == 0)] == 5).all()
    assert (counts[pent & (res % 2 == 1)] == 10).all()


def test_vertices_near_center(corpus_cells):
    sub = corpus_cells[:5000]
    off, lat, lng = boundary.cell_to_boundary_rads(sub)
    counts = np.diff(off)
    clat, clng = latlng.cell_to_latlng_rads(sub)
    c_lat = np.repeat(clat, counts)
    c_lng = np.repeat(clng, counts)
    sl = np.sin((lat - c_lat) / 2)
    sg = np.sin((lng - c_lng) / 2)
    d = 2 * np.arcsin(np.sqrt(sl**2 + np.cos(lat) * np.cos(c_lat) * sg**2))
    edge = np.repeat(HEX_EDGE_RADS[bits.get_resolution(sub)], counts)
    ratio = d / edge
    assert ratio.min() > 0.4 and ratio.max() < 1.8


@pytest.mark.parametrize("res", [2, 3, 8, 9])
def test_neighbors_share_edge_vertices(res):
    rng = np.random.default_rng(11)
    cells = np.unique(latlng.latlng_to_cell(
        rng.uniform(-88, 88, 150), rng.uniform(-180, 180, 150), res))
    o, nbr = grid.grid_ring(cells, 1)
    offA, latA, lngA = boundary.cell_to_boundary_rads(cells)
    offB, latB, lngB = boundary.cell_to_boundary_rads(nbr)
    for i in range(len(nbr)):
        a = o[i]
        va = [(latA[p], lngA[p]) for p in range(offA[a], offA[a + 1])]
        vb = [(latB[p], lngB[p]) for p in range(offB[i], offB[i + 1])]
        shared = sum(1 for (x1, y1) in va for (x2, y2) in vb
                     if abs(x1 - x2) < 1e-9 and abs(y1 - y2) < 1e-9)
        # 2 topological vertices; +1 when the shared edge crosses an
        # icosahedron edge (both cells get the same distortion vertex).
        assert shared in (2, 3), (hex(cells[a]), hex(nbr[i]), shared)


def test_pentagon_boundaries_all_res():
    from h3ray.kernels._tables import PENTAGON_BASE_CELLS

    pents = bits.set_base_cell(
        np.full(12, DEFAULT_CELL_INDEX, dtype=np.int64), PENTAGON_BASE_CELLS)
    for r in range(0, 5):
        cells = bits.cell_to_center_child(pents, r)
        off, lat, lng = boundary.cell_to_boundary_rads(cells)
        counts = np.diff(off)
        want = 10 if r % 2 else 5
        assert (counts == want).all(), (r, counts)

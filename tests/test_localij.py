"""Local IJ / grid distance / grid path tests.

Mirrors the reference's exhaustive sweeps (tests/h3/grid_distance.rs,
cell_to_local_ij.rs, local_ij_to_cell.rs, grid_path_cells.rs) using the
BFS disk distances (already conformance-tested) as the oracle.
"""

import numpy as np
import pytest

from h3ray.kernels import bits, grid, localij
from h3ray.kernels.constants import NUM_CELLS_BY_RES


def all_cells(res: int) -> np.ndarray:
    """Every cell at `res` via children expansion of the 122 base cells."""
    from h3ray.kernels import hierarchy
    base = bits.set_unused(
        bits.set_resolution(
            bits.set_base_cell(
                np.full(122, 0x0800_0000_0000_0000, dtype=np.int64),
                np.arange(122, dtype=np.int64)), 0), 0)
    if res == 0:
        return base
    _, out = hierarchy.cell_to_children(base, res)
    return out


# Local IJ is only defined within the same or a *neighboring* base cell
# (src/coord/localij.rs:8-17), so the probe radius must stay inside that
# range: k=1 at res 0 (neighbors only), growing with base-cell diameter.
DISK_K = {0: 1, 1: 2, 2: 4}


@pytest.mark.parametrize("res", [0, 1, 2])
def test_grid_distance_matches_bfs(res):
    cells = all_cells(res)
    # Sample at res 2 to keep runtime bounded; exhaustive at res 0-1.
    if res == 2:
        cells = cells[::7]
    row, nbr, dist = grid.grid_disk_distances(cells, DISK_K[res])
    origins = cells[row]
    got, ok = localij.grid_distance(origins, nbr)
    # grid_distance may legitimately fail near pentagons; where it reports
    # ok, it must equal the BFS ring distance.
    assert (got[ok] == dist[ok]).all()
    # It must succeed for the vast majority of pairs.
    assert ok.mean() > 0.85


@pytest.mark.parametrize("res", [0, 1, 2])
def test_local_ij_roundtrip(res):
    cells = all_cells(res)
    if res == 2:
        cells = cells[::5]
    row, nbr, _ = grid.grid_disk_distances(cells, DISK_K[res])
    anchors = cells[row]
    i, j, ok = localij.cell_to_local_ij(anchors, nbr)
    back, ok2 = localij.local_ij_to_cell(anchors[ok], i[ok], j[ok])
    assert ok2.all()
    assert (back == nbr[ok]).all()
    assert ok.mean() > 0.95


def test_local_ij_self_is_identity():
    cells = all_cells(1)
    i, j, ok = localij.cell_to_local_ij(cells, cells)
    assert ok.all()
    back, ok2 = localij.local_ij_to_cell(cells, i, j)
    assert ok2.all()
    assert (back == cells).all()


def test_grid_distance_neighbors_is_one():
    cells = all_cells(1)
    row, nbr = grid.grid_ring(cells, 1)
    d, ok = localij.grid_distance(cells[row], nbr)
    assert (d[ok] == 1).all()


def test_grid_path_properties():
    rng = np.random.default_rng(7)
    cells = all_cells(2)
    idx = rng.integers(0, cells.shape[0], size=60)
    # Pick destination within disk(4) of origin so paths are defined.
    row, nbr, dist = grid.grid_disk_distances(cells[idx], 4)
    sel = np.flatnonzero(dist == 4)[:40]
    origins = cells[idx][row[sel]]
    dests = nbr[sel]

    prow, pcell, ok = localij.grid_path_cells(origins, dests)
    exp_dist, dok = localij.grid_distance(origins, dests)
    for r in np.flatnonzero(ok):
        path = pcell[prow == r]
        assert path[0] == origins[r]
        assert path[-1] == dests[r]
        assert path.shape[0] == exp_dist[r] + 1
        # Consecutive cells must be neighbors.
        if path.shape[0] > 1:
            adj = grid.are_neighbor_cells(path[:-1], path[1:])
            assert adj.all()
    assert ok.mean() > 0.8


def test_grid_path_self():
    cells = all_cells(1)[:50]
    row, pcell, ok = localij.grid_path_cells(cells, cells)
    assert ok.all()
    assert (pcell == cells).all()
    assert (row == np.arange(50)).all()


def test_doc_example_to_local_ij():
    """Doc example from cell.rs:1474-1481 must succeed."""
    anchor = np.array([0x823147fffffffff], dtype=np.int64)
    index = np.array([0x8230e7fffffffff], dtype=np.int64)
    i, j, ok = localij.cell_to_local_ij(anchor, index)
    assert ok.all()
    back, ok2 = localij.local_ij_to_cell(anchor, i, j)
    assert ok2.all() and back[0] == index[0]

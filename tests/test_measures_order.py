"""Measurement kernels, cell ordering (succ/pred), and child positions."""

import math

import numpy as np
import pytest

from h3ray.kernels import bits, hierarchy, measures
from h3ray.kernels.constants import (
    HEX_EDGE_KM,
    HEX_EDGE_M,
    HEX_EDGE_RADS,
    NUM_CELLS_BY_RES,
)


def all_cells(res: int) -> np.ndarray:
    base = measures.res0_cells()
    if res == 0:
        return base
    return hierarchy.cell_to_children(base, res)[1]


# --- areas -----------------------------------------------------------------

def test_cell_area_doc_values():
    c = np.array([0x8a1fb46622dffff], dtype=np.int64)
    assert abs(measures.cell_area_km2(c)[0] - 0.013407827139722947) <= 1e-11
    assert abs(measures.cell_area_m2(c)[0] - 13407.827139722947) <= 1e-5


def test_res0_areas_sum_to_sphere():
    total = measures.cell_area_rads2(measures.res0_cells()).sum()
    assert abs(total - 4.0 * math.pi) < 1e-12


def test_res1_areas_sum_to_sphere():
    total = measures.cell_area_rads2(all_cells(1)).sum()
    assert abs(total - 4.0 * math.pi) < 1e-11


def test_avg_edge_len_corpus(reference_dataset):
    rows = []
    with open(reference_dataset / "avgEdgeLen.txt") as f:
        for line in f:
            rows.append([float(v) for v in line.strip().split(",")])
    arr = np.array(rows)
    assert np.array_equal(arr[:, 0], HEX_EDGE_RADS)
    assert np.array_equal(arr[:, 1], HEX_EDGE_KM)
    assert np.array_equal(arr[:, 2], HEX_EDGE_M)


def test_great_circle_distance():
    # latlng.rs doc: distance between two known points, plus symmetry.
    d = measures.great_circle_distance_km(
        np.deg2rad([48.8566]), np.deg2rad([2.3522]),
        np.deg2rad([51.5074]), np.deg2rad([-0.1278]))[0]
    assert 330 < d < 350  # Paris <-> London ~343 km
    z = measures.great_circle_distance_rads([0.5], [1.0], [0.5], [1.0])[0]
    assert z == 0.0


def test_pentagons_generator():
    for res in range(16):
        p = measures.pentagons(res)
        assert p.shape[0] == 12
        assert bits.is_pentagon(p).all()
        assert bits.is_valid_cell(p).all()
        assert (bits.get_resolution(p) == res).all()


def test_get_num_cells():
    assert measures.get_num_cells(0) == 122
    assert measures.get_num_cells(15) == NUM_CELLS_BY_RES[15]


# --- succ / pred -----------------------------------------------------------

@pytest.mark.parametrize("res", [0, 1, 2])
def test_succ_walks_all_cells_in_order(res):
    cells = np.sort(all_cells(res))
    assert cells[0] == hierarchy.first_cell(res)
    assert cells[-1] == hierarchy.last_cell(res)
    nxt, ok = hierarchy.succ(cells)
    assert ok[:-1].all() and not ok[-1]
    assert (nxt[:-1] == cells[1:]).all()


@pytest.mark.parametrize("res", [0, 1, 2])
def test_pred_is_succ_inverse(res):
    cells = np.sort(all_cells(res))
    prv, ok = hierarchy.pred(cells)
    assert ok[1:].all() and not ok[0]
    assert (prv[1:] == cells[:-1]).all()


# --- child position --------------------------------------------------------

def test_child_position_doc_values():
    c = np.array([0x8a1fb46622dffff], dtype=np.int64)
    pos, ok = hierarchy.child_position(c, 8)
    assert ok.all() and pos[0] == 24
    _, ok = hierarchy.child_position(c, 12)
    assert not ok.any()


def test_child_at_doc_values():
    c = np.array([0x881fb46623fffff], dtype=np.int64)
    child, ok = hierarchy.child_at(c, [24], 10)
    assert ok.all() and child[0] == 0x8a1fb46622dffff
    _, ok = hierarchy.child_at(c, [24], 5)
    assert not ok.any()


@pytest.mark.parametrize("parent_res,child_res", [(0, 2), (1, 3)])
def test_child_position_roundtrip(parent_res, child_res):
    """child_at(parent, child_position(c)) == c for every cell, and the
    position enumerates children in order."""
    cells = all_cells(child_res)
    parents = bits.cell_to_parent(cells, parent_res)
    pos, ok = hierarchy.child_position(cells, parent_res)
    assert ok.all()
    assert (pos < bits.children_count(parents, child_res)).all()
    back, ok2 = hierarchy.child_at(parents, pos, child_res)
    assert ok2.all()
    assert (back == cells).all()
    # Positions of a parent's children are a permutation of 0..count-1.
    order = np.argsort(parents, kind="stable")
    uniq, starts = np.unique(parents[order], return_index=True)
    counts = np.diff(np.append(starts, parents.shape[0]))
    for s, c in zip(starts[:20], counts[:20]):
        got = np.sort(pos[order][s:s + c])
        assert (got == np.arange(c)).all()

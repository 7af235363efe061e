"""Hierarchy tests: children counts, compact/uncompact invariants."""

import numpy as np
import pytest

from h3ray.kernels import bits, hierarchy, latlng
from h3ray.kernels.constants import DEFAULT_CELL_INDEX, NUM_CELLS_BY_RES


@pytest.fixture(scope="module")
def base_cells():
    return bits.set_base_cell(
        np.full(122, DEFAULT_CELL_INDEX, dtype=np.int64), np.arange(122))


def test_global_cell_counts(base_cells):
    for r in (1, 2):
        _, ch = hierarchy.cell_to_children(base_cells, r)
        assert len(ch) == NUM_CELLS_BY_RES[r]
        assert len(np.unique(ch)) == len(ch)
        assert bits.is_valid_cell(ch).all()


def test_children_counts_match_formula():
    cells = latlng.latlng_to_cell(np.array([48.8]), np.array([2.3]), 4)
    for delta in (1, 2, 3):
        rows, ch = hierarchy.cell_to_children(cells, 4 + delta)
        assert len(ch) == bits.children_count(cells, 4 + delta)[0]
        assert (bits.cell_to_parent(ch, 4) == cells[0]).all()


def test_compact_uncompact_roundtrip(base_cells):
    sel = base_cells[:7]
    _, cells = hierarchy.cell_to_children(sel, 3)
    compacted = hierarchy.compact(cells)
    assert np.array_equal(np.sort(compacted), np.sort(sel))
    _, expanded = hierarchy.uncompact(compacted, 3)
    assert np.array_equal(np.sort(expanded), np.sort(cells))


def test_compact_partial_set():
    cells = latlng.latlng_to_cell(np.array([10.0]), np.array([20.0]), 5)
    _, ch = hierarchy.cell_to_children(cells, 7)
    # Remove one leaf: parent of that leaf cannot compact fully.
    subset = ch[1:]
    compacted = hierarchy.compact(subset)
    _, expanded = hierarchy.uncompact(compacted, 7)
    assert np.array_equal(np.sort(expanded), np.sort(subset))
    assert len(compacted) < len(subset)


def test_compact_mixed_res_raises():
    a = latlng.latlng_to_cell(np.array([10.0]), np.array([20.0]), 5)
    b = latlng.latlng_to_cell(np.array([10.0]), np.array([20.0]), 6)
    with pytest.raises(ValueError):
        hierarchy.compact(np.concatenate([a, b]))


def test_compact_duplicates_raise():
    a = latlng.latlng_to_cell(np.array([10.0, 10.0]), np.array([20.0, 20.0]), 5)
    with pytest.raises(ValueError):
        hierarchy.compact(a)


def test_compact_disk_of_pentagon():
    # compact(children of pentagon) must give back the pentagon.
    pent = bits.set_base_cell(
        np.full(1, DEFAULT_CELL_INDEX, dtype=np.int64), [4])
    _, ch = hierarchy.cell_to_children(pent, 3)
    assert len(ch) == bits.children_count(pent, 3)[0]
    compacted = hierarchy.compact(ch)
    assert np.array_equal(compacted, pent)


def test_uncompact_cells_size_closed_form():
    """uncompactCellsSize == len(uncompact(...)) over a mixed hex+pentagon,
    mixed-resolution compacted set (reference cell.rs:779-810)."""
    import numpy as np

    from h3ray.kernels import latlng

    hexes = latlng.latlng_to_cell(np.array([48.86, 37.77, -33.9]),
                                  np.array([2.35, -122.42, 151.2]), 3)
    pent = np.array([0x8009fffffffffff], dtype=np.int64)  # res-0 pentagon
    cells = np.concatenate([hexes, pent])
    for res in (3, 5, 6):
        _, expanded = hierarchy.uncompact(cells, res)
        assert hierarchy.uncompact_cells_size(cells, res) == len(expanded)
    assert hierarchy.uncompact_cells_size(np.empty(0, np.int64), 5) == 0

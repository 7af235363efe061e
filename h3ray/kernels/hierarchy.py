"""Vectorized H3 hierarchy ops: children expansion, compact, uncompact.

Reference: src/index/cell.rs:684-810 (children/uncompact),
cell.rs:722-766 + 2164-2183 (compact), index/iterator/children.rs.
"""

from __future__ import annotations

import numpy as np

from . import bits


def cell_to_children(cells, child_res: int):
    """Expand each cell to all its children at `child_res`.

    Returns (parent_row, child_bits): flat int64 arrays. Pentagon cells skip
    the K (digit 1) subsequence at every level.
    """
    cells = bits.as_i64(np.asarray(cells))
    res = bits.get_resolution(cells)
    assert (res <= child_res).all(), "child_res must be >= cell resolution"

    rows = np.arange(cells.shape[0], dtype=np.int64)
    cur = cells.copy()
    cur_res = res.copy()
    # Expand level by level; handles mixed input resolutions.
    while (cur_res < child_res).any():
        grow = cur_res < child_res
        keep_rows, keep_cells, keep_res = rows[~grow], cur[~grow], cur_res[~grow]
        g_rows, g_cells, g_res = rows[grow], cur[grow], cur_res[grow]

        pent = bits.is_pentagon(g_cells)
        next_res = g_res + 1
        rep_cells = np.repeat(g_cells, 7)
        rep_rows = np.repeat(g_rows, 7)
        rep_res = np.repeat(next_res, 7)
        digits = np.tile(np.arange(7, dtype=np.int64), g_cells.shape[0])
        children = bits.set_direction(
            bits.set_resolution(rep_cells, rep_res), digits, rep_res)
        drop = np.repeat(pent, 7) & (digits == 1)
        children = children[~drop]
        rep_rows = rep_rows[~drop]
        rep_res = rep_res[~drop]

        rows = np.concatenate([keep_rows, rep_rows])
        cur = np.concatenate([keep_cells, children])
        cur_res = np.concatenate([keep_res, rep_res])
    return rows, cur


def uncompact(cells, res: int):
    """uncompactCells: flat-map children to target res (cell.rs:779-810)."""
    return cell_to_children(cells, res)


def compact(cells) -> np.ndarray:
    """compactCells over a unique, homogeneous-resolution cell set.

    Vectorized bottom-up merge (semantics of cell.rs:722-766): at each level,
    group by parent; parents whose full sibling run is present (7 children,
    6 for pentagons) replace their children; repeat until resolution 0.

    Raises ValueError on duplicate input or heterogeneous resolutions.
    """
    cells = bits.as_i64(np.asarray(cells))
    if cells.size == 0:
        return cells
    res = bits.get_resolution(cells)
    r = int(res[0])
    if (res != r).any():
        raise ValueError("heterogeneous resolutions")
    u = np.unique(cells)
    if u.shape[0] != cells.shape[0]:
        raise ValueError("duplicate input cells")
    return compact_mixed(u)


def compact_mixed(cells) -> np.ndarray:
    """Bottom-up compaction of a set of non-overlapping cells (any mix of
    resolutions). Internal helper for distributed compaction rounds; the
    public `compact` enforces the reference's homogeneous-input contract.
    """
    cells = bits.as_i64(np.asarray(cells))
    if cells.size == 0:
        return cells
    res = bits.get_resolution(cells)
    out = [cells[res == 0]]
    max_res = int(res.max())
    carry = np.empty(0, dtype=np.int64)
    for level in range(max_res, 0, -1):
        cur = np.concatenate([cells[res == level], carry])
        if cur.size == 0:
            carry = cur
            continue
        cur = np.sort(cur)
        parent = bits.cell_to_parent(cur, level - 1)
        uniq, counts = np.unique(parent, return_counts=True)
        need = np.where(bits.is_pentagon(uniq), 6, 7)
        complete = counts == need
        merged_mask = np.repeat(complete, counts)
        out.append(cur[~merged_mask])
        carry = uniq[complete]
        if level == 1 and carry.size:
            out.append(carry)
            carry = np.empty(0, dtype=np.int64)
    if carry.size:
        out.append(carry)
    return np.sort(np.concatenate(out))

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


def uncompact_cells_size(cells, res: int) -> int:
    """uncompactCellsSize closed form (cell.rs:779-810): total number of
    res-`res` children over the cell set — sum of cellToChildrenSize, no
    child materialization (hexagons 7^d; pentagons 1 + 5*(7^d - 1)/6)."""
    arr = np.asarray(cells)
    if arr.size == 0:
        return 0
    return int(bits.children_count(arr, res).sum())


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


# ---------------------------------------------------------------------------
# Cell ordering: succ / pred / first / last (cell.rs:1501-1619)
# ---------------------------------------------------------------------------

_IJ_MASK = np.int64(0o666666666666666)
_CARRY_FILL = np.int64(0o666666666666666)


def _trailing_zeros(x):
    """Vectorized count of trailing zero bits (values < 2^53)."""
    low = (x & -x).astype(np.float64)  # isolate lowest set bit
    _, exp = np.frexp(low)
    return np.where(x == 0, 64, exp - 1)


def first_cell(res: int) -> np.int64:
    """First cell at `res` in index order (cell.rs:1596-1600)."""
    b = bits.set_resolution(np.array([0x0800_0000_0000_0000], np.int64), res)
    return bits.set_unused(b, res)[0]


def last_cell(res: int) -> np.int64:
    """Last cell at `res` in index order (cell.rs:1612-1616)."""
    b = bits.set_resolution(np.array([0x080F_3B6D_B6DB_6DB6], np.int64), res)
    return bits.set_unused(b, res)[0]


def succ(cells):
    """Vectorized next-cell-in-order (cell.rs:1501-1549).

    Returns (next, ok); ok=False where the input is the last cell.
    """
    cells = bits.as_i64(np.asarray(cells))
    res = bits.get_resolution(cells)
    res_off = bits.direction_offset(res)
    work = cells >> res_off

    # First direction digit that is not IJ (6): ++ without carry.
    respos = _trailing_zeros(work ^ _IJ_MASK) // 3
    # Clear digits below the carry point.
    mask = ~((np.int64(1) << (respos * 3)) - 1)
    work &= mask
    out = bits.set_unused(work << res_off, res)

    in_digits = respos < res
    one = np.int64(1) << (res_off + respos * 3)
    cand = out + np.where(in_digits, one, 0)
    # Skip the deleted pentagon K subsequence.
    invalid = in_digits & ~bits.is_valid_cell(cand)
    cand = cand + np.where(invalid, one, 0)

    base = bits.get_base_cell(cells)
    ok = in_digits | (base != 121)
    hop = ~in_digits & (base != 121)
    cand = np.where(hop, bits.set_base_cell(out, base + 1), cand)
    return np.where(ok, cand, 0), ok


def pred(cells):
    """Vectorized previous-cell-in-order (cell.rs:1553-1589)."""
    cells = bits.as_i64(np.asarray(cells))
    res = bits.get_resolution(cells)
    res_off = bits.direction_offset(res)
    work = cells >> res_off

    respos = _trailing_zeros(work) // 3
    mask = (np.int64(1) << (respos * 3)) - 1
    work |= _CARRY_FILL & mask
    out = bits.set_unused(work << res_off, res)

    in_digits = respos < res
    one = np.int64(1) << (res_off + respos * 3)
    cand = out - np.where(in_digits, one, 0)
    invalid = in_digits & ~bits.is_valid_cell(cand)
    cand = cand - np.where(invalid, one, 0)

    base = bits.get_base_cell(cells)
    ok = in_digits | (base != 0)
    hop = ~in_digits & (base != 0)
    cand = np.where(hop, bits.set_base_cell(out, base - 1), cand)
    return np.where(ok, cand, 0), ok


# ---------------------------------------------------------------------------
# Child position (cell.rs:529-671)
# ---------------------------------------------------------------------------

def child_position(cells, parent_res: int):
    """Vectorized childPos: rank among the parent's children (cell.rs:545-599).

    Returns (pos, ok); ok=False where res(cell) < parent_res.
    """
    from .constants import HEXAGON_CHILDREN_COUNTS, PENTAGON_CHILDREN_COUNTS

    cells = bits.as_i64(np.asarray(cells))
    res = bits.get_resolution(cells)
    ok = res >= parent_res
    # The ancestor at the TARGET res picks the formula for every level.
    chain_pent = bits.is_pentagon(
        bits.cell_to_parent(cells, np.minimum(parent_res, res)))
    pos = np.zeros(cells.shape[0], dtype=np.int64)
    max_res = int(res.max()) if cells.size else 0
    for r in range(parent_res + 1, max_res + 1):
        m = ok & (r <= res)
        if not m.any():
            continue
        digit = bits.get_direction(cells, r)
        diff = np.clip(res - r, 0, 15)
        hex_count = HEXAGON_CHILDREN_COUNTS[diff]
        pent_count = PENTAGON_CHILDREN_COUNTS[diff]
        contrib_hex = digit * hex_count
        # Pentagon-chain path: the immediate ancestor (r-1) being a pentagon
        # shifts the digit past the deleted K axis, and slot 0 is the
        # pentagon-children block (cell.rs:556-586).
        par_pent_r = bits.is_pentagon(bits.cell_to_parent(cells, r - 1))
        d = np.where(par_pent_r & (digit > 0), digit - 1, digit)
        count0 = np.where(par_pent_r, pent_count, hex_count)
        contrib_pent = np.where(d == 0, 0, (d - 1) * hex_count + count0)
        pos += np.where(m, np.where(chain_pent, contrib_pent, contrib_hex), 0)
    return np.where(ok, pos, 0), ok


def child_at(cells, positions, child_res: int):
    """Vectorized childPosToCell (cell.rs:621-671).

    Returns (child, ok); ok=False on coarser target res or out-of-range
    position.
    """
    from .constants import HEXAGON_CHILDREN_COUNTS, PENTAGON_CHILDREN_COUNTS

    cells = bits.as_i64(np.asarray(cells))
    position = np.asarray(positions, dtype=np.int64).copy()
    res = bits.get_resolution(cells)
    ok = (child_res >= res) & (position >= 0) & \
        (position < bits.children_count(cells, child_res))

    child = bits.set_resolution(cells, child_res)
    in_pent = bits.is_pentagon(cells)
    max_res = int(res.min()) if cells.size else 0
    for r in range(max_res + 1, child_res + 1):
        m = ok & (r > res)
        if not m.any():
            continue
        diff = child_res - r
        hex_count = HEXAGON_CHILDREN_COUNTS[np.clip(diff, 0, 15)]
        pent_count = PENTAGON_CHILDREN_COUNTS[np.clip(diff, 0, 15)]
        m_pent = m & in_pent
        m_pent_zero = m_pent & (position < pent_count)
        m_pent_exit = m_pent & ~(position < pent_count)
        m_hex = m & ~in_pent
        digit = np.zeros_like(position)
        if m_pent_exit.any():
            pos2 = position - pent_count
            digit = np.where(m_pent_exit, pos2 // hex_count + 2, digit)
            position = np.where(m_pent_exit, pos2 % hex_count, position)
            in_pent = in_pent & ~m_pent_exit
        if m_hex.any():
            digit = np.where(m_hex, position // hex_count, digit)
            position = np.where(m_hex, position % hex_count, position)
        # m_pent_zero: digit stays 0, position unchanged.
        child = np.where(m, bits.set_direction(child, digit, r), child)
    return np.where(ok, child, 0), ok

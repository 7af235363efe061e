"""Directed-edge and vertex index kernels.

Reference: src/index/edge.rs (mode-2 indexes: origin cell + edge 1-6),
src/index/vertex.rs (mode-4 indexes: owner cell + vertex 0-5, canonical
owner = lowest res-cleared index among the three sharing cells),
src/index/cell.rs:866-1027 (edge/vertex constructors, vertex_rotations),
src/direction.rs:163-190 (direction <-> vertex maps).
"""

from __future__ import annotations

import numpy as np

from . import bits, grid
from .boundary import _pentagon_boundary_single, hexagon_boundary_slots
from .constants import (
    EARTH_RADIUS_KM,
    EDGE_OFFSET,
    MODE_CELL,
    MODE_EDGE,
    MODE_VERTEX,
    VERTEX_OFFSET,
)
from ._tables import (
    BC_HOME_FACE,
    BC_IS_PENTAGON,
    FACEIJK_BASE_CELL,
    FACEIJK_BASE_ROT,
    PENTAGON_BASE_CELLS,
    PENTAGON_DIRECTION_FACES,
)
from .latlng import cell_to_faceijk
from .measures import great_circle_distance_rads

# Edge iteration orders, CCW (edge.rs:14-15).
PENTAGON_EDGE_ORDER = np.array([2, 3, 5, 4, 6], dtype=np.int64)
HEXAGON_EDGE_ORDER = np.array([1, 5, 4, 6, 2, 3], dtype=np.int64)

# Directions in CCW order + reverse-direction offsets (cell.rs:137-144, 69).
DIRECTIONS_CCW = np.array([2, 3, 1, 5, 4, 6], dtype=np.int64)  # J JK K IK I IJ
REV_NEIGHBOR_DIRECTIONS_HEX = np.array([5, 3, 4, 1, 0, 2], dtype=np.int64)

# Direction <-> vertex maps (direction.rs:11-27, vertex.rs:12-28).
TO_VERTEX_HEXAGON = np.array([3, 1, 2, 5, 4, 0], dtype=np.int64)  # dir-1
TO_VERTEX_PENTAGON = np.array([1, 2, 4, 3, 0], dtype=np.int64)    # dir-2
TO_DIRECTION_HEXAGON = np.array([6, 2, 3, 1, 5, 4], dtype=np.int64)
TO_DIRECTION_PENTAGON = np.array([6, 2, 3, 5, 4], dtype=np.int64)

# rotation_count(base_cell, face): 60° CCW rotations of the base cell's
# coordinate system on a given face. Derived from the FACE_IJK_BASE_CELLS
# data in first-scan order, exactly how the reference's packed
# BASE_CELL_ROTATIONS table was generated (base_cell.rs:92-100, 215+).
BASE_ROT_BY_FACE = np.full((122, 20), -1, dtype=np.int64)
for _f in range(20):
    for _i in range(3):
        for _j in range(3):
            for _k in range(3):
                _bc = int(FACEIJK_BASE_CELL[_f, _i, _j, _k])
                if BASE_ROT_BY_FACE[_bc, _f] < 0:
                    BASE_ROT_BY_FACE[_bc, _f] = int(
                        FACEIJK_BASE_ROT[_f, _i, _j, _k])

# Pentagon base cell -> index into PENTAGON_DIRECTION_FACES.
_PENT_INDEX = np.full(122, -1, dtype=np.int64)
_PENT_INDEX[PENTAGON_BASE_CELLS] = np.arange(12)


# ---------------------------------------------------------------------------
# Vertex rotations + direction/vertex maps (vectorized)
# ---------------------------------------------------------------------------

def vertex_rotations(cells) -> np.ndarray:
    """CCW rotations applied to the vertex numbering of each cell
    (cell.rs:1641-1681)."""
    cells = bits.as_i64(np.asarray(cells))
    face = cell_to_faceijk(cells)[0]
    base = bits.get_base_cell(cells)
    lead = bits.first_axe(cells)
    rot = BASE_ROT_BY_FACE[base, face].copy()

    pent = BC_IS_PENTAGON[base]
    if pent.any():
        pidx = np.maximum(_PENT_INDEX[base], 0)
        base_face = BC_HOME_FACE[base]
        ik_face = PENTAGON_DIRECTION_FACES[pidx, 5 - 2]
        jk_face = PENTAGON_DIRECTION_FACES[pidx, 3 - 2]
        polar = (base == 4) | (base == 117)
        bump = pent & (face != base_face) & (polar | (face == ik_face))
        rot = np.where(bump, (rot + 1) % 6, rot)
        cw = pent & (lead == 3) & (face == ik_face)
        ccw = pent & (lead == 5) & (face == jk_face)
        rot = np.where(cw, (rot + 5) % 6, rot)
        rot = np.where(ccw, (rot + 1) % 6, rot)
    return rot


def direction_to_vertex(cells, direction) -> np.ndarray:
    """First topological vertex for a neighbor direction
    (direction.rs:163-190)."""
    cells = bits.as_i64(np.asarray(cells))
    direction = np.broadcast_to(np.asarray(direction, dtype=np.int64),
                                cells.shape)
    rot = vertex_rotations(cells)
    pent = bits.is_pentagon(cells)
    hexv = (TO_VERTEX_HEXAGON[np.maximum(direction - 1, 0)] + 6 - rot) % 6
    pentv = (TO_VERTEX_PENTAGON[np.clip(direction - 2, 0, 4)] + 5 - rot) % 5
    return np.where(pent, pentv, hexv)


def vertex_to_direction(cells, vertex) -> np.ndarray:
    """Neighbor direction owning topological vertex (vertex.rs:48-72)."""
    cells = bits.as_i64(np.asarray(cells))
    vertex = np.broadcast_to(np.asarray(vertex, dtype=np.int64), cells.shape)
    rot = vertex_rotations(cells)
    pent = bits.is_pentagon(cells)
    hexd = TO_DIRECTION_HEXAGON[(vertex + rot) % 6]
    pentd = TO_DIRECTION_PENTAGON[(vertex + rot) % 5]
    return np.where(pent, pentd, hexd)


# ---------------------------------------------------------------------------
# Directed edges
# ---------------------------------------------------------------------------

def get_edge(values):
    return (bits.as_i64(values) >> EDGE_OFFSET) & 0x7


def _set_mode(values, mode):
    return (bits.as_i64(values) & ~(np.int64(0xF) << 59)) | (
        np.int64(mode) << 59)


def edge_origin(edges) -> np.ndarray:
    """Origin cell of directed edges (edge.rs:157-160)."""
    e = bits.as_i64(np.asarray(edges))
    return _set_mode(e & ~(np.int64(0x7) << EDGE_OFFSET), MODE_CELL)


def edge_destination(edges) -> np.ndarray:
    """Destination cell (edge.rs:173-182)."""
    origin = edge_origin(edges)
    direction = get_edge(edges)
    dest, _, _ = grid.neighbor_rotations(origin, direction, 0)
    return dest


def direction_for_neighbor(origins, destinations):
    """Direction digit origin->destination, -1 if not neighbors
    (grid/algo.rs:181-200)."""
    origins = bits.as_i64(np.asarray(origins))
    destinations = bits.as_i64(np.asarray(destinations))
    out = np.full(origins.shape[0], -1, dtype=np.int64)
    pent = bits.is_pentagon(origins)
    for d in range(1, 7):
        skip = pent & (d == 1)
        nbr, _, valid = grid.neighbor_rotations(origins, d, 0)
        hit = (out == -1) & valid & ~skip & (nbr == destinations)
        out = np.where(hit, d, out)
    return out


def cells_to_directed_edge(origins, destinations):
    """cellsToDirectedEdge (cell.rs:866-876). Returns (edge, ok)."""
    origins = bits.as_i64(np.asarray(origins))
    d = direction_for_neighbor(origins, destinations)
    ok = d >= 0
    e = _set_mode(origins, MODE_EDGE) | (np.maximum(d, 0) << EDGE_OFFSET)
    return np.where(ok, e, 0), ok


def origin_to_directed_edges(cells):
    """All directed edges per cell, CCW order (cell.rs:889-895).

    Returns (row, edge) flat arrays (5 per pentagon, 6 per hexagon).
    """
    cells = bits.as_i64(np.asarray(cells))
    pent = bits.is_pentagon(cells)
    template = _set_mode(cells, MODE_EDGE)
    rows = []
    edges = []
    n = cells.shape[0]
    idx = np.arange(n)
    for mask, order in ((pent, PENTAGON_EDGE_ORDER),
                        (~pent, HEXAGON_EDGE_ORDER)):
        if not mask.any():
            continue
        t = template[mask]
        r = idx[mask]
        for e in order:
            rows.append(r)
            edges.append(t | (np.int64(e) << EDGE_OFFSET))
    row = np.concatenate(rows)
    edge = np.concatenate(edges)
    order = np.argsort(row, kind="stable")
    return row[order], edge[order]


def edge_reverse(edges) -> np.ndarray:
    """Directed edge with origin/destination swapped (edge.rs:122-130)."""
    origin = edge_origin(edges)
    dest = edge_destination(edges)
    rev, _ = cells_to_directed_edge(dest, origin)
    return rev


def is_valid_directed_edge(values) -> np.ndarray:
    """Vectorized edge-index validation (edge.rs:320-345)."""
    v = bits.as_i64(np.asarray(values))
    ok = bits.get_mode(v) == MODE_EDGE
    cell = edge_origin(v)
    ok &= bits.is_valid_cell(np.where(ok, cell, 0x0800_1FFF_FFFF_FFFF))
    e = get_edge(v)
    min_edge = 1 + bits.is_pentagon(cell)
    ok &= (e >= min_edge) & (e <= 6)
    return ok


def edge_boundary_rads(edges):
    """directedEdgeToBoundary: ragged (offsets, lat, lng) radians
    (edge.rs:200-226): origin-boundary slice [V_start .. V_start+1] with any
    interleaved distortion vertex."""
    edges = bits.as_i64(np.asarray(edges))
    origin = edge_origin(edges)
    direction = get_edge(edges)
    start = direction_to_vertex(origin, direction)
    pent = bits.is_pentagon(origin)
    n = edges.shape[0]
    lats: list[np.ndarray] = []
    lngs: list[np.ndarray] = []
    counts = np.zeros(n, dtype=np.int64)

    hex_rows = np.flatnonzero(~pent)
    if hex_rows.size:
        slat, slng, sok = hexagon_boundary_slots(origin[hex_rows])
        hstart = start[hex_rows]
    hex_data = {}
    for pos, row in enumerate(hex_rows):
        v = int(hstart[pos])
        slots = [2 * v, 2 * v + 1, (2 * v + 2) % 12]
        keep = [s for s in slots if sok[pos, s]]
        hex_data[row] = (slat[pos, keep], slng[pos, keep])
    for row in range(n):
        if pent[row]:
            blat, blng = _pentagon_boundary_single(int(origin[row]))
            res = int(bits.get_resolution(origin[row:row + 1])[0])
            v = int(start[row])
            if res % 2 == 1:  # class III: V-I interleaved, 10 slots
                slots = [2 * v, 2 * v + 1, (2 * v + 2) % 10]
            else:
                slots = [v, (v + 1) % 5]
            la = np.array([blat[s] for s in slots])
            lg = np.array([blng[s] for s in slots])
        else:
            la, lg = hex_data[row]
        lats.append(la)
        lngs.append(lg)
        counts[row] = la.shape[0]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    return offsets, np.concatenate(lats), np.concatenate(lngs)


def edge_length_rads(edges) -> np.ndarray:
    """edgeLengthRads: sum of haversines along the edge boundary
    (edge.rs:228-247)."""
    off, lat, lng = edge_boundary_rads(edges)
    seg = great_circle_distance_rads(lat[:-1], lng[:-1], lat[1:], lng[1:])
    # Zero out the segments that span two edges in the flat layout.
    n = off.shape[0] - 1
    out = np.zeros(n, dtype=np.float64)
    for i in range(n):
        out[i] = seg[off[i]:off[i + 1] - 1].sum()
    return out


def edge_length_km(edges) -> np.ndarray:
    return edge_length_rads(edges) * EARTH_RADIUS_KM


def edge_length_m(edges) -> np.ndarray:
    return edge_length_km(edges) * 1000.0


# ---------------------------------------------------------------------------
# Vertexes
# ---------------------------------------------------------------------------

def get_vertex(values):
    return (bits.as_i64(values) >> VERTEX_OFFSET) & 0x7


def _lt(a, b):
    """CellIndex order comparison, ignoring resolution bits
    (cell.rs:1845-1862)."""
    return bits.clr_resolution(a) < bits.clr_resolution(b)


def cell_to_vertex(cells, vertex) -> tuple[np.ndarray, np.ndarray]:
    """cellToVertex: canonical vertex index (cell.rs:912-1006).

    Returns (vertex_index, ok); ok=False for out-of-range vertex numbers.
    """
    cells = bits.as_i64(np.asarray(cells))
    n = cells.shape[0]
    vertex = np.broadcast_to(np.asarray(vertex, dtype=np.int64), (n,))
    pent = bits.is_pentagon(cells)
    vc = np.where(pent, 5, 6)
    ok = vertex < vc
    res = bits.get_resolution(cells)

    owner = cells.copy()
    owner_vertex = vertex.copy()

    last_digit = bits.get_direction(cells, np.maximum(res, 1))
    check = ok & ((res == 0) | (last_digit != 0))
    if check.any():
        left = vertex_to_direction(cells, vertex % vc)
        left_cell, left_rot, _ = grid.neighbor_rotations(cells, left, 0)
        m_left = check & _lt(left_cell, owner)
        owner = np.where(m_left, left_cell, owner)

        left_last = bits.get_direction(left_cell, np.maximum(res, 1))
        check_r = check & ((res == 0) | (left_last != 0))
        m_right = np.zeros(n, dtype=bool)
        if check_r.any():
            right_vertex = (vertex + vc - 1) % vc
            right = vertex_to_direction(cells, right_vertex)
            right_cell, right_rot, _ = grid.neighbor_rotations(cells, right, 0)
            m_right = check_r & _lt(right_cell, owner)
            if m_right.any():
                owner = np.where(m_right, right_cell, owner)
                own_pent = bits.is_pentagon(owner)
                d_pent = direction_for_neighbor(owner, cells)
                off = (REV_NEIGHBOR_DIRECTIONS_HEX[
                    np.clip(right - 1, 0, 5)] + right_rot) % 6
                d_hex = DIRECTIONS_CCW[off]
                d = np.where(own_pent, np.maximum(d_pent, 1), d_hex)
                ov = direction_to_vertex(owner, d)
                owner_vertex = np.where(m_right, ov, owner_vertex)

        m_left_final = check & (owner == left_cell) & ~m_right
        if m_left_final.any():
            own_pent = bits.is_pentagon(owner)
            d_pent = direction_for_neighbor(owner, cells)
            off = (REV_NEIGHBOR_DIRECTIONS_HEX[
                np.clip(left - 1, 0, 5)] + left_rot) % 6
            d_hex = DIRECTIONS_CCW[off]
            d = np.where(own_pent, np.maximum(d_pent, 1), d_hex)
            own_vc = np.where(bits.is_pentagon(owner), 5, 6)
            ov = (direction_to_vertex(owner, d) + 1) % own_vc
            owner_vertex = np.where(m_left_final, ov, owner_vertex)

    out = _set_mode(owner, MODE_VERTEX) | (owner_vertex << VERTEX_OFFSET)
    return np.where(ok, out, 0), ok


def cell_to_vertexes(cells):
    """All vertex indexes per cell (cell.rs:1009-1027).

    Returns (row, vertex_index) flat arrays (5 per pentagon, 6 per hexagon).
    """
    cells = bits.as_i64(np.asarray(cells))
    n = cells.shape[0]
    pent = bits.is_pentagon(cells)
    rows = []
    outs = []
    idx = np.arange(n)
    for v in range(6):
        m = (~pent) | (v < 5)
        vi, ok = cell_to_vertex(cells[m], v)
        rows.append(idx[m][ok])
        outs.append(vi[ok])
    row = np.concatenate(rows)
    out = np.concatenate(outs)
    order = np.argsort(row, kind="stable")
    return row[order], out[order]


def vertex_owner(vertexes) -> np.ndarray:
    v = bits.as_i64(np.asarray(vertexes))
    return _set_mode(v & ~(np.int64(0x7) << VERTEX_OFFSET), MODE_CELL)


def vertex_to_latlng_rads(vertexes):
    """vertexToLatLng (vertex.rs:247-265): the owner-boundary vertex."""
    vertexes = bits.as_i64(np.asarray(vertexes))
    owner = vertex_owner(vertexes)
    vnum = get_vertex(vertexes)
    pent = bits.is_pentagon(owner)
    n = vertexes.shape[0]
    lat = np.zeros(n)
    lng = np.zeros(n)
    hex_rows = np.flatnonzero(~pent)
    if hex_rows.size:
        slat, slng, _ = hexagon_boundary_slots(owner[hex_rows])
        lat[hex_rows] = slat[np.arange(hex_rows.size), 2 * vnum[hex_rows]]
        lng[hex_rows] = slng[np.arange(hex_rows.size), 2 * vnum[hex_rows]]
    for row in np.flatnonzero(pent):
        blat, blng = _pentagon_boundary_single(int(owner[row]))
        res = int(bits.get_resolution(owner[row:row + 1])[0])
        pos = 2 * int(vnum[row]) if res % 2 == 1 else int(vnum[row])
        lat[row] = blat[pos]
        lng[row] = blng[pos]
    return lat, lng


def vertex_to_latlng(vertexes):
    lat, lng = vertex_to_latlng_rads(vertexes)
    return np.rad2deg(lat), np.rad2deg(lng)


def is_valid_vertex(values) -> np.ndarray:
    """Recreate-and-compare canonicality check (vertex.rs:216-245)."""
    v = bits.as_i64(np.asarray(values))
    ok = bits.get_mode(v) == MODE_VERTEX
    owner = vertex_owner(v)
    ok &= bits.is_valid_cell(np.where(ok, owner, 0x0800_1FFF_FFFF_FFFF))
    vnum = get_vertex(v)
    safe_owner = np.where(ok, owner, 0x0800_1FFF_FFFF_FFFF)
    canonical, cok = cell_to_vertex(safe_owner, vnum)
    return ok & cok & (canonical == v)


def is_valid_index(values) -> np.ndarray:
    """Tri-mode validity (lib.rs:341-354): cell, directed edge, or vertex."""
    v = bits.as_i64(np.asarray(values))
    mode = bits.get_mode(v)
    out = np.zeros(v.shape[0], dtype=bool)
    m_cell = mode == MODE_CELL
    if m_cell.any():
        out |= m_cell & bits.is_valid_cell(v)
    m_edge = mode == MODE_EDGE
    if m_edge.any():
        out |= m_edge & is_valid_directed_edge(v)
    m_vert = mode == MODE_VERTEX
    if m_vert.any():
        out |= m_vert & is_valid_vertex(v)
    return out

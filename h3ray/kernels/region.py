"""Polygon-to-cells tiling (polygonToCells) and point-in-polygon predicates.

From-scratch NumPy implementation of the reference tiler algorithm
(src/geom/tiler.rs): trace ring outlines by sampling segments at
pentagon-diameter steps, buffer with 1-ring neighbors, apply the containment
predicate, seed the outermost inner layer, then propagate inward
generation-by-generation with no further point-in-polygon checks.

Containment modes mirror ContainmentMode (tiler.rs:420-461):
  - "centroid"  (ContainsCentroid): cell centroid inside the polygon.
  - "boundary"  (ContainsBoundary): cell fully covered by the polygon.
  - "intersects"(IntersectsBoundary): cell area intersects the polygon.
  - "covers"    (Covers): intersects + the geometry-within-one-cell case.

Transmeridian polygons (arc > 180°, tiler.rs:735-739) are handled by shifting
longitudes into a continuous [0, 2π) frame (shift_transmeridian_ring,
tiler.rs:820-825) and running every predicate in that frame — equivalent to
the reference's split-at-antimeridian + per-half relate.

Geometry model: a "geometry" is a list of polygons; each polygon is a list of
rings; each ring an (k, 2) float64 array of [lng, lat] (radians internally).
Ring 0 is the exterior, the rest are holes.
"""

from __future__ import annotations

import json
import math

import numpy as np

from . import bits, grid, latlng
from .boundary import cell_to_boundary_rads

TWO_PI = 2.0 * math.pi

# Pentagon diameter / area per resolution — the maximally-distorted cell size,
# used for segment-sampling density and size estimates (tiler.rs:597-730).
PENT_DIAMETER_RADS = np.array([
    0.32549355508382627, 0.11062000431697926, 0.0431531246375496,
    0.015280278825461551, 0.006095981694441515, 0.00217237586248339,
    0.0008694532999397082, 0.0003101251537809772, 0.00012417902430910614,
    0.00004429922220615181, 0.00001773927716796858, 0.000006328371112691009,
    0.0000025341705472716865, 0.0000009040511973807097,
    0.00000036202412300873475, 0.00000012915013523209886,
])
PENT_AREA_RADS2 = np.array([
    0.05505118472518226, 0.006358420186890303, 0.0009676234334810151,
    0.00012132336301389888, 0.000019309418286620768, 0.0000024521770265310696,
    0.0000003928026439666205, 0.00000004997535264470275,
    0.000000008012690511075445, 0.0000000010197039091132572,
    0.00000000016351353999538285, 0.000000000020809697203105007,
    0.000000000003336979666606075, 0.0000000000004246859893033221,
    0.00000000000006810153522091642, 0.000000000000008667056198238203,
])


def haversine_rads(lat1, lng1, lat2, lng2):
    """Great-circle distance in radians (src/coord/latlng.rs:170-184)."""
    sl = np.sin((lat2 - lat1) * 0.5)
    sg = np.sin((lng2 - lng1) * 0.5)
    h = sl * sl + np.cos(lat1) * np.cos(lat2) * sg * sg
    return 2.0 * np.arctan2(np.sqrt(h), np.sqrt(1.0 - h))


# ---------------------------------------------------------------------------
# Geometry preparation
# ---------------------------------------------------------------------------

def _is_transmeridian(ring: np.ndarray) -> bool:
    """Arc > 180° heuristic on consecutive longitudes (tiler.rs:735-739)."""
    x = ring[:, 0]
    return bool((np.abs(np.diff(x)) > math.pi).any())


def prepare_geometry(polygons, degrees: bool = True,
                     transmeridian_heuristic: bool = True) -> dict:
    """Validate + normalize a geometry into the broadcastable dict form.

    Args:
        polygons: list of polygons; each polygon a list of rings; each ring a
            (k, 2) array-like of [lng, lat]. Rings must be closed (first ==
            last) with >= 4 coordinates (tiler.rs:804-812).

    Returns a plain-dict (picklable, ray.put-able) prepared geometry:
        {"polys": [[ring arrays (radians, shifted)]], "shifted": [bool], ...}
    """
    out_polys = []
    shifted_flags = []
    for poly in polygons:
        rings = []
        for ring in poly:
            r = np.asarray(ring, dtype=np.float64)
            if r.ndim != 2 or r.shape[1] != 2 or r.shape[0] < 4:
                raise ValueError("invalid ring (not enough coordinates)")
            if not np.isfinite(r).all():
                raise ValueError("non-finite ring coordinate")
            if degrees:
                r = np.deg2rad(r)
            if (np.abs(r[:, 0]) > TWO_PI).any() or \
                    (np.abs(r[:, 1]) > math.pi).any():
                raise ValueError("coordinate out of range")
            rings.append(r)
        shifted = transmeridian_heuristic and _is_transmeridian(rings[0])
        if shifted:
            rings = [np.stack([np.where(r[:, 0] < 0, r[:, 0] + TWO_PI,
                                        r[:, 0]), r[:, 1]], axis=1)
                     for r in rings]
        out_polys.append(rings)
        shifted_flags.append(shifted)
    bboxes = [[(r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max())
               for r in rings] for rings in out_polys]
    return {"polys": out_polys, "shifted": shifted_flags, "bboxes": bboxes}


def geometry_from_geojson(obj, transmeridian_heuristic: bool = True) -> dict:
    """Prepared geometry from a GeoJSON Feature / Polygon / MultiPolygon."""
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    if obj.get("type") == "Feature":
        obj = obj["geometry"]
    if obj["type"] == "Polygon":
        polys = [obj["coordinates"]]
    elif obj["type"] == "MultiPolygon":
        polys = obj["coordinates"]
    else:
        raise ValueError(f"unsupported GeoJSON type {obj['type']}")
    return prepare_geometry(
        [[np.asarray(ring, dtype=np.float64) for ring in poly]
         for poly in polys],
        transmeridian_heuristic=transmeridian_heuristic)


def _shift_lng(lng, shifted: bool):
    if not shifted:
        return lng
    return np.where(lng < 0, lng + TWO_PI, lng)


# ---------------------------------------------------------------------------
# Point-in-ring (winding number with boundary detection)
# ---------------------------------------------------------------------------

def _ring_coord_pos(px, py, ring: np.ndarray):
    """Winding-number position of points vs a closed ring.

    Returns (inside, on_boundary) bool arrays. Mirrors geo's
    coord_pos_relative_to_ring used by ring_contains_centroid
    (tiler.rs:881-908): nonzero winding rule + exact on-segment detection.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    n = px.shape[0]
    m = ax.shape[0]
    wn = np.zeros(n, dtype=np.int64)
    on = np.zeros(n, dtype=bool)
    # Chunk the (points x segments) broadcast to bound memory.
    step = max(1, int(4_000_000 // max(m, 1)))
    for s in range(0, n, step):
        e = min(n, s + step)
        qx = px[s:e, None]
        qy = py[s:e, None]
        orient = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        on_seg = (orient == 0.0) & \
            (qx >= np.minimum(ax, bx)) & (qx <= np.maximum(ax, bx)) & \
            (qy >= np.minimum(ay, by)) & (qy <= np.maximum(ay, by))
        up = (ay <= qy) & (by > qy) & (orient > 0.0)
        down = (ay > qy) & (by <= qy) & (orient < 0.0)
        wn[s:e] = (up.sum(axis=1) - down.sum(axis=1))
        on[s:e] = on_seg.any(axis=1)
    return (wn != 0) & ~on, on


def _ring_contains(px, py, ring, bbox):
    """ring_contains_centroid (tiler.rs:881-908): bbox prefilter, winding
    test, northward nudge when exactly on the boundary."""
    x0, y0, x1, y1 = bbox
    cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
    out = np.zeros(px.shape[0], dtype=bool)
    if not cand.any():
        return out
    inside, on = _ring_coord_pos(px[cand], py[cand], ring)
    if on.any():
        nudged, non = _ring_coord_pos(px[cand][on], py[cand][on] +
                                      np.finfo(np.float64).eps, ring)
        inside[on] = nudged & ~non
    out[cand] = inside
    return out


def contains_points(geom: dict, lat, lng, degrees: bool = False):
    """Vectorized ContainsCentroid predicate over (lat, lng) points.

    Point is contained when inside some polygon's exterior and none of that
    polygon's holes (tiler.rs:524-545).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if degrees:
        lat = np.deg2rad(lat)
        lng = np.deg2rad(lng)
    out = np.zeros(lat.shape[0], dtype=bool)
    for rings, shifted, bboxes in zip(geom["polys"], geom["shifted"],
                                      geom["bboxes"]):
        px = _shift_lng(lng, shifted)
        hit = _ring_contains(px, lat, rings[0], bboxes[0])
        for hole, hb in zip(rings[1:], bboxes[1:]):
            if hit.any():
                hit &= ~_ring_contains(px, lat, hole, hb)
        out |= hit
    return out


# ---------------------------------------------------------------------------
# Cell-boundary vs polygon relate (intersects / covers)
# ---------------------------------------------------------------------------

def _segments_relate(cax, cay, cbx, cby, pax, pay, pbx, pby):
    """Pairwise segment relations: returns (any_intersect, any_proper).

    cell segments (nc,) vs polygon segments (mp,), full broadcast.
    """
    cax = cax[:, None]
    cay = cay[:, None]
    cbx = cbx[:, None]
    cby = cby[:, None]
    d1 = (pbx - pax) * (cay - pay) - (pby - pay) * (cax - pax)
    d2 = (pbx - pax) * (cby - pay) - (pby - pay) * (cbx - pax)
    d3 = (cbx - cax) * (pay - cay) - (cby - cay) * (pax - cax)
    d4 = (cbx - cax) * (pby - cay) - (cby - cay) * (pbx - cax)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & \
             (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    # Touch: collinear endpoint within the other's bbox.
    def _on(d, qx, qy, sx0, sy0, sx1, sy1):
        return (d == 0) & (qx >= np.minimum(sx0, sx1)) & \
            (qx <= np.maximum(sx0, sx1)) & (qy >= np.minimum(sy0, sy1)) & \
            (qy <= np.maximum(sy0, sy1))
    touch = _on(d1, cax, cay, pax, pay, pbx, pby) | \
        _on(d2, cbx, cby, pax, pay, pbx, pby) | \
        _on(d3, pax, pay, cax, cay, cbx, cby) | \
        _on(d4, pbx, pby, cax, cay, cbx, cby)
    inter = proper | touch
    return inter.any(), proper.any()


def _cell_vertices_in_frame(cells, geom_center_lng):
    """Cell boundaries as ragged vertex arrays, each cell unwrapped to be
    continuous and placed in the 2π-window nearest `geom_center_lng`."""
    off, vlat, vlng = cell_to_boundary_rads(cells)
    # Unwrap each cell's vertex longitudes around its first vertex.
    out_lng = vlng.copy()
    for idx in range(cells.shape[0]):
        s, e = off[idx], off[idx + 1]
        seg = vlng[s:e]
        ref = seg[0]
        seg = np.where(seg - ref > math.pi, seg - TWO_PI,
                       np.where(ref - seg > math.pi, seg + TWO_PI, seg))
        mid = seg.mean()
        shift = np.round((geom_center_lng - mid) / TWO_PI) * TWO_PI
        out_lng[s:e] = seg + shift
    return off, vlat, out_lng


def relate_cells(geom: dict, cells) -> tuple[np.ndarray, np.ndarray]:
    """(intersects, covers) of the geometry vs each cell's boundary polygon.

    Mirrors the PreparedGeometry relate predicate (tiler.rs:546-560):
    intersects = any sharing of points; covers = geometry covers the cell.
    """
    cells = bits.as_i64(np.asarray(cells))
    n = cells.shape[0]
    intersects = np.zeros(n, dtype=bool)
    covers = np.zeros(n, dtype=bool)

    for rings, shifted, bboxes in zip(geom["polys"], geom["shifted"],
                                      geom["bboxes"]):
        center = 0.5 * (bboxes[0][0] + bboxes[0][2])
        off, vlat, vlng = _cell_vertices_in_frame(cells, center)
        # Vertex-in-polygon tests for all cell vertices at once.
        v_in_ext = _ring_contains(vlng, vlat, rings[0], bboxes[0])
        _, v_on = _ring_coord_pos(vlng, vlat, rings[0])
        v_in_hole = np.zeros_like(v_in_ext)
        for hole, hb in zip(rings[1:], bboxes[1:]):
            v_in_hole |= _ring_contains(vlng, vlat, hole, hb)
            _, hon = _ring_coord_pos(vlng, vlat, hole)
            v_on |= hon
        v_in_poly = (v_in_ext & ~v_in_hole) | v_on

        pax = np.concatenate([r[:-1, 0] for r in rings])
        pay = np.concatenate([r[:-1, 1] for r in rings])
        pbx = np.concatenate([r[1:, 0] for r in rings])
        pby = np.concatenate([r[1:, 1] for r in rings])

        bb = bboxes[0]
        for idx in range(n):
            s, e = off[idx], off[idx + 1]
            cx = vlng[s:e]
            cy = vlat[s:e]
            x0, x1 = cx.min(), cx.max()
            y0, y1 = cy.min(), cy.max()
            if x1 < bb[0] or x0 > bb[2] or y1 < bb[1] or y0 > bb[3]:
                continue
            cin = v_in_poly[s:e]
            cbx = np.roll(cx, -1)
            cby = np.roll(cy, -1)
            inter, proper = _segments_relate(cx, cy, cbx, cby,
                                             pax, pay, pbx, pby)
            # Polygon vertex strictly inside / touching the cell?
            nearby = (pax >= x0 - 1e-9) & (pax <= x1 + 1e-9) & \
                (pay >= y0 - 1e-9) & (pay <= y1 + 1e-9)
            if nearby.any():
                ring_c = np.stack([np.append(cx, cx[0]),
                                   np.append(cy, cy[0])], axis=1)
                p_in_c, p_on_c = _ring_coord_pos(pax[nearby], pay[nearby],
                                                 ring_c)
                any_p_in = bool(p_in_c.any())
                any_p_touch = any_p_in or bool(p_on_c.any())
            else:
                any_p_in = False
                any_p_touch = False
            hit = bool(cin.any()) or inter or any_p_touch
            intersects[idx] |= hit
            covers[idx] |= hit and bool(cin.all()) and not proper \
                and not any_p_in
    return intersects, covers


# ---------------------------------------------------------------------------
# Outline tracing
# ---------------------------------------------------------------------------

def _sample_ring_cells(ring: np.ndarray, res: int) -> np.ndarray:
    """get_edge_cells (tiler.rs:597-636): sample every segment at
    pentagon-diameter steps and encode each sample point."""
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    dist = haversine_rads(ay, ax, by, bx)
    counts = np.maximum(np.ceil(dist / PENT_DIAMETER_RADS[res]), 1.0)
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    seg = np.repeat(np.arange(ax.shape[0]), counts)
    # Per-sample index within its segment.
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    i = np.arange(total) - starts[seg]
    cnt = counts[seg].astype(np.float64)
    fi = i.astype(np.float64)
    inv = 1.0 / cnt
    lat = ay[seg] * (cnt - fi) * inv + by[seg] * fi * inv
    lng = ax[seg] * (cnt - fi) * inv + bx[seg] * fi * inv
    return latlng.latlng_rads_to_cell(lat, lng, res)


def _disk1(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell + immediate neighbors per row (geom/mod.rs:28-52)."""
    return grid.grid_disk_distances(cells, 1)[:2]


def _planar_centroid(geom: dict) -> tuple[float, float]:
    """Area-weighted centroid of the geometry (geo::Centroid semantics),
    for the Covers geometry-within-one-cell case (tiler.rs:227-238)."""
    num_x = num_y = den = 0.0
    for rings, shifted in zip(geom["polys"], geom["shifted"]):
        for ri, ring in enumerate(rings):
            x = ring[:-1, 0]
            y = ring[:-1, 1]
            x2 = ring[1:, 0]
            y2 = ring[1:, 1]
            cross = x * y2 - x2 * y
            a = cross.sum() * 0.5
            if abs(a) < 1e-300:
                continue
            cx = ((x + x2) * cross).sum() / (6.0 * a)
            cy = ((y + y2) * cross).sum() / (6.0 * a)
            sign = 1.0 if ri == 0 else -1.0
            w = sign * abs(a)
            num_x += cx * w
            num_y += cy * w
            den += w
    if den == 0.0:
        ring = geom["polys"][0][0]
        return float(ring[:, 1].mean()), float(ring[:, 0].mean())
    lng = num_x / den
    if lng > math.pi:
        lng -= TWO_PI
    return num_y / den, lng


def polygon_to_cells(geom: dict, res: int, mode: str = "centroid",
                     annotated: bool = False):
    """polygonToCells: covering cell set of a prepared geometry.

    Mirrors Tiler::into_annotated_coverage (tiler.rs:170-296). Returns an
    int64 cell array, or (cells, fully_contained) when annotated=True.
    Modes (ContainmentMode, tiler.rs:423-461): "centroid", "boundary"
    (cell fully inside), "intersects", "covers".
    """
    if mode not in ("centroid", "boundary", "intersects", "covers"):
        # An unknown string would silently take the intersects path.
        raise ValueError(f"unknown containment mode {mode!r}")
    res = int(res)

    def predicate(cands: np.ndarray):
        if mode == "centroid":
            clat, clng = latlng.cell_to_latlng_rads(cands)
            m = contains_points(geom, clat, clng)
            return m, np.ones_like(m)
        inter, cov = relate_cells(geom, cands)
        return inter, cov

    # 1. Outline tracing + 1-ring buffer + predicate (tiler.rs:299-340).
    sampled = []
    for rings in geom["polys"]:
        for ring in rings:
            sampled.append(_sample_ring_cells(ring, res))
    sampled = np.unique(np.concatenate(sampled)) if sampled else \
        np.empty(0, np.int64)
    if sampled.size:
        _, buffered = _disk1(sampled)
        buffered = np.unique(buffered)
        is_match, fully = predicate(buffered)
        outlines = buffered[is_match]
        out_fully = fully[is_match]
        seen = buffered  # all tested candidates, matching or not
    else:
        outlines = np.empty(0, np.int64)
        out_fully = np.empty(0, bool)
        seen = np.empty(0, np.int64)

    if outlines.size == 0 and mode == "covers":
        clat, clng = _planar_centroid(geom)
        cell = latlng.latlng_rads_to_cell(np.array([clat]), np.array([clng]),
                                          res)
        return (cell, np.zeros(1, bool)) if annotated else cell

    # 2. Outermost inner layer (tiler.rs:569-594).
    if outlines.size:
        _, nbrs = _disk1(outlines)
        nbrs = np.unique(nbrs)
        fresh = nbrs[~np.isin(nbrs, seen)]
        seen = np.union1d(seen, nbrs)
        if fresh.size:
            is_match, fully = predicate(fresh)
            candidates = fresh[is_match]
            cand_fully = fully[is_match]
        else:
            candidates = np.empty(0, np.int64)
            cand_fully = np.empty(0, bool)
    else:
        candidates = np.empty(0, np.int64)
        cand_fully = np.empty(0, bool)

    if mode == "boundary":
        outlines = outlines[out_fully]
        out_fully = out_fully[out_fully]
        candidates = candidates[cand_fully]
        cand_fully = cand_fully[cand_fully]

    # 3. Inward generational propagation, no PIP needed (tiler.rs:254-295).
    parts = [outlines, candidates]
    fparts = [out_fully, cand_fully]
    gen = candidates
    while gen.size:
        _, nbrs = _disk1(gen)
        nbrs = np.unique(nbrs)
        fresh = nbrs[~np.isin(nbrs, seen)]
        seen = nbrs  # generational swap (tiler.rs:283-290)
        gen = fresh
        if fresh.size:
            parts.append(fresh)
            fparts.append(np.ones(fresh.size, bool))
    cells = np.concatenate(parts)
    fully_arr = np.concatenate(fparts) if cells.size else np.empty(0, bool)
    if annotated:
        return cells, fully_arr
    return cells


def coverage_size_hint(geom: dict, res: int) -> int:
    """maxPolygonToCellsSize (tiler.rs:114-144)."""
    total = 0
    for rings, bboxes in zip(geom["polys"], geom["bboxes"]):
        x0, y0, x1, y1 = bboxes[0]
        diagonal = haversine_rads(y0, x0, y1, x1)
        d1 = abs(x0 - x1)
        d2 = abs(y0 - y1)
        width, length = (d1, d2) if d1 < d2 else (d2, d1)
        if width == 0.0:
            est = 1
        else:
            area = (diagonal * diagonal) / (length / width)
            est = max(int(math.ceil(area / PENT_AREA_RADS2[res])), 1)
        verts = sum(r.shape[0] - 1 for r in rings)
        total += max(est, verts) + 12
    return total


def candidate_cells(geom: dict, res: int) -> np.ndarray:
    """Superset of all cells whose area intersects the geometry, without the
    expensive prepared-relate predicate.

    Union of (a) the traced+1-ring-buffered ring outline cells — every cell
    the ring lines pass through or touch (sampling step = pentagon diameter,
    tiler.rs:597-636) — and (b) the centroid-mode coverage — every interior
    cell (a fully-interior cell contains its own centroid). Used as the
    candidate set for exact point-in-polygon joins: any point inside the
    geometry lies in one of these cells.
    """
    res = int(res)
    sampled = []
    for rings in geom["polys"]:
        for ring in rings:
            sampled.append(_sample_ring_cells(ring, res))
    parts = [polygon_to_cells(geom, res, "centroid")]
    if sampled:
        outline = np.unique(np.concatenate(sampled))
        _, buffered = _disk1(outline)
        parts.append(buffered)
    return np.unique(np.concatenate(parts))


def plot_linestring(coords, res: int, degrees: bool = True):
    """Plotter (src/geom/plotter.rs:26-98): H3 cells along each segment of a
    linestring via latLngToCell on the endpoints + gridPathCells.

    Args:
        coords: (k, 2) array-like of [lng, lat] points (the line's vertices).

    Returns (segment_row, cell, ok_rows): flat expansion; segments whose
    grid path is undefined (endpoints too far apart / across a pentagon)
    emit nothing and are flagged False in ok_rows.
    """
    from . import localij

    pts = np.asarray(coords, dtype=np.float64)
    if degrees:
        pts = np.deg2rad(pts)
    if not np.isfinite(pts).all():
        raise ValueError("every coordinate of the line must be valid")
    starts = latlng.latlng_rads_to_cell(pts[:-1, 1], pts[:-1, 0], res)
    ends = latlng.latlng_rads_to_cell(pts[1:, 1], pts[1:, 0], res)
    return localij.grid_path_cells(starts, ends)

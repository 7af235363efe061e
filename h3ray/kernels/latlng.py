"""Vectorized lat/lng <-> H3 cell coordinate transforms (NumPy).

Implements the H3 encode path (lat/lng -> n-vector -> closest icosahedron
face -> gnomonic hex2d -> IJK rounding -> digit extraction -> base cell +
canonical rotations) and the decode path (digits -> FaceIJK via aperture-7
descent -> overage adjust -> inverse gnomonic), following the public H3
algorithm as realized in the reference:

  - encode: src/coord/latlng.rs:227-229, vec3d.rs:117-166, vec2d.rs:65-198,
    faceijk.rs:50-126, faceijk.rs:558-582
  - decode: src/index/cell.rs:1876-1945, faceijk.rs:128-160, vec3d.rs:51-109

Everything operates on whole NumPy arrays; per-resolution loops are <= 15
iterations of array arithmetic; pentagon fixups are boolean-masked.
"""

from __future__ import annotations

import numpy as np

from . import bits
from ._tables import (
    BC_CW_OFFSET,
    BC_HOME_FACE,
    BC_HOME_IJK,
    BC_IS_PENTAGON,
    FACE_AXES_AZ_RADS_CII,
    FACE_CENTER,
    FACE_NBR_CCWROT,
    FACE_NBR_FACE,
    FACE_NBR_TRANSLATE,
    FACEIJK_BASE_CELL,
    FACEIJK_BASE_ROT,
)
from .constants import (
    AP7_ROT_RADS,
    DEFAULT_CELL_INDEX,
    EPSILON,
    INV_RES0_U_GNOMONIC,
    INV_SQRT7_POWERS,
    MAX_DIM_BY_CII_RES,
    ONE_SEVENTH,
    RES0_U_GNOMONIC,
    RSIN60,
    SQRT3_2,
    SQRT7_POWERS,
    UNIT_SCALE_BY_CII_RES,
)

TWO_PI = 2.0 * np.pi

# Precomputed tangent bases (north, east) for the 20 face centers
# (src/coord/vec3d.rs:184-196): north = normalize(NP - (NP.c)c), east = n x c.
_NP = np.array([0.0, 0.0, 1.0])
_dots = FACE_CENTER @ _NP  # (20,)
_north = _NP[None, :] - _dots[:, None] * FACE_CENTER
_north /= np.linalg.norm(_north, axis=1, keepdims=True)
_east = np.cross(_north, FACE_CENTER)
FACE_NORTH = _north
FACE_EAST = _east


_COS_EPSILON = np.cos(EPSILON)


def _round_half_away(x):
    """Rust f64::round semantics (half away from zero)."""
    return np.trunc(x + np.copysign(0.5, x))


def _normalize_ijk(i, j, k):
    m = np.minimum(np.minimum(i, j), k)
    return i - m, j - m, k - m


def _up_aperture7(i, j, k, ccw: bool):
    """Parent IJK in the aperture-7 grid (src/coord/ijk.rs:135-155)."""
    ii = i - k
    jj = j - k
    if ccw:
        ni = _round_half_away((3 * ii - jj) * ONE_SEVENTH)
        nj = _round_half_away((ii + 2 * jj) * ONE_SEVENTH)
    else:
        ni = _round_half_away((2 * ii + jj) * ONE_SEVENTH)
        nj = _round_half_away((3 * jj - ii) * ONE_SEVENTH)
    ni = ni.astype(np.int64)
    nj = nj.astype(np.int64)
    return _normalize_ijk(ni, nj, np.zeros_like(ni))


def _down_aperture7(i, j, k, ccw: bool):
    """Center child IJK in the aperture-7 grid (src/coord/ijk.rs:175-192)."""
    if ccw:
        ni = 3 * i + 1 * j + 0 * k
        nj = 0 * i + 3 * j + 1 * k
        nk = 1 * i + 0 * j + 3 * k
    else:
        ni = 3 * i + 0 * j + 1 * k
        nj = 1 * i + 3 * j + 0 * k
        nk = 0 * i + 1 * j + 3 * k
    return _normalize_ijk(ni, nj, nk)


def _down_aperture3(i, j, k, ccw: bool):
    """Center child IJK in the aperture-3 grid (src/coord/ijk.rs:195-211)."""
    if ccw:
        ni = 2 * i + 1 * j + 0 * k
        nj = 0 * i + 2 * j + 1 * k
        nk = 1 * i + 0 * j + 2 * k
    else:
        ni = 2 * i + 0 * j + 1 * k
        nj = 1 * i + 2 * j + 0 * k
        nk = 0 * i + 1 * j + 2 * k
    return _normalize_ijk(ni, nj, nk)


def _rotate60_ijk(i, j, k, ccw: bool):
    """IJK 60° rotation (src/coord/ijk.rs:222-236)."""
    if ccw:
        ni = 1 * i + 0 * j + 1 * k
        nj = 1 * i + 1 * j + 0 * k
        nk = 0 * i + 1 * j + 1 * k
    else:
        ni = 1 * i + 1 * j + 0 * k
        nj = 0 * i + 1 * j + 1 * k
        nk = 1 * i + 0 * j + 1 * k
    return _normalize_ijk(ni, nj, nk)


def _hex2d_to_ijk(x, y):
    """DGGRID hex rounding with axis folding (src/coord/vec2d.rs:138-198)."""
    a1 = np.abs(x)
    a2 = np.abs(y)

    x2 = a2 * RSIN60
    x1 = a1 + x2 / 2.0

    m1 = x1.astype(np.int64)
    m2 = x2.astype(np.int64)

    r1 = x1 - m1
    r2 = x2 - m2

    # Branch tree from the reference, flattened into masks.
    c_lt_half = r1 < 0.5
    c_lt_third = r1 < (1.0 / 3.0)
    c_lt_2thirds = r1 < (2.0 / 3.0)

    # r1 < 1/3
    i_a = m1
    j_a = m2 + (r2 >= (1.0 + r1) / 2.0)
    # 1/3 <= r1 < 1/2
    i_b = m1 + (((1.0 - r1) <= r2) & (r2 < (2.0 * r1)))
    j_b = m2 + (r2 >= (1.0 - r1))
    # 1/2 <= r1 < 2/3
    j_c = m2 + (r2 >= (1.0 - r1))
    i_c = m1 + (((2.0 * r1 - 1.0) >= r2) | (r2 >= (1.0 - r1)))
    # r1 >= 2/3
    i_d = m1 + 1
    j_d = m2 + (r2 >= (r1 / 2.0))

    i = np.where(c_lt_half, np.where(c_lt_third, i_a, i_b),
                 np.where(c_lt_2thirds, i_c, i_d)).astype(np.int64)
    j = np.where(c_lt_half, np.where(c_lt_third, j_a, j_b),
                 np.where(c_lt_2thirds, j_c, j_d)).astype(np.int64)

    # Fold across the axes if necessary.
    neg_x = x < 0.0
    offset = np.where(neg_x, j % 2, 0)
    axis_i = (j + offset) >> 1  # i32::midpoint for non-negative j
    diff = i - axis_i
    i = np.where(neg_x, i - 2 * diff - offset, i)

    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)

    return _normalize_ijk(i, j, np.zeros_like(i))


def _ijk_to_hex2d(i, j, k):
    """IJK -> hex2d center point (src/coord/ijk.rs:283-291)."""
    ii = (i - k).astype(np.float64)
    jj = (j - k).astype(np.float64)
    return ii - 0.5 * jj, jj * SQRT3_2


# 2D axial (a, b) = (i-k, j-k) unit diff -> direction digit:
# center(0,0) K(-1,-1) J(0,1) JK(-1,0) I(1,0) IK(0,-1) IJ(1,1).
_DIGIT_2D = np.zeros((3, 3), dtype=np.int64)
for _d in range(7):
    _di, _dj, _dk = (_d >> 2) & 1, (_d >> 1) & 1, _d & 1
    _DIGIT_2D[_di - _dk + 1, _dj - _dk + 1] = _d


def _to_positive_angle(a):
    a = np.where(a < 0.0, a + TWO_PI, a)
    return np.where(a >= TWO_PI, a - TWO_PI, a)


# ---------------------------------------------------------------------------
# Encode: lat/lng -> cell
# ---------------------------------------------------------------------------

def _geo_to_hex2d(lat_rad, lng_rad, res):
    """Project points to (face, x, y) hex2d coords at `res`."""
    cos_lat = np.cos(lat_rad)
    vx = np.cos(lng_rad) * cos_lat
    vy = np.sin(lng_rad) * cos_lat
    vz = np.sin(lat_rad)

    # Closest face. For unit vectors |v - c|^2 = 2 - 2 v.c, so the argmin
    # over squared distances is the argmax over dot products — one (n, 20)
    # GEMM instead of an (n, 20, 3) difference tensor.
    v = np.stack([vx, vy, vz], axis=1)  # (n, 3)
    dots = v @ FACE_CENTER.T  # (n, 20)
    face = np.argmax(dots, axis=1)
    best = np.take_along_axis(dots, face[:, None], axis=1)[:, 0]
    # Clamp: rounding can push the dot a ulp past 1 (arccos domain).
    best = np.minimum(best, 1.0)

    # Gnomonic radius scaled for the resolution (vec2d.rs:65-104):
    # tan(acos(v)) == sqrt(1 - v^2) / v for v in (0, 1] (closest-face dot is
    # always > 0.9), eliminating both transcendentals; the small-radius cut
    # r < EPSILON becomes v > cos(EPSILON).
    small = best > _COS_EPSILON
    r_scaled = (np.sqrt(np.maximum(1.0 - best * best, 0.0)) / best) \
        * (INV_RES0_U_GNOMONIC * SQRT7_POWERS[res])

    # Azimuth from face center to the point (vec3d.rs:123-133): atan2 of the
    # tangent-plane projection against the face basis. atan2 is
    # scale-invariant, so the projection needs no normalization, and
    # proj.east == v.east / proj.north == v.north (basis _|_ center).
    az = np.arctan2(np.einsum("nc,nc->n", v, FACE_EAST[face]),
                    np.einsum("nc,nc->n", v, FACE_NORTH[face]))

    theta = FACE_AXES_AZ_RADS_CII[face] - az
    if isinstance(res, np.ndarray):
        class3 = (res % 2) == 1
        theta = np.where(class3, theta - AP7_ROT_RADS, theta)
    elif res % 2 == 1:
        theta = theta - AP7_ROT_RADS

    x = np.where(small, 0.0, r_scaled * np.cos(theta))
    y = np.where(small, 0.0, r_scaled * np.sin(theta))
    return face, x, y


def latlng_to_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Vectorized latLngToCell. Inputs in degrees; returns int64 cell bits."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, dtype=np.float64))
    return latlng_rads_to_cell(lat, lng, res)


def latlng_rads_to_cell(lat_rad, lng_rad, res: int) -> np.ndarray:
    res = int(res)
    face, x, y = _geo_to_hex2d(lat_rad, lng_rad, res)
    i, j, k = _hex2d_to_ijk(x, y)
    n = i.shape[0]

    # Digit extraction, finest -> coarsest (faceijk.rs:558-582), carried in
    # 2D axial coords (a, b) = (i - k, j - k): every IJK op is linear so the
    # aperture-7 up/down and the unit-diff digit are exact integer 2D ops —
    # half the array passes of the 3D form, bit-identical results.
    digits = np.full((n, 15), 7, dtype=np.int64)
    a = i - k
    b = j - k
    for r in range(res, 0, -1):
        ccw = (r % 2) == 1  # class III -> CCW
        la, lb = a, b
        if ccw:
            ua = _round_half_away((3 * a - b) * ONE_SEVENTH)
            ub = _round_half_away((a + 2 * b) * ONE_SEVENTH)
        else:
            ua = _round_half_away((2 * a + b) * ONE_SEVENTH)
            ub = _round_half_away((3 * b - a) * ONE_SEVENTH)
        a = ua.astype(np.int64)
        b = ub.astype(np.int64)
        # Center child in 2D: CCW (2a+b, 3b-a); CW (3a-b, a+2b).
        if ccw:
            ca = 2 * a + b
            cb = 3 * b - a
        else:
            ca = 3 * a - b
            cb = a + 2 * b
        digits[:, r - 1] = _DIGIT_2D[la - ca + 1, lb - cb + 1]
    i, j, k = _normalize_ijk(a, b, np.zeros_like(a))

    # Base cell lookup at res-0 coordinates (faceijk.rs:60-79).
    ii = np.clip(i, 0, 2)
    jj = np.clip(j, 0, 2)
    kk = np.clip(k, 0, 2)
    bc = FACEIJK_BASE_CELL[face, ii, jj, kk]
    rot = FACEIJK_BASE_ROT[face, ii, jj, kk]

    # Canonical rotations (faceijk.rs:104-125), applied in digit space
    # (digits[:, :res]) to avoid repeated unpack/pack of the bit field.
    valid = digits[:, :res] if res > 0 else digits[:, :0]
    pent = BC_IS_PENTAGON[bc]

    def _first_axe_digits(v):
        if v.shape[1] == 0:
            return np.zeros(v.shape[0], dtype=np.int64)
        nz = v != 0
        idx = np.argmax(nz, axis=1)
        out = v[np.arange(v.shape[0]), idx]
        return np.where(nz.any(axis=1), out, 0)

    if pent.any() and res > 0:
        leads_k = _first_axe_digits(valid) == 1
        fix = pent & leads_k
        if fix.any():
            cw_off = (BC_CW_OFFSET[bc, 0] == face) | (BC_CW_OFFSET[bc, 1] == face)
            m_cw = fix & cw_off
            m_ccw = fix & ~cw_off
            if m_cw.any():
                valid[m_cw] = bits.ROTATE60_CW[valid[m_cw]]
            if m_ccw.any():
                valid[m_ccw] = bits.ROTATE60_CCW[valid[m_ccw]]
        # Pentagon rotations applied `rot` times (each step depends on the
        # current leading axe -> masked sequential loop, max 5 iterations).
        todo = np.where(pent, rot, 0)
        while (todo > 0).any():
            m = todo > 0
            axe = _first_axe_digits(valid)
            dbl = m & (axe == 3)  # JK -> rotate twice (bits.rs:181-218)
            sgl = m & ~dbl
            if sgl.any():
                valid[sgl] = bits.ROTATE60_CCW[valid[sgl]]
            if dbl.any():
                valid[dbl] = bits.ROTATE60_CCW_N[2][valid[dbl]]
            todo -= m
    hex_rot = np.where(pent, 0, rot)
    if (hex_rot > 0).any() and res > 0:
        # Single fancy-indexed lookup: table[count, digit] per row.
        valid[:] = bits.ROTATE60_CCW_N[hex_rot[:, None], valid]

    cells = bits.pack_digits(
        np.full(n, DEFAULT_CELL_INDEX & ~0x1FFFFFFFFFFF, dtype=np.int64), digits)
    cells = bits.set_resolution(cells, res)
    cells = bits.set_base_cell(cells, bc)
    return cells


# ---------------------------------------------------------------------------
# Decode: cell -> FaceIJK -> lat/lng
# ---------------------------------------------------------------------------

def cell_to_faceijk(cells):
    """Vectorized CellIndex -> FaceIJK (src/index/cell.rs:1883-1945).

    Returns (face, i, j, k) int64 arrays.
    """
    cells = bits.as_i64(np.asarray(cells))
    base = bits.get_base_cell(cells)
    res = bits.get_resolution(cells)
    pent = BC_IS_PENTAGON[base]

    work = cells
    lead = bits.first_axe(work)
    fix = pent & (lead == 5)  # leading IK
    if fix.any():
        work = np.where(fix, bits.rotate60(work, 1, ccw=False), work)

    face = BC_HOME_FACE[base].copy()
    i = BC_HOME_IJK[base, 0].copy()
    j = BC_HOME_IJK[base, 1].copy()
    k = BC_HOME_IJK[base, 2].copy()
    home_origin = (i == 0) & (j == 0) & (k == 0)
    possible_overage = pent | (res != 0) | ~home_origin

    max_res = int(res.max()) if res.size else 0
    for r in range(1, max_res + 1):
        m = res >= r
        if not m.any():
            continue
        ccw = (r % 2) == 1
        di, dj, dk = _down_aperture7(i, j, k, ccw)
        digit = np.where(m, bits.get_direction(work, r), 0)
        ui = bits.DIGIT_IJK[digit, 0]
        uj = bits.DIGIT_IJK[digit, 1]
        uk = bits.DIGIT_IJK[digit, 2]
        ni, nj, nk = _normalize_ijk(di + ui, dj + uj, dk + uk)
        i = np.where(m, ni, i)
        j = np.where(m, nj, j)
        k = np.where(m, nk, k)

    if not possible_overage.any():
        return face, i, j, k

    orig_i, orig_j, orig_k = i.copy(), j.copy(), k.copy()
    class3 = (res % 2) == 1
    class2_res = np.where(class3, res + 1, res)
    if class3.any():
        di, dj, dk = _down_aperture7(i, j, k, ccw=False)
        i = np.where(class3, di, i)
        j = np.where(class3, dj, j)
        k = np.where(class3, dk, k)

    is_pent4 = pent & (bits.first_axe(work) == 4)

    # First overage pass. MAX_DIM / UNIT_SCALE lookups are per-row.
    max_dim = MAX_DIM_BY_CII_RES[class2_res]
    dim = i + j + k
    had = possible_overage & (dim > max_dim)
    face, i, j, k = _adjust_overage_rows(face, i, j, k, class2_res, is_pent4, had)

    # Secondary overages for pentagons.
    sec = had & pent
    guard = 0
    while True:
        dim = i + j + k
        again = sec & (dim > MAX_DIM_BY_CII_RES[class2_res])
        if not again.any() or guard > 4:
            break
        face, i, j, k = _adjust_overage_rows(
            face, i, j, k, class2_res, np.zeros_like(again), again)
        guard += 1

    # Restore resolution.
    back = had & class3
    if back.any():
        ui, uj, uk = _up_aperture7(i, j, k, ccw=False)
        i = np.where(back, ui, i)
        j = np.where(back, uj, j)
        k = np.where(back, uk, k)
    keep = ~had & class3
    i = np.where(keep, orig_i, i)
    j = np.where(keep, orig_j, j)
    k = np.where(keep, orig_k, k)
    return face, i, j, k


def _adjust_overage_rows(face, i, j, k, class2_res, is_pent4, over):
    """Apply the overage transform to rows in `over` (assumed dim>max_dim)."""
    if not over.any():
        return face, i, j, k
    max_dim = MAX_DIM_BY_CII_RES[class2_res]

    q_jk = over & (k > 0) & (j > 0)
    q_ki = over & (k > 0) & ~(j > 0)

    pent_fix = q_ki & is_pent4
    if pent_fix.any():
        ti = i - max_dim
        ri, rj, rk = _rotate60_ijk(ti, j, k, ccw=False)
        i = np.where(pent_fix, ri + max_dim, i)
        j = np.where(pent_fix, rj, j)
        k = np.where(pent_fix, rk, k)

    quadrant = np.where(q_jk, 3, np.where(q_ki, 2, 1))
    nbr_face = FACE_NBR_FACE[face, quadrant]
    nbr_rot = FACE_NBR_CCWROT[face, quadrant]
    t0 = FACE_NBR_TRANSLATE[face, quadrant, 0]
    t1 = FACE_NBR_TRANSLATE[face, quadrant, 1]
    t2 = FACE_NBR_TRANSLATE[face, quadrant, 2]

    todo = np.where(over, nbr_rot, 0)
    while (todo > 0).any():
        m = todo > 0
        ri, rj, rk = _rotate60_ijk(i, j, k, ccw=True)
        i = np.where(m, ri, i)
        j = np.where(m, rj, j)
        k = np.where(m, rk, k)
        todo -= m

    unit_scale = UNIT_SCALE_BY_CII_RES[class2_res]
    ni, nj, nk = _normalize_ijk(i + t0 * unit_scale, j + t1 * unit_scale,
                                k + t2 * unit_scale)
    face = np.where(over, nbr_face, face)
    i = np.where(over, ni, i)
    j = np.where(over, nj, j)
    k = np.where(over, nk, k)
    return face, i, j, k


def _hex2d_to_vec3d(x, y, face, res, is_substrate: bool):
    """Inverse gnomonic: hex2d on a face -> unit n-vector (vec3d.rs:51-109).

    `res` may be an array of (extended) resolutions.
    """
    r = np.sqrt(x * x + y * y)
    center = FACE_CENTER[face]

    scale = INV_SQRT7_POWERS[res]
    if is_substrate:
        scale = scale / 3.0
    q = r * scale * RES0_U_GNOMONIC
    small = q < EPSILON

    inv_hyp = 1.0 / np.sqrt(q * q + 1.0)
    cos_r = inv_hyp
    sin_r = q * inv_hyp

    theta = np.arctan2(y, x)
    if not is_substrate:
        class3 = (np.asarray(res) % 2) == 1
        theta = np.where(class3, _to_positive_angle(theta + AP7_ROT_RADS), theta)
    theta = _to_positive_angle(FACE_AXES_AZ_RADS_CII[face] - theta)

    north = FACE_NORTH[face]
    east = FACE_EAST[face]
    sin_t = np.sin(theta)
    cos_t = np.cos(theta)
    direction = cos_t[:, None] * north + sin_t[:, None] * east
    out = cos_r[:, None] * center + sin_r[:, None] * direction
    norm = np.linalg.norm(out, axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(norm > 0, out / norm, 0.0)
    out = np.where(small[:, None], center, out)
    return out


def cell_to_latlng_rads(cells):
    """Vectorized cellToLatLng; returns (lat_rad, lng_rad)."""
    cells = bits.as_i64(np.asarray(cells))
    res = bits.get_resolution(cells)
    face, i, j, k = cell_to_faceijk(cells)
    x, y = _ijk_to_hex2d(i, j, k)
    v = _hex2d_to_vec3d(x, y, face, res, is_substrate=False)
    lat = np.arcsin(np.clip(v[:, 2], -1.0, 1.0))
    lng = np.arctan2(v[:, 1], v[:, 0])
    return lat, lng


def cell_to_latlng(cells):
    """Vectorized cellToLatLng; returns (lat_deg, lng_deg)."""
    lat, lng = cell_to_latlng_rads(cells)
    return np.rad2deg(lat), np.rad2deg(lng)

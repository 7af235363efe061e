"""polygonToCells conformance vs the reference's API-test goldens.

Golden counts from /root/reference/tests/api/geom/tiler.rs:96-520 (the
h3o test-suite values, themselves cross-checked against the H3 C library).
"""

import math

import numpy as np
import pytest

from h3ray.kernels import bits, hierarchy, latlng, region
from h3ray.kernels.boundary import cell_to_boundary_rads
from h3ray.kernels.constants import NUM_CELLS_BY_RES

SHAPES = "/root/reference/dataset/shapes"


def load(name, transmeridian_heuristic=True):
    with open(f"{SHAPES}/{name}.geojson") as f:
        return region.geometry_from_geojson(
            f.read(), transmeridian_heuristic=transmeridian_heuristic)


@pytest.mark.parametrize("name,res,exp", [
    ("Paris", 8, (164, 118, 203)),
    ("Rabi", 8, (163, 132, 193)),
    ("Holes", 4, (233, 170, 285)),
])
def test_containment_modes(name, res, exp):
    g = load(name)
    got = tuple(len(np.unique(region.polygon_to_cells(g, res, m)))
                for m in ("centroid", "boundary", "intersects"))
    assert got == exp


@pytest.mark.parametrize("name,res,exp", [
    ("h3js_issue67_1", 7, 4499),
    ("h3js_issue67_2", 7, 4609),
    ("h3_issue136", 13, 4353),
    ("SanFrancisco", 9, 1253),
    ("SanFranciscoHole", 9, 1214),
    ("Empty", 9, 0),
    ("PrimeMeridian", 7, 4228),
    ("Transmeridian", 7, 4238),
    ("TransmeridianHole", 7, 3176),
    ("TransmeridianComplex", 4, 1204),
])
def test_centroid_goldens(name, res, exp):
    g = load(name)
    assert len(np.unique(region.polygon_to_cells(g, res))) == exp


@pytest.mark.parametrize("res", [0, 1])
def test_half_world_partition(res):
    c1 = set(np.unique(region.polygon_to_cells(load("HalfWorld_1"),
                                               res)).tolist())
    c2 = set(np.unique(region.polygon_to_cells(load("HalfWorld_2"),
                                               res)).tolist())
    assert len(c1) + len(c2) == NUM_CELLS_BY_RES[res]
    assert not (c1 & c2)


def test_covers_geometry_within_cell():
    g = load("h3o_issue21")
    assert len(region.polygon_to_cells(g, 0, "covers")) == 1


def test_h3_595_vertex_at_center_latitude():
    center = np.array([0x85283473fffffff], dtype=np.int64)
    clat, _ = latlng.cell_to_latlng(center)
    ring = [[-121.53625488281249, clat[0]],
            [-121.9317626953125, 37.61640705577992],
            [-122.29980468749999, 37.330856613297144],
            [-121.904296875, 37.05079312980657],
            [-121.53625488281249, clat[0]]]
    g = region.prepare_geometry([[ring]])
    assert len(region.polygon_to_cells(g, 5)) == 8


def test_cell_self_tiling():
    """Tiling a cell's own boundary yields exactly that cell."""
    cell = latlng.latlng_rads_to_cell(np.array([1.0]), np.array([2.0]), 9)
    off, blat, blng = cell_to_boundary_rads(cell)
    ring = np.stack([np.append(blng, blng[0]),
                     np.append(blat, blat[0])], axis=1)
    g = region.prepare_geometry([[ring]], degrees=False)
    out = region.polygon_to_cells(g, 9)
    assert out.shape[0] == 1 and out[0] == cell[0]


def test_pentagon_tiling():
    pent = np.array([0x89300000003ffff], dtype=np.int64)
    assert bits.is_pentagon(pent).all()
    plat, plng = latlng.cell_to_latlng(pent)
    e = 0.001
    ring = [[plng[0] - e, plat[0] - e], [plng[0] - e, plat[0] + e],
            [plng[0] + e, plat[0] + e], [plng[0] + e, plat[0] - e],
            [plng[0] - e, plat[0] - e]]
    g = region.prepare_geometry([[ring]])
    assert len(region.polygon_to_cells(g, 9)) == 1


def test_exhaustive_res0_self_tiling():
    """Every res-0 cell boundary tiles to its own children (res 0 and 1)."""
    base = bits.set_unused(bits.set_resolution(bits.set_base_cell(
        np.full(122, 0x0800_0000_0000_0000, dtype=np.int64),
        np.arange(122, dtype=np.int64)), 0), 0)
    off, blat, blng = cell_to_boundary_rads(base)
    checked = 0
    for idx in range(122):
        s, e = off[idx], off[idx + 1]
        lng = blng[s:e]
        if lng.max() - lng.min() > math.pi - math.pi / 4:
            continue  # transmeridian cells skipped, as in the reference test
        ring = np.stack([np.append(lng, lng[0]),
                         np.append(blat[s:e], blat[s:e][0])], axis=1)
        g = region.prepare_geometry([[ring]], degrees=False)
        for target in (0, 1):
            got = set(np.unique(region.polygon_to_cells(g, target)).tolist())
            _, exp = hierarchy.cell_to_children(base[idx:idx + 1], target)
            assert got == set(exp.tolist()), hex(base[idx])
        checked += 1
    assert checked > 70


def test_coverage_size_hint_bounds():
    for name, res in [("Paris", 8), ("SanFrancisco", 9)]:
        g = load(name)
        hint = region.coverage_size_hint(g, res)
        assert len(region.polygon_to_cells(g, res)) <= hint


def test_invalid_geometry_rejected():
    with pytest.raises(ValueError):
        region.prepare_geometry([[[[0.0, 0.0], [1.0, 1.0]]]])
    with pytest.raises(ValueError):
        region.prepare_geometry(
            [[[[0.0, 0.0], [1.0, float("nan")], [1.0, 0.0], [0.0, 0.0]]]])

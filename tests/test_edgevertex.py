"""Directed-edge and vertex index tests (doc values + exhaustive sweeps)."""

import numpy as np
import pytest

from h3ray.kernels import bits, edgevertex as ev, grid, hierarchy, measures


def all_cells(res: int) -> np.ndarray:
    base = measures.res0_cells()
    return base if res == 0 else hierarchy.cell_to_children(base, res)[1]


def test_edge_doc_values():
    e = np.array([0x13a194e699ab7fff], dtype=np.int64)
    assert ev.get_edge(e)[0] == 3
    assert ev.edge_origin(e)[0] == 0x8a194e699ab7fff
    assert ev.edge_destination(e)[0] == 0x8a194e699a97fff
    assert abs(ev.edge_length_rads(e)[0] - 1.1795418098325597e-5) <= 1e-11
    assert abs(ev.edge_length_km(e)[0] - 0.07514869340636812) <= 1e-9
    assert ev.is_valid_directed_edge(e).all()
    assert ev.edge_reverse(ev.edge_reverse(e))[0] == e[0]


def test_vertex_doc_value():
    c = np.array([0x8a1fb46622dffff], dtype=np.int64)
    v, ok = ev.cell_to_vertex(c, 3)
    assert ok.all() and v[0] == 0x25a1fb464492ffff
    assert ev.is_valid_vertex(v).all()


@pytest.mark.parametrize("res", [0, 1, 2])
def test_edges_exhaustive(res):
    cells = all_cells(res)
    row, edges = ev.origin_to_directed_edges(cells)
    pent = bits.is_pentagon(cells)
    # 5 edges per pentagon, 6 per hexagon.
    counts = np.bincount(row, minlength=cells.shape[0])
    assert (counts == np.where(pent, 5, 6)).all()
    assert ev.is_valid_directed_edge(edges).all()
    # Destination must be a neighbor of the origin.
    origin = ev.edge_origin(edges)
    dest = ev.edge_destination(edges)
    assert (origin == cells[row]).all()
    assert grid.are_neighbor_cells(origin, dest).all()
    # cellsToDirectedEdge round-trips.
    back, ok = ev.cells_to_directed_edge(origin, dest)
    assert ok.all() and (back == edges).all()
    # Reverse is an involution with swapped endpoints.
    rev = ev.edge_reverse(edges)
    assert (ev.edge_origin(rev) == dest).all()
    assert (ev.edge_destination(rev) == origin).all()


@pytest.mark.parametrize("res", [0, 1, 2])
def test_vertex_canonicality_exhaustive(res):
    """Every grid vertex is shared by exactly 3 cells, and all three agree
    on the canonical vertex index (cell.rs:912-937 convention)."""
    cells = all_cells(res)
    row, verts = ev.cell_to_vertexes(cells)
    pent = bits.is_pentagon(cells)
    counts = np.bincount(row, minlength=cells.shape[0])
    assert (counts == np.where(pent, 5, 6)).all()
    uniq, mult = np.unique(verts, return_counts=True)
    assert (mult == 3).all(), f"non-3 multiplicity at res {res}"
    n_hex = int((~pent).sum())
    assert uniq.shape[0] == (6 * n_hex + 5 * 12) // 3
    assert ev.is_valid_vertex(verts).all()


def test_vertex_latlng_matches_boundary():
    """vertexToLatLng equals the corresponding cell-boundary vertex."""
    from h3ray.kernels.boundary import cell_to_boundary_rads

    cells = all_cells(1)[:300]
    row, verts = ev.cell_to_vertexes(cells)
    vlat, vlng = ev.vertex_to_latlng_rads(verts)
    # Collect each cell's boundary vertex set; every vertex latlng must
    # appear among its cell's topological boundary vertices.
    off, blat, blng = cell_to_boundary_rads(cells)
    for i in range(100):
        cell_rows = row == i
        s, e = off[i], off[i + 1]
        bset = set(zip(np.round(blat[s:e], 9), np.round(blng[s:e], 9)))
        for la, lg in zip(vlat[cell_rows], vlng[cell_rows]):
            assert (round(la, 9), round(lg, 9)) in bset


def test_edge_boundary_on_cell_boundary():
    from h3ray.kernels.boundary import cell_to_boundary_rads

    cells = all_cells(2)[7::31][:50]
    row, edges = ev.origin_to_directed_edges(cells)
    off, elat, elng = ev.edge_boundary_rads(edges)
    coff, clat, clng = cell_to_boundary_rads(cells)
    counts = np.diff(off)
    assert (counts >= 2).all() and (counts <= 3).all()
    for i in range(edges.shape[0]):
        ci = row[i]
        s, e = coff[ci], coff[ci + 1]
        bset = set(zip(np.round(clat[s:e], 9), np.round(clng[s:e], 9)))
        for la, lg in zip(elat[off[i]:off[i + 1]], elng[off[i]:off[i + 1]]):
            assert (round(la, 9), round(lg, 9)) in bset


def test_edge_lengths_near_average():
    """Mean edge length at a res must sit near the published average."""
    from h3ray.kernels.constants import HEX_EDGE_KM

    cells = all_cells(2)[::13]
    _, edges = ev.origin_to_directed_edges(cells)
    km = ev.edge_length_km(edges)
    assert (km > 0).all()
    mean = km.mean()
    assert 0.7 * HEX_EDGE_KM[2] < mean < 1.3 * HEX_EDGE_KM[2]


def test_base_rotation_table_spot_values():
    """Derived BASE_ROT_BY_FACE vs reference BASE_CELL_ROTATIONS row 0
    (base_cell.rs:217): cell 0 -> face0=5, face1=0, face2=1."""
    assert ev.BASE_ROT_BY_FACE[0, 0] == 5
    assert ev.BASE_ROT_BY_FACE[0, 1] == 0
    assert ev.BASE_ROT_BY_FACE[0, 2] == 1
    # Home face of every base cell has rotation 0.
    from h3ray.kernels._tables import BC_HOME_FACE
    for bc in range(122):
        assert ev.BASE_ROT_BY_FACE[bc, BC_HOME_FACE[bc]] == 0


@pytest.mark.parametrize("res", [1, 2, 5, 9])
def test_shared_edge_vertices_coincide(res):
    """An edge and its reverse describe the same physical segment: their
    boundary endpoint vertices must coincide (reversed) to 1e-9 rad —
    a global cross-cell consistency check of the boundary math."""
    rng = np.random.default_rng(res)
    from h3ray.kernels import latlng

    lat = rng.uniform(-80, 80, 40)
    lng = rng.uniform(-180, 180, 40)
    cells = latlng.latlng_to_cell(lat, lng, res)
    _, edges = ev.origin_to_directed_edges(cells)
    rev = ev.edge_reverse(edges)
    off_a, lat_a, lng_a = ev.edge_boundary_rads(edges)
    off_b, lat_b, lng_b = ev.edge_boundary_rads(rev)
    for i in range(edges.shape[0]):
        a = np.stack([lat_a[off_a[i]:off_a[i + 1]],
                      lng_a[off_a[i]:off_a[i + 1]]], axis=1)
        b = np.stack([lat_b[off_b[i]:off_b[i + 1]],
                      lng_b[off_b[i]:off_b[i + 1]]], axis=1)
        assert np.allclose(a, b[::-1], atol=1e-9), i

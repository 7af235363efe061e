"""Unit tests for h3ray.kernels.bits (doctest values from the reference)."""

import numpy as np

from h3ray.kernels import bits


def arr(*vals):
    return np.array(vals, dtype=np.int64)


def test_field_accessors():
    c = arr(0x8A1FB46622DFFFFF >> 4)  # not meaningful; use the real one below
    c = arr(0x8A1FB46622DFFFF)
    assert bits.get_resolution(c)[0] == 10
    assert bits.get_mode(c)[0] == 1
    assert bits.get_base_cell(c)[0] == 15


def test_parent_center_child():
    c = arr(0x8A1FB46622DFFFF)
    assert bits.cell_to_parent(c, 5)[0] == 0x851FB467FFFFFFF
    assert bits.cell_to_center_child(c, 15)[0] == 0x8F1FB46622D8000
    assert bits.cell_to_parent(c, 10)[0] == c[0]


def test_children_count():
    c = arr(0x8A1FB46622DFFFF)
    assert bits.children_count(c, 15)[0] == 16807
    assert bits.children_count(c, 10)[0] == 1
    assert bits.children_count(c, 9)[0] == 0


def test_is_valid_cell():
    good = np.array([0x8A1FB46622DFFFF, 0x085283473FFFFFFF, 0x0800_1FFF_FFFF_FFFF],
                    dtype=np.uint64)
    bad = np.array([0, 0xFFFFFFFFFFFFFFFF, 0x8A1FB46622DFFFE,
                    0x1A1FB46622DFFFF], dtype=np.uint64)
    assert bits.is_valid_cell(good).all()
    assert not bits.is_valid_cell(bad).any()


def test_pentagon():
    # 0x0820807fffffffff is base cell 4 at res 0 (a pentagon).
    pent0 = bits.set_base_cell(arr(0x0800_1FFF_FFFF_FFFF), 4)
    assert bits.is_pentagon(pent0)[0]
    hex0 = bits.set_base_cell(arr(0x0800_1FFF_FFFF_FFFF), 8)
    assert not bits.is_pentagon(hex0)[0]


def test_first_axe():
    c = arr(0x8A1FB46622DFFFF)
    # digits of this cell: first nonzero digit from res 1.
    digits = bits.unpack_digits(c)[0]
    expected = next((d for d in digits[:10] if d != 0), 0)
    assert bits.first_axe(c)[0] == expected


def test_rotation_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-80, 80, 100)
    lng = rng.uniform(-180, 180, 100)
    from h3ray.kernels import latlng
    cells = latlng.latlng_to_cell(lat, lng, 7)
    for count in range(6):
        fwd = bits.rotate60(cells, count, ccw=True)
        back = bits.rotate60(fwd, count, ccw=False)
        assert (back == cells).all()
    # Rotations of cells in non-pentagon base cells stay valid (pentagon base
    # cells may legitimately acquire a leading K digit, which is non-canonical).
    from h3ray.kernels._tables import BC_IS_PENTAGON
    hexb = cells[~BC_IS_PENTAGON[bits.get_base_cell(cells)]]
    assert bits.is_valid_cell(bits.rotate60(hexb, 3, ccw=True)).all()


def test_strings():
    c = arr(0x8A1FB46622DFFFF)
    s = bits.to_strings(c)
    assert s[0] == "8a1fb46622dffff"
    assert bits.from_strings(s)[0] == c[0]

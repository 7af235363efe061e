"""Conformance tests for encode/decode against the H3 C-library vectors."""

import numpy as np
import pytest

from h3ray.kernels import bits, latlng


@pytest.fixture(scope="module")
def encode_corpus(reference_dataset):
    cells, lats, lngs = [], [], []
    with open(reference_dataset / "latLngToCell.txt") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                cells.append(int(parts[0], 16))
                lats.append(float(parts[1]))
                lngs.append(float(parts[2]))
    return (np.array(cells, dtype=np.int64), np.array(lats), np.array(lngs))


@pytest.fixture(scope="module")
def boundary_corpus(reference_dataset):
    with open(reference_dataset / "cellToBoundary.txt") as f:
        return np.array([int(l, 16) for l in f.read().split()], dtype=np.int64)


def test_encode_conformance_bit_exact(encode_corpus):
    cells, lat, lng = encode_corpus
    res = bits.get_resolution(cells)
    out = np.empty_like(cells)
    for r in np.unique(res):
        m = res == r
        out[m] = latlng.latlng_to_cell(lat[m], lng[m], int(r))
    assert (out == cells).all(), f"{(out != cells).sum()} mismatches"


def test_decode_roundtrip_full_corpus(boundary_corpus):
    cells = boundary_corpus
    res = bits.get_resolution(cells)
    lat, lng = latlng.cell_to_latlng_rads(cells)
    out = np.empty_like(cells)
    for r in np.unique(res):
        m = res == r
        out[m] = latlng.latlng_rads_to_cell(lat[m], lng[m], int(r))
    assert (out == cells).all(), f"{(out != cells).sum()} mismatches"


def test_paris_doctest():
    # LatLng::new(48.864716, 2.349014).to_cell(Five) (src/coord/latlng.rs doc)
    cell = latlng.latlng_to_cell(np.array([48.864716]), np.array([2.349014]), 5)
    assert bits.is_valid_cell(cell)[0]
    assert bits.get_resolution(cell)[0] == 5
    lat, lng = latlng.cell_to_latlng(cell)
    assert abs(lat[0] - 48.864716) < 0.2 and abs(lng[0] - 2.349014) < 0.2


def test_pentagon_decode():
    from h3ray.kernels._tables import PENTAGON_BASE_CELLS
    from h3ray.kernels.constants import DEFAULT_CELL_INDEX
    pents = bits.set_base_cell(
        np.full(12, DEFAULT_CELL_INDEX, dtype=np.int64), PENTAGON_BASE_CELLS)
    for r in range(1, 6):
        cells = bits.cell_to_center_child(pents, r)
        lat, lng = latlng.cell_to_latlng_rads(cells)
        back = latlng.latlng_rads_to_cell(lat, lng, r)
        assert (back == cells).all()

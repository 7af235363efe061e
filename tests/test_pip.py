"""PIP join pipeline: exactness vs brute-force point-in-polygon."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from h3ray.io import pages as pages_io
from h3ray.kernels import latlng, region
from h3ray.pipelines import pip

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def page_points():
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ds = pages_io.pages_from_documents(SF)
    urls = ds.to_pandas()["url"].to_numpy()
    import pyarrow as pa
    lat, lng = pages_io.geotag(pa.array(urls.tolist()))
    return urls, lat, lng


def brute_force(geoms, urls, lat, lng):
    exp = set()
    for pid, g in enumerate(geoms):
        inside = region.contains_points(g, np.deg2rad(lat), np.deg2rad(lng))
        for u in urls[inside]:
            exp.add((u, pid))
    return exp


def test_exact_pip_join_matches_brute_force(ray_session, page_points):
    urls, lat, lng = page_points
    geoms = pip.city_polygons(6)
    ds = pages_io.pages_from_documents(SF)
    out = pip.pip_join(ds, geoms, res=8, exact=True).to_pandas()
    got = set(zip(out["url"], out["polygon_id"]))
    exp = brute_force(geoms, urls, lat, lng)
    assert got == exp
    assert len(exp) > 20  # cities are hot spots; polygons must hit pages


def test_centroid_pip_join_matches_coverage(ray_session, page_points):
    urls, lat, lng = page_points
    geoms = pip.city_polygons(4)
    res = 7
    ds = pages_io.pages_from_documents(SF)
    out = pip.pip_join(ds, geoms, res=res, mode="centroid").to_pandas()
    got = set(zip(out["url"], out["polygon_id"]))

    cells = latlng.latlng_to_cell(lat, lng, res)
    exp = set()
    for pid, g in enumerate(geoms):
        cov = set(np.unique(region.polygon_to_cells(g, res)).tolist())
        for u, c in zip(urls, cells):
            if int(c) in cov:
                exp.add((u, pid))
    assert got == exp


def test_compact_probe_equals_flat_probe():
    geoms = pip.city_polygons(3)
    res = 8
    flat = pip.build_probe(geoms, res, compact=False)
    comp = pip.build_probe(geoms, res, compact=True)
    # Compacted probe must be strictly smaller but match identically.
    n_flat = sum(lvl["pids"].shape[0] for lvl in flat["levels"])
    n_comp = sum(lvl["pids"].shape[0] for lvl in comp["levels"])
    assert n_comp < n_flat

    rng = np.random.default_rng(3)
    lat = rng.uniform(-60, 60, 5000)
    lng = rng.uniform(-180, 180, 5000)
    for i in range(3):
        lat[i::50] = pages_io.CITY_LAT[i] + rng.normal(0, 0.5, lat[i::50].size)
        lng[i::50] = pages_io.CITY_LNG[i] + rng.normal(0, 0.5, lng[i::50].size)
    cells = latlng.latlng_to_cell(lat, lng, res)
    r1, p1 = pip.probe_cells(flat, cells)
    r2, p2 = pip.probe_cells(comp, cells)
    assert set(zip(r1, p1)) == set(zip(r2, p2))
    assert r1.size > 0


def test_pip_join_shuffle_equals_broadcast(ray_session, page_points):
    geoms = pip.city_polygons(5)
    ds = pages_io.pages_from_documents(SF)
    a = pip.pip_join(ds, geoms, res=7, mode="centroid").to_pandas()
    ds2 = pages_io.pages_from_documents(SF)
    b = pip.pip_join_shuffle(ds2, geoms, res=7, mode="centroid",
                             num_partitions=4).to_pandas()
    assert set(zip(a.url, a.polygon_id)) == set(zip(b.url, b.polygon_id))


def test_actor_pool_pip_equals_tasks(ray_session, page_points):
    geoms = pip.city_polygons(5)
    ds = pages_io.pages_from_documents(SF)
    a = pip.pip_join(ds, geoms, res=8, exact=True).to_pandas()
    ds2 = pages_io.pages_from_documents(SF)
    b = pip.pip_join(ds2, geoms, res=8, exact=True, use_actors=True,
                     concurrency=2).to_pandas()
    assert set(zip(a.url, a.polygon_id)) == set(zip(b.url, b.polygon_id))

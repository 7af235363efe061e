"""Point-in-polygon join: pages vs polygon coverage cell sets.

The spatial-join core (SURVEY.md §2.7): polygons are tiled once with
polygonToCells (small side — driver or a tiny Ray job), the coverage is
compacted (minimal multi-res cell set) and broadcast via ray.put; pages
stream through a stateless map_batches that encodes each page's point and
probes the coverage by walking its ancestor cells — max 16 sorted-array
lookups per page, no shuffle of the big side.

`exact=True` re-checks the exact point-in-polygon predicate per candidate
(coverage then uses "covers" mode so no true match is lost), giving exact
join semantics rather than cell-approximation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io import pages as pages_io
from ..kernels import bits, hierarchy, latlng, region


def city_polygons(n: int = 10, radius_deg: float = 0.75) -> list[dict]:
    """Deterministic test polygons: hexagon-ish rings around the first `n`
    synthetic city centers (h3ray.io.pages.CITY_LAT/LNG)."""
    geoms = []
    for i in range(n):
        lat0 = pages_io.CITY_LAT[i]
        lng0 = pages_io.CITY_LNG[i]
        ang = np.linspace(0.0, 2.0 * np.pi, 7)[:-1] + 0.1 * (i + 1)
        lat = lat0 + radius_deg * np.sin(ang)
        lng = lng0 + radius_deg * np.cos(ang) / max(
            np.cos(np.deg2rad(lat0)), 0.2)
        ring = np.stack([np.append(lng, lng[0]), np.append(lat, lat[0])],
                        axis=1)
        geoms.append(region.prepare_geometry([[ring]]))
    return geoms


def coverage_table(geoms: list[dict], res: int,
                   mode: str = "centroid") -> pa.Table:
    """(polygon_id, cell) coverage rows for a list of prepared geometries.

    Tiling is per-polygon independent: fans out as Ray tasks when a session
    is up (same pattern as build_probe), serial driver loop otherwise."""
    def one(geom):
        return np.unique(region.polygon_to_cells(geom, res, mode))

    import ray

    if ray.is_initialized() and len(geoms) > 4:
        remote_one = ray.remote(num_cpus=1)(one)
        covers = ray.get([remote_one.remote(g) for g in geoms])
    else:
        covers = [one(g) for g in geoms]
    ids = [np.full(c.shape[0], pid, dtype=np.int64)
           for pid, c in enumerate(covers)]
    cells = np.concatenate(covers) if covers else np.empty(0, np.int64)
    ids = np.concatenate(ids) if ids else np.empty(0, np.int64)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(cells.view(np.uint64))],
        names=["polygon_id", "cell"])


def build_probe(geoms: list[dict], res: int, mode: str = "centroid",
                compact: bool = True) -> dict:
    """Broadcastable probe structure over the (compacted) coverage.

    Per resolution present in the compacted set: sorted unique cells with
    CSR offsets into the polygon-id array. A page cell matches polygon P if
    any ancestor (or itself) is in P's compacted coverage.

    mode="candidates" builds the exact-join candidate superset (centroid
    coverage + buffered outline, region.candidate_cells) — much cheaper
    than the prepared-relate "covers" coverage and sufficient when every
    match is re-verified per point.
    """
    def one(geom):
        if mode == "candidates":
            c = region.candidate_cells(geom, res)
        else:
            c = np.unique(region.polygon_to_cells(geom, res, mode))
        if compact and c.size:
            c = hierarchy.compact(c)
        return c

    # Polygon tiling is per-polygon independent: fan out as Ray tasks when a
    # cluster is up (driver loop otherwise).
    import ray

    if ray.is_initialized() and len(geoms) > 4:
        remote_one = ray.remote(num_cpus=1)(one)
        covers = ray.get([remote_one.remote(g) for g in geoms])
    else:
        covers = [one(g) for g in geoms]
    pairs_cell = []
    pairs_pid = []
    for pid, c in enumerate(covers):
        pairs_cell.append(c)
        pairs_pid.append(np.full(c.shape[0], pid, dtype=np.int64))
    cell = np.concatenate(pairs_cell) if pairs_cell else np.empty(0, np.int64)
    pid = np.concatenate(pairs_pid) if pairs_pid else np.empty(0, np.int64)
    probe: dict = {"res": res, "levels": []}
    rs = bits.get_resolution(cell)
    for r in np.unique(rs):
        m = rs == r
        c_r = cell[m]
        p_r = pid[m]
        order = np.argsort(c_r, kind="stable")
        c_r = c_r[order]
        p_r = p_r[order]
        uniq, starts = np.unique(c_r, return_index=True)
        counts = np.diff(np.append(starts, c_r.shape[0]))
        probe["levels"].append({"r": int(r), "cells": uniq, "starts": starts,
                                "counts": counts, "pids": p_r})
    return probe


def probe_cells(probe: dict, cells: np.ndarray):
    """Match page cells against the probe: returns (row, polygon_id)."""
    rows_out = []
    pids_out = []
    for lvl in probe["levels"]:
        anc = bits.cell_to_parent(cells, lvl["r"]) if lvl["r"] < probe["res"] \
            else cells
        pos = np.searchsorted(lvl["cells"], anc)
        pos = np.minimum(pos, max(lvl["cells"].shape[0] - 1, 0))
        hit = lvl["cells"].shape[0] > 0
        hit = (lvl["cells"][pos] == anc) if hit else np.zeros(len(anc), bool)
        rows = np.flatnonzero(hit)
        if rows.size == 0:
            continue
        counts = lvl["counts"][pos[rows]]
        starts = lvl["starts"][pos[rows]]
        take = np.repeat(starts, counts) + (
            np.arange(counts.sum()) -
            np.repeat(np.cumsum(counts) - counts, counts))
        rows_out.append(np.repeat(rows, counts))
        pids_out.append(lvl["pids"][take])
    if not rows_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(rows_out), np.concatenate(pids_out)


def pip_join(pages_ds, geoms: list[dict], *, res: int = 9,
             mode: str = "centroid", exact: bool = False,
             batch_size: int = 65536, use_actors: bool = False,
             concurrency: int = 4):
    """Join pages to polygons via H3 coverage.

    Returns Dataset(url, polygon_id, cell). With exact=True the match is the
    exact point-in-polygon predicate (coverage = covers mode candidates +
    per-point PIP recheck); otherwise cell-level containment per `mode`.
    use_actors=True runs the probe as a stateful actor pool
    (PolygonProbeStage) instead of stateless tasks.
    """
    import ray

    probe = build_probe(geoms, res, "candidates" if exact else mode)
    payload = {"probe": probe, "geoms": geoms if exact else None}
    ref = ray.put(payload)

    if use_actors:
        return pages_ds.select_columns(["url"]).map_batches(
            PolygonProbeStage,
            fn_constructor_kwargs={"payload_ref": ref, "res": res,
                                   "exact": exact},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)

    def fn(batch: pa.Table) -> pa.Table:
        data = ray.get(ref) if not isinstance(ref, dict) else ref
        urls = batch["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        lat, lng = pages_io.geotag(urls)
        cells = latlng.latlng_to_cell(lat, lng, res)
        row, pid = probe_cells(data["probe"], cells)
        if exact and row.size:
            keep = np.zeros(row.shape[0], dtype=bool)
            lat_r = np.deg2rad(lat)
            lng_r = np.deg2rad(lng)
            for p in np.unique(pid):
                m = pid == p
                keep[m] = region.contains_points(
                    data["geoms"][p], lat_r[row[m]], lng_r[row[m]])
            row = row[keep]
            pid = pid[keep]
        return pa.Table.from_arrays(
            [urls.take(pa.array(row)), pa.array(pid),
             pa.array(cells[row].view(np.uint64))],
            names=["url", "polygon_id", "cell"])

    return pages_ds.select_columns(["url"]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)


def pip_join_shuffle(pages_ds, geoms: list[dict], *, res: int = 9,
                     mode: str = "centroid", num_partitions: int = 32,
                     batch_size: int = 65536):
    """Hash-join variant of pip_join for coverage sets too large to
    broadcast (continental polygons at fine res): pages encode to cells,
    the coverage table builds in parallel Ray tasks, and Ray Data's hash
    join co-partitions both sides on the cell key.

    Same output schema as pip_join (url, polygon_id, cell). Prefer the
    broadcast probe whenever the compacted coverage fits in the object
    store — it avoids shuffling the page side entirely.
    """
    import ray.data as rd

    cov = rd.from_arrow(coverage_table(geoms, res, mode))

    def encode(batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        lat, lng = pages_io.geotag(urls)
        cells = latlng.latlng_to_cell(lat, lng, res)
        return pa.Table.from_arrays(
            [urls, pa.array(cells.view(np.uint64))], names=["url", "cell"])

    keyed = pages_ds.select_columns(["url"]).map_batches(
        encode, batch_format="pyarrow", batch_size=batch_size)
    return keyed.join(cov, join_type="inner",
                      num_partitions=num_partitions, on=("cell",))


class PolygonProbeStage:
    """Stateful actor-pool stage for the PIP join (north-star architecture:
    'actor pools for stateful polygon-index stages').

    __init__ runs once per actor: fetches the broadcast probe + geometries
    from the object store and keeps them resident; __call__ streams batches.
    Use via pip_join(use_actors=True) when the probe is expensive enough to
    amortize (very large coverage) or when per-batch object-store fetches
    contend; the stateless-task path is equivalent for small probes.
    """

    def __init__(self, payload_ref, res: int, exact: bool):
        import ray

        data = ray.get(payload_ref) if not isinstance(payload_ref, dict) \
            else payload_ref
        self.probe = data["probe"]
        self.geoms = data["geoms"]
        self.res = res
        self.exact = exact

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        lat, lng = pages_io.geotag(urls)
        cells = latlng.latlng_to_cell(lat, lng, self.res)
        row, pid = probe_cells(self.probe, cells)
        if self.exact and row.size:
            keep = np.zeros(row.shape[0], dtype=bool)
            lat_r = np.deg2rad(lat)
            lng_r = np.deg2rad(lng)
            for p in np.unique(pid):
                m = pid == p
                keep[m] = region.contains_points(
                    self.geoms[p], lat_r[row[m]], lng_r[row[m]])
            row = row[keep]
            pid = pid[keep]
        return pa.Table.from_arrays(
            [urls.take(pa.array(row)), pa.array(pid),
             pa.array(cells[row].view(np.uint64))],
            names=["url", "polygon_id", "cell"])

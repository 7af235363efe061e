"""Raster<->vector tile assignment and distributed compact.

- `tile_assign`: vector->tile via cellToParent (each page row gets its tile);
  tile->cells via children expansion.
- `compact_cells_dataset`: distributed compactCells. Compaction never crosses
  a base-cell (res-0) subtree, so hash-partitioning by an intermediate parent
  resolution and locally compacting each group is exact as long as cells that
  compacted all the way to the group key get a second, much smaller pass
  grouped by base cell (SURVEY.md §3.3 two-round shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import bits, hierarchy
from ..ops import stages


def tile_assign(pages_ds, res: int = 9, tile_res: int = 5):
    """pages -> (url, cell_r{res}, tile = parent at tile_res)."""
    from .geotag import geotag_cells

    return geotag_cells(pages_ds, res=res, parent_res=tile_res,
                        keep_cols=("url",)).select_columns(
        ["url", f"cell_r{res}", f"parent_r{tile_res}"])


def tiles_to_cells(tiles_ds, tile_col: str, child_res: int,
                   keep_cols: tuple[str, ...] = ()):
    """tile->cells: uncompact each tile to `child_res` (flat map)."""
    return tiles_ds.map_batches(
        stages.children_expand_stage(child_res, tile_col, list(keep_cols)),
        batch_format="pyarrow", batch_size=4096)


SHUFFLE_COMPACT_THRESHOLD = 50_000_000


def compact_cells_dataset(cells_ds, cell_col: str = "cell",
                          group_res: int = 2,
                          shuffle: bool | None = None,
                          distinct_estimate: int | None = None):
    """Distributed compactCells over a Dataset of same-res cells.

    Driver path (shuffle=False): batch-local distinct (the big reduction —
    duplicates never leave their block), then ONE final task compacts the
    merged distinct set with vectorized numpy (compact of N distinct cells
    is ~N log N; 10M cells ~ a second). Valid while the distinct-cell set
    fits one block (~100M rows).

    Shuffle path (shuffle=True): hash-group by parent at `group_res`; local
    compact per group (exact — compaction never crosses a res-0 subtree);
    tiny second pass for cells that compacted up to the group key
    (SURVEY.md §3.3 two-round shuffle).

    shuffle=None auto-selects: the shuffle path when `distinct_estimate`
    (upper bound on distinct cells, e.g. rows of the input) exceeds
    SHUFFLE_COMPACT_THRESHOLD, else the driver path.
    """
    if shuffle is None:
        shuffle = (distinct_estimate or 0) > SHUFFLE_COMPACT_THRESHOLD
    if not shuffle:
        def batch_distinct(batch: pa.Table) -> pa.Table:
            cells = np.unique(batch[cell_col].to_numpy(zero_copy_only=False))
            return pa.Table.from_arrays([pa.array(cells)], names=[cell_col])

        def final_compact(batch: pa.Table) -> pa.Table:
            cells = bits.as_i64(batch[cell_col].to_numpy(
                zero_copy_only=False))
            out = hierarchy.compact_mixed(np.unique(cells))
            return pa.Table.from_arrays([pa.array(bits.as_u64(out))],
                                        names=[cell_col])

        distinct = cells_ds.map_batches(batch_distinct,
                                        batch_format="pyarrow",
                                        batch_size=131072)
        import ray.data as rd

        from ..ops.reduce import driver_merge

        return rd.from_arrow(driver_merge(distinct, final_compact))

    # NOTE (round-5 measured): scoping a small target_max_block_size here
    # (the ngram_jaccard_pairs trick) makes this path 2.3x SLOWER, not
    # faster — the build-time context covers the whole fused plan
    # including the upstream encode, which drowns in tiny blocks. The
    # per-bucket compact is cheap (np.unique + bit math) so the 128 MiB
    # packing is not the bottleneck here; the sort exchange is.
    def local_compact(group: pa.Table) -> pa.Table:
        cells = bits.as_i64(group[cell_col].to_numpy(zero_copy_only=False))
        out = hierarchy.compact(np.unique(cells))
        return pa.Table.from_arrays([pa.array(bits.as_u64(out))],
                                    names=[cell_col])

    def batch_distinct(batch: pa.Table) -> pa.Table:
        cells = np.unique(batch[cell_col].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays([pa.array(cells)], names=[cell_col])

    # Batch-local distinct first so the shuffle moves unique cells only.
    # Reducers group by HASH BUCKET of the parent key, not by parent value:
    # every cell of a given res-`group_res` subtree still lands in one
    # group (exactness preserved), but the groupby handles ~num_buckets
    # groups instead of one tiny Python callback per distinct parent
    # (measured 2x on the bench compact query).
    from ..io.pages import _mix64
    from ..ops.skew import default_num_buckets

    nb = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        gkey = batch["_gkey"].to_numpy(zero_copy_only=False)
        h = _mix64(gkey.astype(np.uint64))
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(nb)).astype(np.int32)))

    keyed = cells_ds.map_batches(batch_distinct, batch_format="pyarrow",
                                 batch_size=65536).map_batches(
        stages.parent_stage(group_res, cell_col=cell_col, out_col="_gkey"),
        batch_format="pyarrow", batch_size=65536).map_batches(
        add_bucket, batch_format="pyarrow")
    round1 = keyed.groupby("_bucket").map_groups(
        local_compact, batch_format="pyarrow").select_columns([cell_col])

    # Split: anything still finer than group_res is final.
    def split_fine(batch: pa.Table) -> pa.Table:
        cells = bits.as_i64(batch[cell_col].to_numpy(zero_copy_only=False))
        fine = bits.get_resolution(cells) > group_res
        return pa.Table.from_arrays(
            [pa.array(bits.as_u64(cells)), pa.array(fine)],
            names=[cell_col, "_fine"])

    flagged = round1.map_batches(split_fine, batch_format="pyarrow")
    fine = flagged.filter(expr="_fine == True").select_columns([cell_col])
    coarse = flagged.filter(expr="_fine == False").select_columns([cell_col])

    def base_compact(group: pa.Table) -> pa.Table:
        cells = bits.as_i64(group[cell_col].to_numpy(zero_copy_only=False))
        merged = hierarchy.compact_mixed(np.unique(cells))
        return pa.Table.from_arrays([pa.array(bits.as_u64(merged))],
                                    names=[cell_col])

    coarse_keyed = coarse.map_batches(
        stages.parent_stage(0, cell_col=cell_col, out_col="_bkey"),
        batch_format="pyarrow")
    round2 = coarse_keyed.groupby("_bkey").map_groups(
        base_compact, batch_format="pyarrow").select_columns([cell_col])

    return fine.union(round2)


def dissolve_groups(ds, group_col: str, cell_col: str = "cell",
                    resolution: int | None = None):
    """Distributed cellsToLinkedMultiPolygon per group.

    groupby(group_col) shuffles each group's cells to one worker; the local
    linked-arc dissolve runs per group (SURVEY.md §2.4: dissolve is local to
    a cell-set partition). Output rows are fully relational:
    (group, poly_idx, ring_idx, vert_idx, lng, lat) — exterior ring_idx 0.
    """
    from ..kernels import solvent

    def local_dissolve(group: pa.Table) -> pa.Table:
        cells = np.unique(bits.as_i64(
            group[cell_col].to_numpy(zero_copy_only=False)))
        polys = solvent.dissolve(cells, resolution=resolution)
        gval = group[group_col][0].as_py()
        g, p, r, v, lng, lat = [], [], [], [], [], []
        for pi, poly in enumerate(polys):
            for ri, ring in enumerate(poly):
                k = ring.shape[0]
                g.extend([gval] * k)
                p.extend([pi] * k)
                r.extend([ri] * k)
                v.extend(range(k))
                lng.extend(ring[:, 0].tolist())
                lat.extend(ring[:, 1].tolist())
        return pa.Table.from_arrays(
            [pa.array(g), pa.array(p, pa.int32()), pa.array(r, pa.int32()),
             pa.array(v, pa.int32()), pa.array(lng, pa.float64()),
             pa.array(lat, pa.float64())],
            names=[group_col, "poly_idx", "ring_idx", "vert_idx",
                   "lng", "lat"])

    return ds.groupby(group_col).map_groups(local_dissolve,
                                            batch_format="pyarrow")


def dissolve_cells_distributed(cells_ds, cell_col: str = "cell",
                               partition_res: int = 2):
    """Exact distributed dissolve: per-partition edge cancellation, then a
    boundary-only global merge (SURVEY.md §2.4 distributed variant).

    Stage 1 (the heavy, fully parallel part): hash-partition cells by their
    parent at `partition_res`; within each partition every directed edge
    whose twin is also in the partition cancels locally. Only surviving
    edges — the true boundary plus the partition-cut edges, O(perimeter)
    rather than O(area) — leave the partition.

    Stage 2 (tiny): cancel opposite pairs across partitions, then stitch the
    remaining true-boundary edges into rings with the hop-over walk
    (solvent.dissolve_boundary_edges). Returns the polygon list (driver
    side, boundary-proportional memory).
    """
    from ..kernels import edgevertex as ev
    from ..kernels import solvent
    from ..ops.reduce import driver_merge

    keyed = cells_ds.map_batches(
        stages.parent_stage(partition_res, cell_col=cell_col,
                            out_col="_pkey"),
        batch_format="pyarrow", batch_size=65536)

    def local_cancel(group: pa.Table) -> pa.Table:
        cells = np.unique(bits.as_i64(
            group[cell_col].to_numpy(zero_copy_only=False)))
        _, edges = ev.origin_to_directed_edges(cells)
        rev = ev.edge_reverse(edges)
        surv = edges[~np.isin(rev, edges)]
        return pa.Table.from_arrays([pa.array(bits.as_u64(surv))],
                                    names=["edge"])

    survivors = keyed.groupby("_pkey").map_groups(local_cancel,
                                                  batch_format="pyarrow")

    def global_cancel(batch: pa.Table) -> pa.Table:
        edges = bits.as_i64(batch["edge"].to_numpy(zero_copy_only=False))
        rev = ev.edge_reverse(edges)
        alive = edges[~np.isin(rev, edges)]
        return pa.Table.from_arrays([pa.array(bits.as_u64(alive))],
                                    names=["edge"])

    merged = driver_merge(survivors, global_cancel)
    edges = bits.as_i64(merged["edge"].to_numpy(zero_copy_only=False))
    return solvent.dissolve_boundary_edges(edges)

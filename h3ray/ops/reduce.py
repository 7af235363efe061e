"""Small-result reduction helpers.

Ray Data's `repartition(1)` is an all-to-all operator: at low parallelism it
stalls the streaming executor far beyond the data volume involved (measured
3x wall on combiner-sized partials). For partial-aggregate outputs that are
small BY CONSTRUCTION (combiner pattern: <= #blocks x #keys rows), the right
tree-reduce root is the driver: stream the partial blocks with
`iter_batches` (backpressured, no materialization of anything big) and merge
with one vectorized numpy/arrow pass. The result re-enters Ray Data via
`from_arrow` when a Dataset is needed downstream.

For genuinely unbounded key spaces, use the groupby/shuffle paths instead
(e.g. compact_cells_dataset(shuffle=True)).
"""

from __future__ import annotations

import pyarrow as pa


def driver_merge(ds, merge_fn, schema: pa.Schema | None = None) -> pa.Table:
    """Stream a small partial-aggregate Dataset to the driver and merge."""
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
              else b
              for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None)]
    non_empty = [t for t in tables if t.num_rows]
    if not non_empty:
        # Preserve schema stability for empty results: explicit schema, else
        # an empty batch's schema, else the (already-executed) dataset's.
        if schema is None and tables:
            schema = tables[0].schema
        if schema is None:
            ds_schema = ds.schema(fetch_if_missing=True)
            schema = getattr(ds_schema, "base_schema", None)
        empty = pa.Table.from_arrays(
            [pa.array([], f.type) for f in schema], schema=schema) \
            if schema is not None else pa.table({})
        return merge_fn(empty) if schema is not None else empty
    return merge_fn(pa.concat_tables(non_empty).combine_chunks())


def grouped_mode(ds, key_col: str, value_col: str,
                 out_col: str = "mode_value") -> pa.Table:
    """Per-key MODE (most frequent value), ties broken by smallest value —
    fully deterministic, matching a ROW_NUMBER()-over-counts SQL mirror.

    For bounded (key, value) pair spaces (label x label, source x lang):
    a per-batch Arrow group-count combiner collapses each batch to its
    distinct pairs, the bounded partials driver-merge, and one vectorized
    lexsort picks each key's (count DESC, value ASC) winner. Unbounded
    value spaces should pre-bucket instead (see ops.skew)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col], value_col: batch[value_col]})
        g = t.group_by([key_col, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([key_col, value_col, "_n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, value_col]).aggregate([("_n", "sum")])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        vals = g[value_col].to_numpy(zero_copy_only=False)
        cnt = g["_n_sum"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, -cnt, keys))
        ks = keys[order]
        first = np.ones(ks.shape[0], dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        win = order[first]
        return pa.Table.from_arrays(
            [g[key_col].take(pa.array(win)),
             g[value_col].take(pa.array(win)),
             pa.array(cnt[win])],
            names=[key_col, out_col, "mode_count"])

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge)


def pivot_counts(ds, row_col: str, col_col: str, col_values: list,
                 prefix: str = "c") -> pa.Table:
    """Crosstab: one output row per row_col value, one int64 count column
    per entry of `col_values` (fixed, caller-declared columns — the schema
    must not depend on the data). Per-batch (row, col) pair-count
    combiner, bounded driver merge, then a vectorized scatter into the
    |rows| x |cols| matrix. Values outside col_values are dropped."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({row_col: batch[row_col], col_col: batch[col_col]})
        g = t.group_by([row_col, col_col]).aggregate([([], "count_all")])
        return g.rename_columns([row_col, col_col, "_n"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([row_col, col_col]).aggregate([("_n", "sum")])
        rows = g[row_col].to_numpy(zero_copy_only=False)
        cols = g[col_col].to_numpy(zero_copy_only=False)
        cnt = g["_n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        urows = np.unique(rows)
        ri = np.searchsorted(urows, rows)
        lookup = {v: j for j, v in enumerate(col_values)}
        cj = np.array([lookup.get(v, -1) for v in cols], dtype=np.int64)
        mat = np.zeros((urows.shape[0], len(col_values)), dtype=np.int64)
        ok = cj >= 0
        np.add.at(mat, (ri[ok], cj[ok]), cnt[ok])
        return pa.Table.from_arrays(
            [pa.array(urows)]
            + [pa.array(mat[:, j]) for j in range(len(col_values))],
            names=[row_col] + [f"{prefix}{v}" for v in col_values])

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge)


def profile_numeric(ds, cols: list) -> pa.Table:
    """Dataset profiler: one row per numeric column with
    (n_rows, n_null, min_micro, max_micro, sum_micro) — every statistic an
    exact micro-scaled int64 (floor(x*1e6+0.5)), so sums are
    summation-order-free and engine-portable. One combiner row per column
    per batch, bounded driver merge; all-null columns profile with null
    min/max/sum."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_null": [],
                "min_micro": [], "max_micro": [], "sum_micro": []}
        for c in cols:
            col = batch[c]
            arr = col.drop_null().to_numpy(zero_copy_only=False)
            v = np.floor(arr.astype(np.float64) * 1_000_000 + 0.5) \
                .astype(np.int64)
            rows["column"].append(c)
            rows["n_rows"].append(len(col))
            rows["n_null"].append(col.null_count)
            rows["min_micro"].append(int(v.min()) if v.size else None)
            rows["max_micro"].append(int(v.max()) if v.size else None)
            rows["sum_micro"].append(int(v.sum()) if v.size else None)
        return pa.table({
            "column": pa.array(rows["column"], type=pa.string()),
            "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
            "n_null": pa.array(rows["n_null"], type=pa.int64()),
            "min_micro": pa.array(rows["min_micro"], type=pa.int64()),
            "max_micro": pa.array(rows["max_micro"], type=pa.int64()),
            "sum_micro": pa.array(rows["sum_micro"], type=pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("column").aggregate(
            [("n_rows", "sum"), ("n_null", "sum"), ("min_micro", "min"),
             ("max_micro", "max"), ("sum_micro", "sum")])
        return g.rename_columns(["column", "n_rows", "n_null",
                                 "min_micro", "max_micro", "sum_micro"])

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge)


def grouped_string_agg_distinct(ds, key_col: str, value_col: str,
                                sep: str = ",",
                                out_col: str = "agg_value") -> pa.Table:
    """Per-key ordered DISTINCT string concatenation (SQL
    string_agg(DISTINCT v, sep ORDER BY v)) for bounded (key, value) pair
    spaces: per-batch distinct-pair combiner, bounded driver merge, one
    lexsort, then per-key joins over the already-distinct pair rows (the
    output is pair-space-sized by construction)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col], value_col: batch[value_col]})
        g = t.group_by([key_col, value_col]).aggregate([])
        return g

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([key_col, value_col]).aggregate([])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        vals = g[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, keys))
        ks, vs = keys[order], vals[order]
        first = np.ones(ks.shape[0], dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        bounds = np.flatnonzero(first).tolist() + [ks.shape[0]]
        out_keys = [ks[b] for b in bounds[:-1]]
        out_vals = [sep.join(vs[bounds[i]:bounds[i + 1]])
                    for i in range(len(bounds) - 1)]
        return pa.Table.from_arrays(
            [pa.array(out_keys, type=g[key_col].type),
             pa.array(out_vals, type=pa.string())],
            names=[key_col, out_col])

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow"),
                        merge)


def unpivot(ds, id_col: str, value_cols: list,
            name_col: str = "metric", value_col: str = "value"):
    """Melt / UNPIVOT: (id, c1..ck) wide rows -> (id, metric, value) long
    rows, k per input row — one stacked sub-table per value column, pure
    per-batch Arrow concatenation, no shuffle. Value columns are cast to
    int64 (use exact integer metrics; float melts forfeit hash parity)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        parts = [pa.table({
            id_col: batch[id_col],
            name_col: pa.array([c] * batch.num_rows, type=pa.string()),
            value_col: pc.cast(batch[c], pa.int64())})
            for c in value_cols]
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")

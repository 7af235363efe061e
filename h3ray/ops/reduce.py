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


def _moment_partial_fn(key_col: str, x_col: str, y_col: str,
                       chunk_rows: int):
    """Per-batch chunked int64 bivariate moment combiner — emits exact
    (n, sx, sy, sxx, syy, sxy) partials per key over <= chunk_rows row
    slices (4096 keeps x*x sums under int64 at 1e7-magnitude inputs).
    Shared by grouped_corr_exact and grouped_regr_slope_exact."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_k, sums = [], []
        for s in range(0, x.shape[0], chunk_rows):
            e = min(s + chunk_rows, x.shape[0])
            karr = keys.slice(s, e - s).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(karr, return_inverse=True)
            m = uniq.shape[0]
            acc = np.zeros((m, 6), dtype=np.int64)
            np.add.at(acc[:, 0], inv, 1)
            np.add.at(acc[:, 1], inv, x[s:e])
            np.add.at(acc[:, 2], inv, y[s:e])
            np.add.at(acc[:, 3], inv, x[s:e] * x[s:e])
            np.add.at(acc[:, 4], inv, y[s:e] * y[s:e])
            np.add.at(acc[:, 5], inv, x[s:e] * y[s:e])
            out_k.append(uniq)
            sums.append(acc)
        if not out_k:
            return pa.table({key_col: pa.array([], keys.type),
                             "_n": pa.array([], pa.int64()),
                             "_sx": pa.array([], pa.int64()),
                             "_sy": pa.array([], pa.int64()),
                             "_sxx": pa.array([], pa.int64()),
                             "_syy": pa.array([], pa.int64()),
                             "_sxy": pa.array([], pa.int64())})
        ks = np.concatenate(out_k)
        a = np.concatenate(sums, axis=0)
        return pa.table({key_col: pa.array(ks, type=keys.type),
                         "_n": a[:, 0], "_sx": a[:, 1], "_sy": a[:, 2],
                         "_sxx": a[:, 3], "_syy": a[:, 4],
                         "_sxy": a[:, 5]})

    return partial


def grouped_regr_slope_exact(ds, key_col: str, x_col: str, y_col: str,
                             out_col: str = "slope",
                             chunk_rows: int = 4096) -> pa.Table:
    """Exact per-key least-squares slope of INTEGER y on INTEGER x:
        slope = (n*sxy - sx*sy) / (n*sxx - sx^2)
    Same exact-integer-moments design as grouped_corr_exact (shared
    combiner); numerator and denominator are arbitrary-precision Python
    ints at the root, so the ONLY float op is one IEEE division of two
    exactly-rounded operands — bit-identical to a SQL engine computing
    the same expression from HUGEINT sums (NOT to REGR_SLOPE, whose
    internal accumulation is float). Keys with zero x-variance emit
    NULL. Returns pa.Table (key_col, out_col)."""
    partials = ds.map_batches(
        _moment_partial_fn(key_col, x_col, y_col, chunk_rows),
        batch_format="pyarrow", batch_size=131072)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if len(df) == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             out_col: pa.array([], pa.float64())})
        for c in ("_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"):
            df[c] = df[c].astype(object)
        g = df.groupby(key_col, sort=True, as_index=False).sum()
        vals = []
        for _, r in g.iterrows():
            n, sx, sy = int(r["_n"]), int(r["_sx"]), int(r["_sy"])
            num = n * int(r["_sxy"]) - sx * sy
            den = n * int(r["_sxx"]) - sx * sx
            vals.append(None if den <= 0 else float(num) / float(den))
        return pa.table({key_col: pa.array(g[key_col].tolist()),
                         out_col: pa.array(vals, type=pa.float64())})

    return driver_merge(partials, merge)


def grouped_corr_exact(ds, key_col: str, x_col: str, y_col: str,
                       out_col: str = "corr",
                       chunk_rows: int = 4096) -> pa.Table:
    """Exact per-key Pearson correlation of two INTEGER columns.

    Float summation is grouping-dependent (numpy pairwise vs SQL
    sequential differ in the last bits), so the moments are accumulated as
    EXACT integers instead: per-batch combiners emit int64 partial sums
    (n, sx, sy, sxx, syy, sxy) over <= chunk_rows row slices (4096 rows
    keeps x*x sums under int64 even at 1e7-magnitude inputs), the driver
    tree-root merges them in arbitrary-precision Python ints, and the only
    float ops are the FINAL formula
        corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
    on exact-integer operands — one rounding per operand, then IEEE
    mul/div/sqrt, bit-identical to a SQL engine computing the same
    expression from HUGEINT sums. Keys with zero variance emit NULL.
    Returns pa.Table (key_col, out_col)."""
    import math

    partials = ds.map_batches(
        _moment_partial_fn(key_col, x_col, y_col, chunk_rows),
        batch_format="pyarrow", batch_size=131072)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if len(df) == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             out_col: pa.array([], pa.float64())})
        # object dtype => Python ints => no int64 overflow in the merge.
        for c in ("_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"):
            df[c] = df[c].astype(object)
        g = df.groupby(key_col, sort=True, as_index=False).sum()
        vals = []
        for _, r in g.iterrows():
            n, sx, sy = int(r["_n"]), int(r["_sx"]), int(r["_sy"])
            cov = n * int(r["_sxy"]) - sx * sy
            vx = n * int(r["_sxx"]) - sx * sx
            vy = n * int(r["_syy"]) - sy * sy
            if vx <= 0 or vy <= 0:
                vals.append(None)
            else:
                vals.append(float(cov)
                            / (math.sqrt(float(vx)) * math.sqrt(float(vy))))
        return pa.table({key_col: pa.array(g[key_col].tolist()),
                         out_col: pa.array(vals, type=pa.float64())})

    return driver_merge(partials, merge)


def grouped_var_exact(ds, key_col: str, x_col: str, scale: int = 100,
                      chunk_rows: int = 4096) -> pa.Table:
    """Exact per-key sample variance + stddev of a fixed-point column.

    Same design as grouped_corr_exact: `x_col` is micro-scaled to int64
    (FLOOR(x*scale + 0.5) — pick `scale` so the data is exactly
    representable, e.g. 100 for 2-decimal values), per-batch combiners
    emit chunked int64 (n, s, ss) partials, the driver root merges them
    as arbitrary-precision Python ints, and the only float ops are the
    FINAL mirrored formula
        var  = (n*ss - s^2) / (n*(n-1)) / scale^2
        std  = sqrt(var)
    — one rounding per exact-integer operand then IEEE div/sqrt, so a SQL
    engine computing VAR_SAMP from HUGEINT sums of the SAME scaled ints
    matches bit-for-bit. Keys with n < 2 emit NULL (SQL VAR_SAMP).
    Returns pa.Table (key_col, n_rows, var_value, stddev_value)."""
    import math

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        xf = batch[x_col].to_numpy(zero_copy_only=False)
        x = np.floor(xf * scale + 0.5).astype(np.int64)
        out_k, sums = [], []
        for s in range(0, x.shape[0], chunk_rows):
            e = min(s + chunk_rows, x.shape[0])
            karr = keys.slice(s, e - s).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(karr, return_inverse=True)
            acc = np.zeros((uniq.shape[0], 3), dtype=np.int64)
            np.add.at(acc[:, 0], inv, 1)
            np.add.at(acc[:, 1], inv, x[s:e])
            np.add.at(acc[:, 2], inv, x[s:e] * x[s:e])
            out_k.append(uniq)
            sums.append(acc)
        if not out_k:
            return pa.table({key_col: pa.array([], keys.type),
                             "_n": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.int64()),
                             "_ss": pa.array([], pa.int64())})
        ks = np.concatenate(out_k)
        a = np.concatenate(sums, axis=0)
        return pa.table({key_col: pa.array(ks, type=keys.type),
                         "_n": a[:, 0], "_s": a[:, 1], "_ss": a[:, 2]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=131072)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if len(df) == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64()),
                             "var_value": pa.array([], pa.float64()),
                             "stddev_value": pa.array([], pa.float64())})
        for c in ("_n", "_s", "_ss"):
            df[c] = df[c].astype(object)
        g = df.groupby(key_col, sort=True, as_index=False).sum()
        ns, variances, stds = [], [], []
        sq = float(scale) * float(scale)
        for _, r in g.iterrows():
            n, s, ss = int(r["_n"]), int(r["_s"]), int(r["_ss"])
            ns.append(n)
            if n < 2:
                variances.append(None)
                stds.append(None)
                continue
            v = float(n * ss - s * s) / float(n * (n - 1)) / sq
            variances.append(v)
            stds.append(math.sqrt(v))
        return pa.table({key_col: pa.array(g[key_col].tolist()),
                         "n_rows": pa.array(ns, type=pa.int64()),
                         "var_value": pa.array(variances, pa.float64()),
                         "stddev_value": pa.array(stds, pa.float64())})

    return driver_merge(partials, merge)


def _lattice_partial_schema(ds, col_a: str, col_b: str) -> pa.Schema:
    """Explicit schema of the rollup/cube combiner output, taken from the
    INPUT dataset's column types — so driver_merge can call merge on an
    empty table (emitting the SQL ()-grouping row) even when the mapped
    dataset is fully empty and Ray cannot infer the partial schema."""
    sch = ds.schema(fetch_if_missing=True)
    base = getattr(sch, "base_schema", None)
    if base is None:
        base = pa.schema(list(zip(sch.names, sch.types)))
    return pa.schema([pa.field(col_a, base.field(col_a).type),
                      pa.field(col_b, base.field(col_b).type),
                      pa.field("_n", pa.int64()),
                      pa.field("_s", pa.int64())])


def rollup_counts(ds, col_a: str, col_b: str, value_col: str,
                  count_col: str = "num_rows",
                  sum_col: str = "sum_value") -> pa.Table:
    """GROUP BY ROLLUP(col_a, col_b): COUNT(*) + SUM(int value) at three
    grouping levels — (a, b), (a, NULL), (NULL, NULL) — in ONE combiner
    pass: each batch collapses to its distinct (a, b) partials and the
    driver tree-root derives the coarser levels from the finest (the
    rollup lattice is algebraic, so upper levels cost nothing extra and
    never see raw rows). NULL marks the rolled-up column, as in SQL.

    Caveats (shared with cube_counts): actual NULL values in col_a/col_b
    would be conflated with the lattice's NULL marker rows — group columns
    must be non-null (true for every caller here); an empty input yields
    the single ()-grouping row with COUNT 0 / SUM NULL, like SQL."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({col_a: batch[col_a], col_b: batch[col_b],
                      "_v": pc.cast(batch[value_col], pa.int64())})
        g = t.group_by([col_a, col_b]).aggregate(
            [([], "count_all"), ("_v", "sum")])
        return g.rename_columns([col_a, col_b, "_n", "_s"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([col_a, col_b]).aggregate(
            [("_n", "sum"), ("_s", "sum")])
        a = g[col_a].to_pylist()
        b = g[col_b].to_pylist()
        n = g["_n_sum"].to_numpy(zero_copy_only=False)
        s = g["_s_sum"].to_numpy(zero_copy_only=False)
        rows_a: dict = {}
        for i, ka in enumerate(a):
            acc = rows_a.setdefault(ka, [0, 0])
            acc[0] += int(n[i])
            acc[1] += int(s[i])
        total = [sum(v[0] for v in rows_a.values()),
                 sum(v[1] for v in rows_a.values())]
        out_a = list(a) + list(rows_a) + [None]
        out_b = list(b) + [None] * (len(rows_a) + 1)
        out_n = list(n) + [v[0] for v in rows_a.values()] + [total[0]]
        out_s = list(s) + [v[1] for v in rows_a.values()] \
            + [total[1] if total[0] else None]
        return pa.table({col_a: pa.array(out_a, type=g[col_a].type),
                         col_b: pa.array(out_b, type=g[col_b].type),
                         count_col: pa.array(out_n, type=pa.int64()),
                         sum_col: pa.array(out_s, type=pa.int64())})

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=_lattice_partial_schema(ds, col_a, col_b))


def cube_counts(ds, col_a: str, col_b: str, value_col: str,
                count_col: str = "num_rows",
                sum_col: str = "sum_value") -> pa.Table:
    """GROUP BY CUBE(col_a, col_b): COUNT(*) + SUM(int value) at all four
    grouping levels — (a, b), (a, NULL), (NULL, b), (NULL, NULL) — derived
    from ONE combiner pass over the finest (a, b) partials, exactly like
    rollup_counts but with the b-marginal level added (the cube lattice is
    algebraic over the finest level, so raw rows are seen once).
    Same caveats as rollup_counts: non-null group columns only; empty
    input yields the ()-grouping row with COUNT 0 / SUM NULL."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({col_a: batch[col_a], col_b: batch[col_b],
                      "_v": pc.cast(batch[value_col], pa.int64())})
        g = t.group_by([col_a, col_b]).aggregate(
            [([], "count_all"), ("_v", "sum")])
        return g.rename_columns([col_a, col_b, "_n", "_s"])

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by([col_a, col_b]).aggregate(
            [("_n", "sum"), ("_s", "sum")])
        a = g[col_a].to_pylist()
        b = g[col_b].to_pylist()
        n = g["_n_sum"].to_numpy(zero_copy_only=False)
        s = g["_s_sum"].to_numpy(zero_copy_only=False)
        marg_a: dict = {}
        marg_b: dict = {}
        for i, (ka, kb) in enumerate(zip(a, b)):
            acc = marg_a.setdefault(ka, [0, 0])
            acc[0] += int(n[i])
            acc[1] += int(s[i])
            acc = marg_b.setdefault(kb, [0, 0])
            acc[0] += int(n[i])
            acc[1] += int(s[i])
        total = [sum(v[0] for v in marg_a.values()),
                 sum(v[1] for v in marg_a.values())]
        out_a = list(a) + list(marg_a) + [None] * (len(marg_b) + 1)
        out_b = list(b) + [None] * len(marg_a) + list(marg_b) + [None]
        out_n = (list(n) + [v[0] for v in marg_a.values()]
                 + [v[0] for v in marg_b.values()] + [total[0]])
        out_s = (list(s) + [v[1] for v in marg_a.values()]
                 + [v[1] for v in marg_b.values()]
                 + [total[1] if total[0] else None])
        return pa.table({col_a: pa.array(out_a, type=g[col_a].type),
                         col_b: pa.array(out_b, type=g[col_b].type),
                         count_col: pa.array(out_n, type=pa.int64()),
                         sum_col: pa.array(out_s, type=pa.int64())})

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=_lattice_partial_schema(ds, col_a, col_b))


def grouping_sets_counts(ds, cols: list[str], sets: list[tuple],
                         value_col: str, count_col: str = "num_rows",
                         sum_col: str = "sum_value") -> pa.Table:
    """GROUP BY GROUPING SETS over arbitrary column subsets — the general
    form of rollup_counts / cube_counts: ONE combiner pass at the finest
    (all-cols) granularity, then every requested set is an algebraic
    re-aggregation of those partials on the driver (raw rows are seen
    once; excluded columns emit NULL, as in SQL). Same caveats as the
    lattice siblings: group columns must be non-null (actual NULLs would
    conflate with the set markers); an empty input yields the ()-grouping
    row (COUNT 0 / SUM NULL) only if () is among `sets`."""
    import numpy as np
    import pyarrow.compute as pc

    cols = list(cols)
    sets = [tuple(s) for s in sets]
    for s in sets:
        unknown = set(s) - set(cols)
        if unknown:
            raise ValueError(f"set {s} names unknown columns {unknown}")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({**{c: batch[c] for c in cols},
                      "_v": pc.cast(batch[value_col], pa.int64())})
        g = t.group_by(cols).aggregate([([], "count_all"), ("_v", "sum")])
        return g.rename_columns(cols + ["_n", "_s"])

    def merge(t: pa.Table) -> pa.Table:
        fine = t.group_by(cols).aggregate([("_n", "sum"), ("_s", "sum")]) \
            .rename_columns(cols + ["_n", "_s"])
        types = {c: fine[c].type for c in cols}
        pieces = []
        for s in sets:
            if s:
                g = fine.group_by(list(s)).aggregate(
                    [("_n", "sum"), ("_s", "sum")]) \
                    .rename_columns(list(s) + ["_n", "_s"])
            else:
                n_tot = int(pc.sum(fine["_n"]).as_py() or 0)
                s_tot = pc.sum(fine["_s"]).as_py() if n_tot else None
                g = pa.table({"_n": pa.array([n_tot], pa.int64()),
                              "_s": pa.array([s_tot], pa.int64())})
            arrays, names = [], []
            for c in cols:
                names.append(c)
                if c in s:
                    arrays.append(g[c])
                else:
                    arrays.append(pa.array([None] * g.num_rows,
                                           type=types[c]))
            arrays += [pc.cast(g["_n"], pa.int64()),
                       pc.cast(g["_s"], pa.int64())]
            names += [count_col, sum_col]
            pieces.append(pa.table(dict(zip(names, arrays))))
        return pa.concat_tables(pieces)

    sch = ds.schema(fetch_if_missing=True)
    if sch is None:
        raise ValueError("grouping_sets_counts needs an input with a known "
                         "schema; seed an empty mapped input with "
                         "ops.join.seed_schema first")
    base = getattr(sch, "base_schema", None)
    if base is None:
        base = pa.schema(list(zip(sch.names, sch.types)))
    pschema = pa.schema([pa.field(c, base.field(c).type) for c in cols]
                        + [pa.field("_n", pa.int64()),
                           pa.field("_s", pa.int64())])
    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=pschema)


def _skyline_mask(lo, hi):
    """Boolean survivor mask of the 2-D skyline (minimize lo, maximize
    hi) over exact int64 arrays. A point survives iff no other point has
    lo' <= lo AND hi' >= hi with at least one strict — exact duplicates
    all survive (nothing strictly beats them). One lexsort + one prefix
    max, O(n log n), fully deterministic."""
    import numpy as np

    n = lo.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-hi, lo))          # lo asc, hi desc within lo
    lo_s, hi_s = lo[order], hi[order]
    new = np.r_[True, lo_s[1:] != lo_s[:-1]]
    gidx = np.cumsum(new) - 1
    gmax = hi_s[new]                       # per-lo-group max hi
    prev = np.r_[np.iinfo(np.int64).min,
                 np.maximum.accumulate(gmax)[:-1]]
    keep_s = (hi_s == gmax[gidx]) & (gmax[gidx] > prev[gidx])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_s
    return mask


def skyline_2d(ds, id_col: str, min_col: str, max_col: str) -> pa.Table:
    """Distributed 2-D skyline (Pareto front): the rows for which no
    other row is <= on min_col AND >= on max_col with one strict
    inequality. Returns a pa.Table (id_col, min_col, max_col), int64
    throughout, sorted by id.

    Block-local skyline inside map_batches, then one skyline over the
    union of block survivors at the driver root — correct because every
    global skyline point survives its own block's skyline and dominance
    is transitive, so the union contains the global front. The exchange
    moves only block survivors (O(log n) expected per block on
    independently-distributed dimensions); a deliberately
    anti-correlated corpus whose front IS the dataset would need a
    two-level grid-partitioned merge instead — out of scope here and
    loudly visible as a fat root if it ever happens."""
    import numpy as np

    cols = [id_col, min_col, max_col]
    schema = pa.schema([(c, pa.int64()) for c in cols])

    def local(batch: pa.Table) -> pa.Table:
        lo = batch[min_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hi = batch[max_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mask = _skyline_mask(lo, hi)
        return pa.table({
            id_col: batch[id_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)[mask],
            min_col: lo[mask], max_col: hi[mask]})

    def merge(t: pa.Table) -> pa.Table:
        lo = t[min_col].to_numpy(zero_copy_only=False)
        hi = t[max_col].to_numpy(zero_copy_only=False)
        mask = _skyline_mask(lo, hi)
        ids = t[id_col].to_numpy(zero_copy_only=False)[mask]
        order = np.argsort(ids, kind="stable")
        return pa.table({id_col: ids[order],
                         min_col: lo[mask][order],
                         max_col: hi[mask][order]})

    return driver_merge(ds.map_batches(local, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=schema)


def cohort_counts(ds, user_col: str, month_col: str) -> pa.Table:
    """Cohort-retention matrix: for every (first-active month, month
    offset k) pair, how many distinct users from that cohort were active
    k months later. Input needs a user int column and a timestamp
    column; returns (cohort_month str 'YYYY-MM', month_k int64,
    n_customers int64).

    Batch-local DISTINCT (user, month) pairs packed into one int64
    (user * 2^16 + months-since-1970) are the only exchange; the root
    deduplicates the bounded |users| x |months| pair space, derives each
    user's cohort with one run-detection pass over the pack-sorted
    array (monotone packing => sorted by (user, month)), and bincounts
    (cohort, k). No shuffle, no per-user groups."""
    import numpy as np

    pair_schema = pa.schema([("k", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = batch[month_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        if (m < 0).any() or (m >= 65536).any():
            raise ValueError("cohort_counts: month outside 1970..7432")
        return pa.table({"k": np.unique(u * 65536 + m)})

    def merge(t: pa.Table) -> pa.Table:
        k = np.unique(t["k"].to_numpy(zero_copy_only=False))
        if k.shape[0] == 0:
            return pa.table({"cohort_month": pa.array([], pa.string()),
                             "month_k": pa.array([], pa.int64()),
                             "n_customers": pa.array([], pa.int64())})
        u = k >> 16
        m = k & 65535
        first = np.r_[True, u[1:] != u[:-1]]
        cohort = m[first][np.cumsum(first) - 1]
        off = m - cohort
        ck, counts = np.unique(cohort * 65536 + off, return_counts=True)
        cm = (ck >> 16).astype("datetime64[M]")
        return pa.table({
            "cohort_month": pa.array(np.datetime_as_string(cm)),
            "month_k": (ck & 65535).astype(np.int64),
            "n_customers": counts.astype(np.int64)})

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=pair_schema)


def ohlc_daily(ds, key_col: str, ts_col: str, value_col: str) -> pa.Table:
    """Daily OHLC candles per key: per (key, day) the open (MIN value
    among rows at the earliest timestamp — a deterministic, SQL-mirrorable
    tie rule), close (MAX value at the latest timestamp), low, high and
    row count. Returns (key, day 'YYYY-MM-DD', open, high, low, close
    float64, n_events int64).

    Combiner shape: each batch collapses to one candle per (key, day)
    (candle merge is associative — compare timestamps, then apply the
    tie rule on equal boundaries), so the root merges |keys| x |days|
    bounded partials. Values only move through MIN/MAX comparisons —
    no float arithmetic ever happens, so float64 passes through
    bit-exactly."""
    import numpy as np

    INT_MIN = np.iinfo(np.int64).min

    def candles(key, day, ts, val, n_in):
        """One candle row per (key, day) from per-row (or per-partial
        boundary) data; n_in sums into n_events."""
        import numpy as np

        comp = np.char.add(np.char.add(key.astype(np.str_), "\x1f"), day)
        uniq, inv = np.unique(comp, return_inverse=True)
        m = uniq.shape[0]
        mn_ts = np.full(m, np.iinfo(np.int64).max, np.int64)
        mx_ts = np.full(m, INT_MIN, np.int64)
        np.minimum.at(mn_ts, inv, ts)
        np.maximum.at(mx_ts, inv, ts)
        lo = np.full(m, np.inf)
        hi = np.full(m, -np.inf)
        np.minimum.at(lo, inv, val)
        np.maximum.at(hi, inv, val)
        op = np.full(m, np.inf)
        cl = np.full(m, -np.inf)
        at_mn = ts == mn_ts[inv]
        at_mx = ts == mx_ts[inv]
        np.minimum.at(op, inv[at_mn], val[at_mn])
        np.maximum.at(cl, inv[at_mx], val[at_mx])
        n = np.zeros(m, np.int64)
        np.add.at(n, inv, n_in)
        k_out = np.array([u.split("\x1f", 1)[0] for u in uniq.tolist()])
        d_out = np.array([u.split("\x1f", 1)[1] for u in uniq.tolist()])
        return k_out, d_out, mn_ts, mx_ts, op, hi, lo, cl, n

    out_fields = [("key", pa.string()), ("day", pa.string()),
                  ("mn_ts", pa.int64()), ("mx_ts", pa.int64()),
                  ("open", pa.float64()), ("high", pa.float64()),
                  ("low", pa.float64()), ("close", pa.float64()),
                  ("n_events", pa.int64())]
    pschema = pa.schema(out_fields)

    def partial(batch: pa.Table) -> pa.Table:
        ts64 = batch[ts_col].to_numpy(zero_copy_only=False)
        day = np.datetime_as_string(ts64.astype("datetime64[D]"))
        ts = ts64.astype("datetime64[us]").astype(np.int64)
        val = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        key = batch[key_col].to_numpy(zero_copy_only=False)
        k, d, mn, mx, op, hi, lo, cl, n = candles(
            key, day, ts, val, np.ones(ts.shape[0], np.int64))
        return pa.table(dict(zip(
            [f[0] for f in out_fields],
            [pa.array(k, pa.string()), pa.array(d, pa.string()),
             mn, mx, op, hi, lo, cl, n])))

    def merge(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        if key.shape[0] == 0:
            return pa.table({
                "key": pa.array([], pa.string()),
                "day": pa.array([], pa.string()),
                "open": pa.array([], pa.float64()),
                "high": pa.array([], pa.float64()),
                "low": pa.array([], pa.float64()),
                "close": pa.array([], pa.float64()),
                "n_events": pa.array([], pa.int64())})
        # re-run the candle combine over partial boundary rows: each
        # partial candle contributes its open at mn_ts and its close at
        # mx_ts; min/max/count fold directly
        mn = t["mn_ts"].to_numpy(zero_copy_only=False)
        mx = t["mx_ts"].to_numpy(zero_copy_only=False)
        op = t["open"].to_numpy(zero_copy_only=False)
        cl = t["close"].to_numpy(zero_copy_only=False)
        lo = t["low"].to_numpy(zero_copy_only=False)
        hi = t["high"].to_numpy(zero_copy_only=False)
        n = t["n_events"].to_numpy(zero_copy_only=False)
        comp = np.char.add(np.char.add(key.astype(np.str_), "\x1f"),
                           day.astype(np.str_))
        uniq, inv = np.unique(comp, return_inverse=True)
        m = uniq.shape[0]
        gmn = np.full(m, np.iinfo(np.int64).max, np.int64)
        gmx = np.full(m, INT_MIN, np.int64)
        np.minimum.at(gmn, inv, mn)
        np.maximum.at(gmx, inv, mx)
        glo = np.full(m, np.inf)
        ghi = np.full(m, -np.inf)
        np.minimum.at(glo, inv, lo)
        np.maximum.at(ghi, inv, hi)
        gop = np.full(m, np.inf)
        gcl = np.full(m, -np.inf)
        sel_mn = mn == gmn[inv]
        sel_mx = mx == gmx[inv]
        np.minimum.at(gop, inv[sel_mn], op[sel_mn])
        np.maximum.at(gcl, inv[sel_mx], cl[sel_mx])
        gn = np.zeros(m, np.int64)
        np.add.at(gn, inv, n)
        k_out = [u.split("\x1f", 1)[0] for u in uniq.tolist()]
        d_out = [u.split("\x1f", 1)[1] for u in uniq.tolist()]
        return pa.table({
            "key": pa.array(k_out, pa.string()),
            "day": pa.array(d_out, pa.string()),
            "open": gop, "high": ghi, "low": glo, "close": gcl,
            "n_events": gn})

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=pschema)


def table_fingerprint(ds, key_col: str, num_buckets: int = 64) -> pa.Table:
    """Per-hash-bucket table fingerprint for cross-run/anti-entropy
    data validation: bucket = mix64(key) % num_buckets, with the
    bucket's row count and the XOR-fold of all its mix64 hashes.
    XOR is commutative+associative, so the fingerprint is
    order/blocking/retry-invariant — two runs (or two replicas) agree
    iff every bucket row matches, and a mismatch localizes the damage
    to one bucket. Returns (bucket, n_rows, xor_fp int64 bit-view)."""
    import numpy as np

    from ..io.pages import _mix64

    schema = pa.schema([("bucket", pa.int64()), ("n_rows", pa.int64()),
                        ("xor_fp", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        h = _mix64(k)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        acc = np.zeros(num_buckets, dtype=np.uint64)
        np.bitwise_xor.at(acc, b, h)
        n = np.bincount(b, minlength=num_buckets).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table({"bucket": nz.astype(np.int64), "n_rows": n[nz],
                         "xor_fp": acc[nz].view(np.int64)})

    def merge(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        if b.shape[0] == 0:
            return schema.empty_table()
        fp = t["xor_fp"].to_numpy(zero_copy_only=False)
        n = t["n_rows"].to_numpy(zero_copy_only=False)
        acc = np.zeros(num_buckets, dtype=np.int64)
        np.bitwise_xor.at(acc, b, fp)       # int64 xor == uint64 xor
        cnt = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(cnt, b, n)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": nz.astype(np.int64),
                         "n_rows": cnt[nz], "xor_fp": acc[nz]})

    return driver_merge(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=131072), merge,
                        schema=schema)

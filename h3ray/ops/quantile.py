"""Distributed exact per-group order statistics (two-pass selection).

PERCENTILE_DISC/CONT-style quantiles are non-algebraic: a combiner can't
reduce them, and the naive `groupby(key).map_groups(sort)` ships EVERY row
of a group to one reducer — ~n/|groups| rows through one Python callback,
which dies at web scale. Two-pass selection bounds every participant
instead:

1. Histogram pass: a per-batch combiner counts (key, bin) pairs, where bin
   is the top 16 bits of an order-preserving float64 -> uint64 map. The
   merged histogram is bounded by |keys| x 65536 rows REGARDLESS of data
   size, so the driver tree-root (ops.reduce.driver_merge) can locate each
   key's target bin and the exact residual rank within it.
2. Selection pass: re-scan keeps only rows in each key's selected bin(s)
   (expected mass n_key/2^16 per bin) and a per-key reducer takes the
   order statistic at the residual rank.

Any number of quantiles shares the SAME two passes — the histogram pass is
quantile-independent and the selection pass keeps the union of selected
bins (<= one bin per DISC quantile, <= two per CONT quantile), so p25..p99
in one call costs the same two scans as a lone median.

The input Dataset is consumed twice (lineage re-executes); materialize
upstream first if the input is itself an expensive pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _float_order_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving float64 -> uint64 map (IEEE-754 total order over
    finite values): ascending uint64 order == ascending float order."""
    b = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    neg = (b >> np.uint64(63)) != 0
    return np.where(neg, ~b, b | np.uint64(1 << 63))


def _grouped_order_select(ds, key_col: str, value_col: str,
                          qs: list[float], out_cols: list[str],
                          interpolate: bool):
    """Shared two-pass engine. For each key and quantile j it selects the
    needed order statistic(s): DISC takes rank ceil(q*n); CONT takes ranks
    floor(p)+1 and ceil(p)+1 with p = q*(n-1) and linearly interpolates
    `lo + (p - floor(p)) * (hi - lo)` — the SQL PERCENTILE_CONT formula,
    evaluated in the same float64 operation order."""
    if len(qs) != len(out_cols) or not qs:
        raise ValueError("qs and out_cols must be equal-length, non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")
    n_q = len(qs)

    def bin_of(batch: pa.Table):
        v = batch[value_col].to_numpy(zero_copy_only=False)
        v = np.where(v == 0.0, 0.0, v)  # collapse -0.0/+0.0 into one bin
        return v, (_float_order_key(v) >> np.uint64(48)).astype(np.int32)

    def partial(batch: pa.Table) -> pa.Table:
        _, bins = bin_of(batch)
        t = pa.table({key_col: batch[key_col], "_bin": bins})
        g = t.group_by([key_col, "_bin"]).aggregate([("_bin", "count")])
        return pa.table({key_col: g[key_col], "_bin": g["_bin"],
                         "_n": g["_bin_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=131072)

    from .reduce import driver_merge

    hist = driver_merge(partials, lambda t: t).to_pandas()
    if len(hist) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [(key_col, pa.string())]
            + [(c, pa.float64()) for c in out_cols]).empty_table())
    hist = hist.groupby([key_col, "_bin"], as_index=False)["_n"].sum() \
        .sort_values([key_col, "_bin"])
    # sel[key][j] = list of (bin, residual_rank) picks for quantile j
    # (one pick for DISC, two for CONT); frac[key][j] = CONT weight.
    sel: dict = {}
    fracs: dict = {}
    for key, g in hist.groupby(key_col, sort=False):
        n = int(g["_n"].sum())
        cum = g["_n"].cumsum().to_numpy()
        bins_np = g["_bin"].to_numpy()

        def locate(k: int):
            i = int(np.searchsorted(cum, k))
            before = int(cum[i - 1]) if i else 0
            return (int(bins_np[i]), k - before)

        picks, fr = [], []
        for q in qs:
            if interpolate:
                p = q * (n - 1)
                k_lo = int(np.floor(p)) + 1
                k_hi = int(np.ceil(p)) + 1
                picks.append((locate(k_lo), locate(k_hi)))
                fr.append(p - np.floor(p))
            else:
                k = max(int(np.ceil(q * n)), 1)
                picks.append((locate(k),))
        sel[key] = picks
        fracs[key] = fr
    keys = sorted(sel)
    key_arr = pa.array(keys)
    flat_picks = [[p for pick in sel[t] for p in pick] for t in keys]
    n_picks = len(flat_picks[0])
    sel_bins = np.array([[flat_picks[ti][j][0]
                          for ti in range(len(keys))]
                         for j in range(n_picks)], dtype=np.int32)

    def keep(batch: pa.Table) -> pa.Table:
        v, bins = bin_of(batch)
        idx = pc.index_in(batch[key_col], value_set=key_arr) \
            .fill_null(-1).to_numpy(zero_copy_only=False)
        safe = np.maximum(idx, 0)
        hit = np.zeros(bins.shape[0], dtype=bool)
        for j in range(n_picks):
            hit |= sel_bins[j][safe] == bins
        hit &= idx >= 0
        return pa.table({key_col: pc.filter(batch[key_col], pa.array(hit)),
                         value_col: v[hit], "_bin": bins[hit]})

    def order_stat(vals, bins, pick):
        b, rank = pick
        in_bin = np.sort(vals[bins == b])
        return float(in_bin[rank - 1])

    def pick_rows(group: pa.Table) -> pa.Table:
        key = group[key_col][0].as_py()
        vals = group[value_col].to_numpy(zero_copy_only=False)
        bins = group["_bin"].to_numpy(zero_copy_only=False)
        out = []
        for j, picks in enumerate(sel[key]):
            if interpolate:
                lo = order_stat(vals, bins, picks[0])
                hi = order_stat(vals, bins, picks[1])
                out.append(lo + fracs[key][j] * (hi - lo))
            else:
                out.append(order_stat(vals, bins, picks[0]))
        return pa.Table.from_arrays(
            [pa.array([key], type=key_arr.type)]
            + [pa.array([v]) for v in out],
            names=[key_col] + list(out_cols))

    return ds.map_batches(keep, batch_format="pyarrow",
                          batch_size=131072) \
        .groupby(key_col).map_groups(pick_rows, batch_format="pyarrow")


def grouped_percentiles_disc(ds, key_col: str, value_col: str,
                             qs: list[float],
                             out_cols: list[str]):
    """(key_col, *out_cols) with out_cols[j] = PERCENTILE_DISC(qs[j]) of
    value_col per key: the smallest value whose cumulative distribution
    >= q, i.e. the ceil(q*n)-th smallest — exact, matching the SQL window
    function. All quantiles share one histogram pass and one selection
    pass."""
    return _grouped_order_select(ds, key_col, value_col, qs, out_cols,
                                 interpolate=False)


def grouped_percentiles_cont(ds, key_col: str, value_col: str,
                             qs: list[float],
                             out_cols: list[str]):
    """PERCENTILE_CONT: linear interpolation between the two order
    statistics straddling p = q*(n-1), computed with the same two-pass
    selection (the selection pass keeps <= 2 bins per quantile)."""
    return _grouped_order_select(ds, key_col, value_col, qs, out_cols,
                                 interpolate=True)


def grouped_percentile_disc(ds, key_col: str, value_col: str,
                            q: float = 0.5,
                            out_col: str = "percentile_value"):
    """Single-quantile convenience wrapper over grouped_percentiles_disc."""
    return grouped_percentiles_disc(ds, key_col, value_col, [q], [out_col])

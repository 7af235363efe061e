"""Distributed prefix scan and sequence packing.

A global ordered cumulative sum is the primitive behind sequence packing
(assigning documents to fixed-token-budget context windows), offset
assignment, and ordered chunking. The classic two-pass scan maps to Ray
Data directly:

  pass 1 (combiner): per-batch partial sums per contiguous KEY-RANGE
    bucket (`key // bucket_width`) — a bounded (n_buckets)-row partial
    set merged on the driver (see ops.reduce for why that beats
    repartition(1)); an exclusive scan over the ordered bucket totals
    gives each bucket's global carry, broadcast via ray.put.
  pass 2: groupby bucket -> one vectorized sort + cumsum per bucket plus
    its carry. Every bucket is independent, so the wide step is one
    hash-bucket groupby, never a global sort.

Scale assumptions (documented, matching the repo's other bucketed ops):
the order key is int64 and roughly uniform over its range, so
`bucket_width` bounds per-bucket rows (pick width ~ target rows per
reducer); the number of buckets is key_range / bucket_width, bounded by
construction — at 100 TB with 1e12 docs and width 2^20 that is ~1e6
bucket totals on the driver, a few MB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .reduce import driver_merge


def global_exclusive_cumsum(ds, order_col: str, value_col: str,
                            out_col: str = "excl_cumsum",
                            bucket_width: int = 65536):
    """Append `out_col` = sum of `value_col` over all rows with a strictly
    smaller `order_col` (exclusive running total in global key order).
    Keys must be unique int64; values are summed as int64 (exact)."""
    import ray
    import ray.data  # noqa: F401

    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = k // bucket_width
        ub, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(ub.shape[0], dtype=np.int64)
        np.add.at(sums, inv, v)
        return pa.Table.from_arrays(
            [pa.array(ub), pa.array(sums)], names=["_bucket", "_sum"])

    def merge(t: pa.Table) -> pa.Table:
        b = t["_bucket"].to_numpy(zero_copy_only=False)
        s = t["_sum"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        tot = np.zeros(ub.shape[0], dtype=np.int64)
        np.add.at(tot, inv, s)
        carry = (np.concatenate([[0], np.cumsum(tot)[:-1]])
                 if ub.size else np.empty(0, np.int64))
        return pa.Table.from_arrays(
            [pa.array(ub), pa.array(carry.astype(np.int64))],
            names=["_bucket", "_carry"])

    totals = driver_merge(
        ds.map_batches(partial, batch_format="pyarrow"), merge,
        schema=pa.schema([pa.field("_bucket", pa.int64()),
                          pa.field("_sum", pa.int64())]))
    carry_ref = ray.put((totals["_bucket"].to_numpy(),
                         totals["_carry"].to_numpy()))

    def bucketize(batch: pa.Table) -> pa.Table:
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_bucket",
                                   pa.array(k // bucket_width))

    def scan(group: pa.Table) -> pa.Table:
        buckets, carries = ray.get(carry_ref)
        k = group[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        excl = np.concatenate([[0], np.cumsum(v[order])[:-1]])
        carry = carries[np.searchsorted(buckets, k[order[0]] // bucket_width)]
        out = group.take(pa.array(order)).drop_columns(["_bucket"])
        return out.append_column(out_col, pa.array(excl + carry))

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(scan, batch_format="pyarrow")


def global_exclusive_cummax(ds, order_col: str, value_col: str,
                            out_col: str = "excl_cummax",
                            bucket_width: int = 65536):
    """Append `out_col` = MAX of `value_col` over all rows with a
    strictly smaller `order_col` (exclusive running maximum in global
    key order) — the watermark / out-of-orderness primitive. NULL for
    the globally-first row, exactly like the SQL
    `MAX(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND
    1 PRECEDING)` frame. Same two-pass shape and scale contract as
    `global_exclusive_cumsum` (max is associative and commutative, so
    bucket partial maxima + an exclusive driver prefix-max carry are
    exact). Keys must be unique int64."""
    import ray
    import ray.data  # noqa: F401

    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    NEG = np.iinfo(np.int64).min

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = k // bucket_width
        ub, inv = np.unique(b, return_inverse=True)
        mx = np.full(ub.shape[0], NEG, dtype=np.int64)
        np.maximum.at(mx, inv, v)
        return pa.Table.from_arrays(
            [pa.array(ub), pa.array(mx)], names=["_bucket", "_max"])

    def merge(t: pa.Table) -> pa.Table:
        b = t["_bucket"].to_numpy(zero_copy_only=False)
        s = t["_max"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        tot = np.full(ub.shape[0], NEG, dtype=np.int64)
        np.maximum.at(tot, inv, s)
        carry = (np.concatenate(
            [[NEG], np.maximum.accumulate(tot)[:-1]])
            if ub.size else np.empty(0, np.int64))
        return pa.Table.from_arrays(
            [pa.array(ub), pa.array(carry.astype(np.int64))],
            names=["_bucket", "_carry"])

    totals = driver_merge(
        ds.map_batches(partial, batch_format="pyarrow"), merge,
        schema=pa.schema([pa.field("_bucket", pa.int64()),
                          pa.field("_max", pa.int64())]))
    carry_ref = ray.put((totals["_bucket"].to_numpy(),
                         totals["_carry"].to_numpy()))

    def bucketize(batch: pa.Table) -> pa.Table:
        k = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_bucket",
                                   pa.array(k // bucket_width))

    def scan(group: pa.Table) -> pa.Table:
        buckets, carries = ray.get(carry_ref)
        k = group[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        excl = np.concatenate(
            [[NEG], np.maximum.accumulate(v[order])[:-1]])
        carry = carries[np.searchsorted(buckets, k[order[0]] // bucket_width)]
        run = np.maximum(excl, carry)
        out = group.take(pa.array(order)).drop_columns(["_bucket"])
        return out.append_column(
            out_col, pa.array(np.where(run == NEG, None, run),
                              pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(scan, batch_format="pyarrow")


def pack_sequences(ds, order_col: str, size_col: str, budget: int,
                   out_col: str = "pack_id",
                   bucket_width: int = 65536):
    """Sequence packing: assign each row (document) to the fixed-budget
    pack in which its span BEGINS under contiguous key-order packing —
    pack_id = floor(exclusive_running_size / budget). Deterministic,
    order-stable, and SQL-mirrorable (a window SUM), unlike greedy
    first-fit bin packing; long documents straddle pack boundaries, which
    is exactly how training-context packing treats them."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    scanned = global_exclusive_cumsum(ds, order_col, size_col,
                                      out_col="_excl",
                                      bucket_width=bucket_width)

    def assign(batch: pa.Table) -> pa.Table:
        e = batch["_excl"].to_numpy(zero_copy_only=False)
        return batch.drop_columns(["_excl"]).append_column(
            out_col, pa.array(e // budget))

    return scanned.map_batches(assign, batch_format="pyarrow")

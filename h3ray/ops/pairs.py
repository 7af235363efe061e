"""Distributed exact distinct over candidate-pair Datasets.

Dedup pipelines emit the same (a, b) pair once per colliding band; the
distinct must not funnel the (unbounded) pair set through the driver.
Pattern: hash each pair to one of `num_buckets` buckets, groupby(bucket),
np.unique inside each group — exact, bounded group count, shuffle moves the
pair rows once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io.pages import _mix64


def distinct_pairs(pairs_ds, col_a: str, col_b: str,
                   num_buckets: int = 32, keep: tuple[str, ...] = ()):
    """Exact distinct on (col_a, col_b); `keep` columns take the value of an
    arbitrary surviving duplicate (they are equal across duplicates in all
    current uses — similarity scores recomputed identically per band)."""

    def bucket(batch: pa.Table) -> pa.Table:
        a = batch[col_a].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch[col_b].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix64(a * np.uint64(0x9E3779B97F4A7C15) + _mix64(b))
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(
                np.int32)))

    def dedup(group: pa.Table) -> pa.Table:
        a = group[col_a].to_numpy(zero_copy_only=False)
        b = group[col_b].to_numpy(zero_copy_only=False)
        u, idx = np.unique(np.stack([a, b], axis=1), axis=0,
                           return_index=True)
        arrays = [pa.array(u[:, 0]), pa.array(u[:, 1])]
        names = [col_a, col_b]
        take = pa.array(idx)
        for c in keep:
            col = group[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrays.append(col.take(take))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    # batch_size coalesces tiny upstream blocks before the exchange (the
    # sort pays per input block, not per row).
    return pairs_ds.map_batches(bucket, batch_format="pyarrow",
                                batch_size=65536) \
        .groupby("_bucket").map_groups(dedup, batch_format="pyarrow")

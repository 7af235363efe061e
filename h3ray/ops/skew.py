"""Skew handling: salted two-phase aggregation for hot keys.

Web pages cluster on ~urban H3 cells (the generator plants 80% of mass in 50
city clusters precisely to exercise this). A plain groupby(key) sends every
row of a hot cell to one reducer; salting splits each key into `salt_mod`
sub-keys for the first (heavy) aggregation round, then merges the tiny
per-key partials in a second round:

    groupby((key, salt)) -> partial agg -> groupby(key) -> final merge

The combiner-first pipelines (geotag.cell_counts) sidestep the issue for
algebraic aggregates by pre-reducing inside map_batches; salting is for
aggregations whose per-group work is non-algebraic or memory-heavy (top-k
per hot key, per-group model state), where group size itself must be
bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io.pages import _mix64


def default_num_buckets() -> int:
    """Reducer bucket count for hash-bucketed groupbys: ~4x cluster cores so
    no reducer holds more than ~1/(4 cores) of the data and parallelism is
    never capped by a fixed constant."""
    import ray

    if ray.is_initialized():
        return max(32, int(4 * ray.cluster_resources().get("CPU", 8)))
    return 128


def add_salt(batch: pa.Table, key_col: str, salt_mod: int,
             out_col: str = "_salt") -> pa.Table:
    """Deterministic per-row salt derived from a secondary hash of the key
    plus the row position, splitting each hot key across `salt_mod` groups."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    pos = np.arange(keys.shape[0], dtype=np.uint64)
    h = _mix64(keys.astype(np.uint64) ^ _mix64(pos))
    return batch.append_column(
        out_col, pa.array((h % np.uint64(salt_mod)).astype(np.int32)))


def salted_group_count(ds, key_col: str, salt_mod: int = 16,
                       out_col: str = "num_rows"):
    """Count rows per key with bounded reducer fan-in.

    Round 1 reduces (key, salt) groups — each at most ~1/salt_mod of a hot
    key; round 2 merges salt_mod tiny partials per key.
    """
    from ray.data.aggregate import Count, Sum

    salted = ds.map_batches(lambda b: add_salt(b, key_col, salt_mod),
                            batch_format="pyarrow")
    partial = salted.groupby([key_col, "_salt"]).aggregate(
        Count(alias_name="_partial"))
    return partial.groupby(key_col).aggregate(
        Sum("_partial", alias_name=out_col))

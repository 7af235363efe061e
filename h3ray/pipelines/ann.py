"""Approximate-nearest-neighbor search over an embedding column.

- `brute_force_topk`: baseline — per-batch numpy matmul of the corpus block
  against a *broadcast* query matrix (ray.put once, fetched per actor), then
  a global top-k merge of the tiny per-batch partials. No shuffle of the
  corpus; the reduce moves n_batches x k rows.
- `lsh_topk`: scale path — random-hyperplane LSH buckets; only colliding
  buckets are scanned (recall < 1, tunable by n_tables/n_bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.stack(arr.to_numpy(zero_copy_only=False)).astype(np.float32)


class BruteForceScorer:
    """Actor-pool stage: cosine scores of each corpus block vs all queries."""

    def __init__(self, queries_ref, id_col: str, emb_col: str, k: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) \
            else queries_ref
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        self.q = (q / np.clip(qn, 1e-30, None)).astype(np.float32)  # (m, d)
        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, self.emb_col)  # (n, d)
        xn = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.clip(xn, 1e-30, None)
        sims = x @ self.q.T  # (n, m)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, sims.shape[0])
        # Per-batch partial top-k per query.
        part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, m)
        m = sims.shape[1]
        out_q = np.repeat(np.arange(m, dtype=np.int64)[None, :], k, axis=0)
        return pa.Table.from_arrays(
            [pa.array(out_q.ravel()),
             pa.array(ids[part.ravel()]),
             pa.array(np.take_along_axis(sims, part, axis=0).ravel()
                      .astype(np.float64))],
            names=["query_id", self.id_col, "cosine"])

    @staticmethod
    def merge_topk(k: int, id_col: str):
        def fn(group: pd.DataFrame) -> pd.DataFrame:
            return group.sort_values(["cosine", id_col],
                                     ascending=[False, True]).head(k)

        return fn


def brute_force_topk(ds, queries: np.ndarray, *, id_col: str = "vec_id",
                     emb_col: str = "embedding", k: int = 10,
                     concurrency: int = 4):
    """Exact cosine top-k per query over the embedding Dataset."""
    import ray

    queries = np.asarray(queries, dtype=np.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    qref = ray.put(queries)

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        BruteForceScorer,
        fn_constructor_args=(qref, id_col, emb_col, k),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)
    return partials.groupby("query_id").map_groups(
        BruteForceScorer.merge_topk(k, id_col), batch_format="pandas")


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------

def lsh_planes(dim: int, n_bits: int = 12, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float32)


def lsh_bucket_stage(planes: np.ndarray, emb_col: str = "embedding",
                     out_col: str = "lsh_bucket"):
    """Random-hyperplane signature -> integer bucket id per row."""
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, emb_col)
        sig = (x @ planes.T) > 0  # (n, n_bits)
        bucket = (sig.astype(np.int64) * weights[None, :]).sum(axis=1)
        return batch.append_column(out_col, pa.array(bucket))

    return fn


def lsh_topk(ds, queries: np.ndarray, *, id_col: str = "vec_id",
             emb_col: str = "embedding", k: int = 10, n_bits: int = 8,
             concurrency: int = 4):
    """ANN top-k scanning only LSH buckets that contain a query signature."""
    import ray

    queries = np.asarray(queries, dtype=np.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    planes = lsh_planes(queries.shape[1], n_bits)
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    q_buckets = (((queries @ planes.T) > 0).astype(np.int64)
                 * weights[None, :]).sum(axis=1)
    wanted = set(q_buckets.tolist())
    qref = ray.put(queries)

    bucketed = ds.select_columns([id_col, emb_col]).map_batches(
        lsh_bucket_stage(planes, emb_col), batch_format="pyarrow",
        batch_size=4096)

    def keep(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["lsh_bucket"].to_numpy(zero_copy_only=False),
                       list(wanted))
        return batch.filter(pa.array(mask))

    pruned = bucketed.map_batches(keep, batch_format="pyarrow")
    partials = pruned.map_batches(
        BruteForceScorer, fn_constructor_args=(qref, id_col, emb_col, k),
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)
    return partials.groupby("query_id").map_groups(
        BruteForceScorer.merge_topk(k, id_col), batch_format="pandas")


class CosineDupScorer:
    """Actor-pool stage for exact embedding near-duplicate pairs.

    The (small) reference matrix is broadcast once via ray.put; each corpus
    block emits pairs (id_a < id_b) with cosine >= threshold. The scale path
    for corpora whose matrix no longer fits a worker is `lsh_topk`-style
    bucketing (same kernels, bucket groupby, recall < 1).
    """

    def __init__(self, ref, id_col: str, emb_col: str, threshold: float):
        import ray

        data = ray.get(ref) if not isinstance(ref, dict) else ref
        # float64 so thresholding agrees with a float64 SQL oracle.
        m = data["mat"].astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        self.mat = m / np.clip(n, 1e-30, None)
        self.ids = data["ids"]
        self.id_col = id_col
        self.emb_col = emb_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, self.emb_col).astype(np.float64)
        xn = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.clip(xn, 1e-30, None)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = x @ self.mat.T  # (n, N)
        hit = sims >= self.threshold
        # Only emit ordered pairs a < b (dedup across blocks for free).
        hit &= ids[:, None] < self.ids[None, :]
        r, c = np.nonzero(hit)
        return pa.Table.from_arrays(
            [pa.array(ids[r]), pa.array(self.ids[c]),
             pa.array(sims[r, c].astype(np.float64))],
            names=["id_a", "id_b", "cosine"])


def cosine_dup_pairs(ds, *, id_col: str = "vec_id", emb_col: str = "embedding",
                     threshold: float = 0.9, concurrency: int = 4,
                     batch_size: int = 4096):
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b)."""
    import ray

    tbl = ds.select_columns([id_col, emb_col]).to_arrow_refs()
    parts = [pa.Table.from_batches(t.to_batches())
             for t in ray.get(tbl)]
    full = pa.concat_tables(parts)
    ref = ray.put({"mat": _embedding_matrix(full, emb_col),
                   "ids": full[id_col].to_numpy(zero_copy_only=False)})

    return ds.select_columns([id_col, emb_col]).map_batches(
        CosineDupScorer,
        fn_constructor_kwargs={"ref": ref, "id_col": id_col,
                               "emb_col": emb_col, "threshold": threshold},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)

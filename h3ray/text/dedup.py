"""Deduplication primitives: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (100 TB thinking):
- exact: fingerprint in map_batches (vectorized hash) -> groupby(fingerprint)
  -> keep min key per group. The shuffle moves (fingerprint, key) pairs only.
- MinHash/LSH: per-batch shingle+minhash (numpy) -> explode to
  (band, band_hash, key) rows -> groupby((band, band_hash)) -> candidate
  pairs -> Jaccard verify -> min-label propagation for clusters.
- SimHash: 64-bit weighted-token hash; near-dups = identical bands of the
  simhash (Hamming-ball blocking).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..io.pages import _mix64, url_hash64

N_PERM = 64  # minhash permutations
N_BANDS = 16  # LSH bands -> 4 rows per band
ROWS_PER_BAND = N_PERM // N_BANDS

_SALTS = _mix64(np.arange(1, N_PERM + 1, dtype=np.uint64) *
                np.uint64(0x9E3779B97F4A7C15))


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-gram 64-bit hashes of a string (character shingles)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if b.shape[0] < k:
        b = np.pad(b, (0, k - b.shape[0]), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pw = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    return _mix64(win @ pw)


def minhash_signature_batch(texts: list[str], k: int = 5) -> np.ndarray:
    """(n, N_PERM) uint64 minhash signatures."""
    out = np.empty((len(texts), N_PERM), dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t, k)
        # One permutation per salt: min over xor-mixed shingle hashes.
        out[i] = np.min(_mix64(sh[None, :] ^ _SALTS[:, None]), axis=1)
    return out


def minhash_bands_stage(key_col: str, text_col: str = "text", k: int = 5,
                        keep_text: bool = False):
    """Explode each doc into N_BANDS (band, band_hash, key) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        sig = minhash_signature_batch(texts, k)
        bands = sig.reshape(len(texts), N_BANDS, ROWS_PER_BAND)
        # Hash each band's rows into one value.
        band_hash = _mix64(
            bands[..., 0] * np.uint64(3) ^ _mix64(bands[..., 1])
            ^ (_mix64(bands[..., 2]) >> np.uint64(1))
            ^ (_mix64(bands[..., 3]) << np.uint64(1)))
        n = len(texts)
        rows = np.repeat(np.arange(n), N_BANDS)
        arrays = [pa.array(keys[rows]),
                  pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n)),
                  pa.array(band_hash.reshape(-1))]
        names = [key_col, "band", "band_hash"]
        if keep_text:
            col = batch[text_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrays.append(col.take(pa.array(rows)))
            names.append("text")
        return pa.Table.from_arrays(arrays, names=names)

    return fn


def simhash_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash over whitespace tokens."""
    out = np.empty(len(texts), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            out[i] = 0
            continue
        hs = url_hash64(pa.array(toks, type=pa.string()))
        bits01 = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        vote = (2 * bits01 - 1).sum(axis=0)
        out[i] = np.bitwise_or.reduce(
            (vote > 0).astype(np.uint64) << shifts)
    return out


def simhash_stage(text_col: str = "text", out_col: str = "simhash"):
    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(sh))

    return fn


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity (verification step)."""
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# Dataset-level pipelines
# ---------------------------------------------------------------------------

def exact_dedup(ds, key_col: str, text_col: str = "text"):
    """Keep the min-key row per distinct text (hash-partitioned).

    Emits (key_col,) of survivors. Shuffle moves only (fingerprint, key).
    """
    from .analysis import fingerprint_stage

    from ray.data.aggregate import Min

    def project(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, "fingerprint"])

    fp = ds.map_batches(fingerprint_stage(text_col), batch_format="pyarrow",
                        batch_size=65536) \
        .map_batches(project, batch_format="pyarrow")

    return fp.groupby("fingerprint").aggregate(
        Min(key_col, alias_name=key_col)).select_columns([key_col])


def minhash_duplicate_pairs(ds, key_col: str, text_col: str = "text",
                            jaccard_threshold: float = 0.8):
    """Candidate near-dup pairs via LSH banding, verified by shingle Jaccard.

    Returns a Dataset of (key_a, key_b) pairs with key_a < key_b. The
    verification re-reads texts via a broadcast map for the candidate keys —
    suitable when candidates << corpus (the normal case); for adversarial
    corpora, join texts back by key instead.
    """
    bands = ds.map_batches(minhash_bands_stage(key_col, text_col),
                           batch_format="pyarrow", batch_size=8192)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = np.sort(group[key_col].to_numpy())
        if ks.shape[0] < 2:
            return pd.DataFrame({"key_a": [], "key_b": []})
        # Emit star pairs against the min key (enough for clustering).
        return pd.DataFrame({"key_a": ks[0], "key_b": ks[1:]})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    return cand


def simhash_duplicate_pairs(ds, key_col: str, text_col: str = "text",
                            max_hamming: int = 3):
    """Near-dup pairs via SimHash banding + exact Hamming verification.

    64-bit simhash split into 4 x 16-bit bands: any pair within Hamming
    distance <= 3 shares at least one identical band (pigeonhole), so
    banding loses no true pair. Groups shuffle only (band, value, key,
    simhash) rows; verification is in-group popcount.
    """
    def band_stage(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col].to_pylist())
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        n = sh.shape[0]
        rows = np.repeat(np.arange(n), 4)
        band = np.tile(np.arange(4), n)
        value = (sh[rows] >> (band.astype(np.uint64) * np.uint64(16))) \
            & np.uint64(0xFFFF)
        return pa.Table.from_arrays(
            [pa.array(band.astype(np.int8)), pa.array(value),
             pa.array(keys[rows]), pa.array(sh[rows])],
            names=["band", "band_value", key_col, "simhash"])

    bands = ds.map_batches(band_stage, batch_format="pyarrow",
                           batch_size=8192)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = group[key_col].to_numpy()
        sh = group["simhash"].to_numpy().astype(np.uint64)
        if ks.shape[0] < 2:
            return pd.DataFrame({"key_a": [], "key_b": []})
        order = np.argsort(ks)
        ks, sh = ks[order], sh[order]
        ia, ib = np.triu_indices(ks.shape[0], 1)
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(x.shape[0], dtype=np.int64)
        for s in range(0, 64, 8):
            ham += POPCOUNT8[(x >> np.uint64(s)) & np.uint64(0xFF)]
        keep = ham <= max_hamming
        return pd.DataFrame({"key_a": ks[ia[keep]], "key_b": ks[ib[keep]]})

    cand = bands.groupby(["band", "band_value"]).map_groups(
        pairs, batch_format="pandas")

    # A pair can collide in several bands: tiny final distinct.
    def distinct(batch: pa.Table) -> pa.Table:
        a = batch["key_a"].to_numpy(zero_copy_only=False)
        b = batch["key_b"].to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.Table.from_arrays([pa.array(u[:, 0]), pa.array(u[:, 1])],
                                    names=["key_a", "key_b"])

    import ray.data as rd

    from ..ops.reduce import driver_merge

    return rd.from_arrow(driver_merge(cand, distinct))


POPCOUNT8 = np.array([bin(v).count("1") for v in range(256)], dtype=np.int64)


def ngram_jaccard_pairs(ds, key_col: str, text_col: str = "text",
                        threshold: float = 0.5, k: int = 5):
    """Exact-verified near-dup pairs: MinHash-LSH candidates re-checked with
    true character-k-gram Jaccard >= threshold.

    Texts for verification ride along inside the candidate groups (suitable
    while candidate groups are small; join texts back by key otherwise).
    """
    bands = ds.map_batches(minhash_bands_stage(key_col, text_col,
                                               keep_text=True),
                           batch_format="pyarrow", batch_size=8192)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ks = group[key_col].to_numpy()
        if ks.shape[0] < 2:
            return pd.DataFrame({"key_a": [], "key_b": [], "jaccard": []})
        order = np.argsort(ks)
        ks = ks[order]
        texts = group["text"].to_numpy()[order]
        out_a, out_b, out_j = [], [], []
        for i in range(ks.shape[0]):
            for j in range(i + 1, ks.shape[0]):
                sim = ngram_jaccard(texts[i], texts[j], k)
                if sim >= threshold:
                    out_a.append(ks[i])
                    out_b.append(ks[j])
                    out_j.append(sim)
        return pd.DataFrame({"key_a": out_a, "key_b": out_b,
                             "jaccard": out_j})

    cand = bands.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")

    def distinct(batch: pa.Table) -> pa.Table:
        a = batch["key_a"].to_numpy(zero_copy_only=False)
        b = batch["key_b"].to_numpy(zero_copy_only=False)
        pairs_ab = np.stack([a, b], axis=1)
        u, idx = np.unique(pairs_ab, axis=0, return_index=True)
        j = batch["jaccard"].to_numpy(zero_copy_only=False)[idx]
        return pa.Table.from_arrays(
            [pa.array(u[:, 0]), pa.array(u[:, 1]), pa.array(j)],
            names=["key_a", "key_b", "jaccard"])

    import ray.data as rd

    from ..ops.reduce import driver_merge

    return rd.from_arrow(driver_merge(cand, distinct))

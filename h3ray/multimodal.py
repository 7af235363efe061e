"""Multimodal (image/audio/video) processing stages over opaque binary columns.

Design (SURVEY/engine brief): media payloads travel as `binary` columns with
typed metadata columns beside them; decode / feature-extract / resize /
frame-sample are STATEFUL actor-pool stages — the codec/model handle is
built once per actor in `__init__`, batches flow through `__call__` as
zero-copy Arrow tables. Media codecs (PIL/ffmpeg/torchaudio) are not in this
environment, so the decode core is STUBBED: `codec="fake"` (default) is a
deterministic byte-hash pseudo-decoder that produces stable shapes/features
for tests and benchmarks; `codec="pil"`/`codec="ffmpeg"` raise
NotImplementedError unless the library is importable. The Ray-side plumbing
(schemas, batch sizing, actor signatures, output layout) is real.

Large payloads need small batches: size `batch_size` so
batch_size x avg_payload x concurrency fits the worker heap (e.g. 256 rows
of 1 MB images x 8 actors ~ 2 GiB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash_bytes_batch(bin_col: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash per binary payload (vectorized over the
    Arrow value buffer — same polynomial+avalanche as url_hash64)."""
    from .io.pages import url_hash64

    return url_hash64(bin_col)


class ImageDecodeStage:
    """binary -> (width, height, channels, ok) metadata columns.

    Actor-pool stage: `ds.map_batches(ImageDecodeStage, fn_constructor_kwargs=
    {"codec": "fake"}, concurrency=N, batch_size=256, batch_format="pyarrow")`.
    """

    def __init__(self, col: str = "html", codec: str = "fake"):
        self.col = col
        if codec == "pil":
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as exc:  # codec not baked into this env
                raise NotImplementedError(
                    "PIL not available in this environment; use codec='fake'"
                ) from exc
        elif codec != "fake":
            raise NotImplementedError(f"codec {codec!r} not supported")
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        if self.codec == "pil":
            return self._decode_pil(batch, col)
        h = _hash_bytes_batch(col)
        # Deterministic fake decode: dimensions derived from the payload hash.
        width = (64 + (h % np.uint64(193))).astype(np.int32)
        height = (64 + ((h >> np.uint64(8)) % np.uint64(129))).astype(np.int32)
        lengths = pc.binary_length(col).to_numpy(zero_copy_only=False)
        ok = lengths > 0
        return batch.append_column(
            "img_w", pa.array(width)).append_column(
            "img_h", pa.array(height)).append_column(
            "img_c", pa.array(np.full(len(col), 3, dtype=np.int32))
        ).append_column("decode_ok", pa.array(ok))

    def _decode_pil(self, batch: pa.Table, col: pa.Array) -> pa.Table:
        """Real decode: per-payload PIL open (decode is inherently per-item;
        the vectorization win lives in batch sizing + the actor pool)."""
        import io as _io

        n = len(col)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        chans = np.zeros(n, dtype=np.int32)
        ok = np.zeros(n, dtype=bool)
        for idx in range(n):
            payload = col[idx].as_py()
            if not payload:
                continue
            try:
                with self._pil.open(_io.BytesIO(payload)) as im:
                    width[idx] = im.width
                    height[idx] = im.height
                    chans[idx] = len(im.getbands())
                    ok[idx] = True
            except Exception:  # undecodable payload -> decode_ok=False row
                pass
        return batch.append_column(
            "img_w", pa.array(width)).append_column(
            "img_h", pa.array(height)).append_column(
            "img_c", pa.array(chans)).append_column(
            "decode_ok", pa.array(ok))


class FeatureExtractStage:
    """binary -> fixed-dim float32 embedding column (`feat`).

    Stands in for batched model inference: the "model" (a seeded random
    projection) is built once per actor; per batch the payload hash seeds a
    deterministic feature vector, then the projection is applied vectorized.
    """

    def __init__(self, col: str = "html", dim: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.col = col
        self.dim = dim
        self.proj = rng.standard_normal((dim, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = _hash_bytes_batch(col)
        # Expand each hash into `dim` deterministic floats in [-1, 1).
        idx = np.arange(self.dim, dtype=np.uint64)
        mixed = (h[:, None] * np.uint64(0x9E3779B97F4A7C15)
                 + idx[None, :] * np.uint64(0xBF58476D1CE4E5B9))
        mixed ^= mixed >> np.uint64(31)
        raw = (mixed >> np.uint64(11)).astype(np.float64) / float(1 << 52)
        feats = ((raw - 1.0).astype(np.float32) @ self.proj)
        norm = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / np.maximum(norm, 1e-12)
        return batch.append_column(
            "feat", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim))


class FrameSampleStage:
    """video binary -> one row per sampled frame (flat map).

    Real ffmpeg decode is stubbed; the fake path emits `num_frames`
    deterministic frame rows with (frame_idx, frame_ts_ms) metadata, which
    exercises the row-expansion plumbing (block growth, ragged output).
    """

    def __init__(self, col: str = "html", num_frames: int = 4,
                 codec: str = "fake"):
        if codec == "ffmpeg":
            import shutil as _shutil

            if not (_shutil.which("ffprobe") and _shutil.which("ffmpeg")):
                raise NotImplementedError(
                    "ffmpeg/ffprobe not available in this environment; "
                    "use codec='fake'")
        elif codec != "fake":
            raise NotImplementedError(f"codec {codec!r} not supported")
        self.col = col
        self.num_frames = num_frames
        self.codec = codec

    def _probe_durations_ms(self, col: pa.Array) -> np.ndarray:
        """Real path: per-payload ffprobe duration (container probe only —
        no frame decode; per-item subprocess is inherent to the codec)."""
        import json as _json
        import subprocess as _sp

        out = np.zeros(len(col), dtype=np.int64)
        for idx in range(len(col)):
            payload = col[idx].as_py()
            if not payload:
                continue
            try:
                r = _sp.run(
                    ["ffprobe", "-v", "quiet", "-print_format", "json",
                     "-show_format", "-i", "pipe:0"],
                    input=payload, capture_output=True, timeout=30)
                meta = _json.loads(r.stdout or b"{}")
                out[idx] = int(
                    float(meta.get("format", {}).get("duration", 0)) * 1000)
            except Exception:  # unprobeable payload -> duration 0
                pass
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.codec == "ffmpeg":
            duration_real = self._probe_durations_ms(col)
            n = len(col)
            k = self.num_frames
            rows = np.repeat(np.arange(n), k)
            frame_idx = np.tile(np.arange(k), n)
            ts = (duration_real[rows] * frame_idx) // max(k, 1)
            cols = {name: batch[name].take(pa.array(rows))
                    for name in batch.column_names if name != self.col}
            cols["frame_idx"] = pa.array(frame_idx.astype(np.int32))
            cols["frame_ts_ms"] = pa.array(ts)
            return pa.Table.from_pydict(cols)
        h = _hash_bytes_batch(col)
        n = len(col)
        k = self.num_frames
        rows = np.repeat(np.arange(n), k)
        frame_idx = np.tile(np.arange(k), n)
        duration = (1000 + (h % np.uint64(59000))).astype(np.int64)
        ts = (duration[rows] * frame_idx) // max(k, 1)
        cols = {name: batch[name].take(pa.array(rows))
                for name in batch.column_names if name != self.col}
        cols["frame_idx"] = pa.array(frame_idx.astype(np.int32))
        cols["frame_ts_ms"] = pa.array(ts)
        return pa.Table.from_pydict(cols)


def image_features(ds, col: str = "html", dim: int = 16,
                   concurrency: int = 4, batch_size: int = 256):
    """Actor-pool feature extraction pipeline over a binary column."""
    return ds.map_batches(
        FeatureExtractStage,
        fn_constructor_kwargs={"col": col, "dim": dim},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def decode_metadata(ds, col: str = "html", concurrency: int = 4,
                    batch_size: int = 256):
    """Actor-pool decode-metadata pipeline over a binary column."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"col": col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class ByteStatsStage:
    """binary -> (n_bytes, byte_entropy, mime) REAL feature columns.

    Unlike the fake codec stages above, nothing here is stubbed: a byte
    histogram, Shannon entropy (bits/byte — the standard compressibility
    / encrypted-vs-text signal in crawl triage), and magic-prefix content
    sniffing are computable on any binary payload with pure NumPy. One
    pass over the Arrow value buffer per batch: a composite
    (row, byte)-bincount builds every row's 256-bin histogram at once
    (no per-payload Python), and the sniff packs each payload's first 4
    bytes into one uint32 compared against a constant table built once
    per actor in __init__.

    Memory: histograms are rows x 256 x int64 (~2 MB at batch_size 1024)
    plus one int64 per payload byte for the composite — size batch_size
    so batch bytes x concurrency fits the worker heap, same rule as the
    decode stages.
    """

    #: (packed first-4-bytes, required prefix length, label)
    _MAGIC = [
        (b"\x89PNG", 4, "png"),
        (b"\xff\xd8\xff", 3, "jpeg"),
        (b"GIF8", 4, "gif"),
        (b"%PDF", 4, "pdf"),
        (b"RIFF", 4, "riff"),
        (b"PK\x03\x04", 4, "zip"),
        (b"<htm", 4, "html"),
        (b"<!DO", 4, "html"),
    ]

    def __init__(self, col: str = "html"):
        self.col = col
        packed, masks, labels = [], [], []
        for prefix, k, label in self._MAGIC:
            b = (prefix + b"\x00" * 4)[:4]
            v = int.from_bytes(b, "big")
            m = int.from_bytes(b"\xff" * k + b"\x00" * (4 - k), "big")
            packed.append(v & m)
            masks.append(m)
            labels.append(label)
        self._magic_vals = np.array(packed, dtype=np.uint32)
        self._magic_masks = np.array(masks, dtype=np.uint32)
        self._magic_labels = np.array(labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return batch.append_column(
                "n_bytes", pa.array([], pa.int64())).append_column(
                "byte_entropy", pa.array([], pa.float64())).append_column(
                "mime", pa.array([], pa.string()))
        off_dtype = np.int64 if pa.types.is_large_binary(col.type) \
            else np.int32
        off_buf = np.frombuffer(col.buffers()[1], dtype=off_dtype)
        offsets = off_buf[col.offset:col.offset + n + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        flat = data[offsets[0]:offsets[-1]]
        starts = offsets[:-1] - offsets[0]
        lengths = (offsets[1:] - offsets[:-1])
        idx_rep = np.repeat(np.arange(n, dtype=np.int64), lengths)
        hist = np.bincount(idx_rep * 256 + flat,
                           minlength=n * 256).reshape(n, 256)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = hist / np.maximum(lengths, 1)[:, None]
            logp = np.where(p > 0, np.log2(p, where=p > 0), 0.0)
        entropy = -(p * logp).sum(axis=1)
        entropy[lengths == 0] = 0.0

        # magic-prefix sniff: first 4 bytes packed big-endian (short
        # payloads zero-padded so a 3-byte mask can still match)
        head = np.zeros((n, 4), dtype=np.uint8)
        for j in range(4):
            sel = lengths > j
            head[sel, j] = flat[starts[sel] + j]
        packed = (head[:, 0].astype(np.uint32) << 24) \
            | (head[:, 1].astype(np.uint32) << 16) \
            | (head[:, 2].astype(np.uint32) << 8) \
            | head[:, 3].astype(np.uint32)
        mime = np.full(n, "other", dtype=object)
        matched = np.zeros(n, dtype=bool)
        for v, m, lab in zip(self._magic_vals, self._magic_masks,
                             self._magic_labels):
            hit = ~matched & ((packed & m) == v)
            mime[hit] = lab
            matched |= hit
        return batch.append_column(
            "n_bytes", pa.array(lengths)).append_column(
            "byte_entropy", pa.array(entropy)).append_column(
            "mime", pa.array(mime, type=pa.string()))


def byte_stats(ds, col: str = "html", concurrency: int = 4,
               batch_size: int = 1024):
    """Actor-pool byte-statistics pipeline over a binary column."""
    return ds.map_batches(
        ByteStatsStage,
        fn_constructor_kwargs={"col": col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)

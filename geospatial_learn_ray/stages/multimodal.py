"""Multimodal (image/audio/video) columns — Ray-side plumbing, stubbed codecs.

Task-brief contract: media payloads are opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The real codec libraries (Pillow,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels are
STUBBED two ways:

- ``codec="real"`` raises ``NotImplementedError`` with the exact library
  call to drop in (the seam a production deployment fills);
- ``codec="fake"`` (default for tests/bench) parses the deterministic
  GLRM container header and emits real, testable features.

Everything around the stub is real: schema, batch sizing for wide binary
rows (small batches so batch × concurrency fits worker heaps), actor
signature (codec state loaded once per actor), and the narrow typed
output layout (media bytes dropped immediately after decode).

GLRM fake container: ``b"GLRM" + width:uint16 + height:uint16 +
channels:uint8 + payload bytes`` — the media fixture derives payloads
deterministically from the documents table (sources: media_table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import fnv1a64, splitmix64
from ..functions.rounding import round_half_away

MAGIC = b"GLRM"


def media_table(docs: pa.Table) -> pa.Table:
    """Deterministic media fixture from documents: one GLRM 'image' per doc
    (dims derived from doc_id, payload bytes from the text)."""
    doc_id = docs["doc_id"].to_numpy()
    w = (doc_id % 64 + 16).astype(np.uint16)
    h = (doc_id % 48 + 16).astype(np.uint16)
    c = np.full(len(doc_id), 3, np.uint8)
    texts = docs["text"].to_pylist()
    payloads = []
    for i, t in enumerate(texts):
        header = MAGIC + int(w[i]).to_bytes(2, "little") + int(h[i]).to_bytes(2, "little") + bytes([c[i]])
        payloads.append(header + t.encode("utf-8")[:256])
    return pa.table(
        {
            "media_id": docs["doc_id"],
            "media_type": pa.array(["image/glrm"] * len(doc_id)),
            "media": pa.array(payloads, pa.binary()),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage: codec state initialized ONCE per actor
    (``__init__`` — where a real deployment loads PIL/ffmpeg/torch), then
    per-batch decode in ``__call__``. Output is narrow typed metadata +
    features; the wide ``media`` binary column is dropped on the way out."""

    def __init__(self, codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real image decode requires Pillow: replace _decode_one with "
                "PIL.Image.open(io.BytesIO(buf)) → np.asarray; this container "
                "ships no codec libraries (task brief: stub the decode step)"
            )
        self.codec = codec

    @staticmethod
    def _decode_one(buf: bytes) -> tuple[int, int, int, float, int]:
        if buf[:4] != MAGIC or len(buf) < 9:
            return 0, 0, 0, float("nan"), 0
        w = int.from_bytes(buf[4:6], "little")
        h = int.from_bytes(buf[6:8], "little")
        c = buf[8]
        payload = buf[9:]
        mean_byte = float(np.frombuffer(payload, np.uint8).mean()) if payload else 0.0
        return w, h, c, mean_byte, len(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized header parse + payload stats straight off the Arrow
        # value buffer — no per-row Python objects (the loop _decode_one
        # documents the per-row semantics; this is its batch twin)
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[col.offset : col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[col.offset : col.offset + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], np.uint8) if col.buffers()[2] is not None else np.zeros(0, np.uint8)
        starts = offsets[:-1].astype(np.int64)
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        n = len(starts)
        magic = np.frombuffer(MAGIC, np.uint8)
        sidx = np.minimum(starts[:, None] + np.arange(4)[None, :], max(len(data) - 1, 0))
        ok = (lens >= 9) & (data[sidx] == magic[None, :]).all(axis=1)

        def byte_at(k: int) -> np.ndarray:
            return data[np.minimum(starts + k, max(len(data) - 1, 0))].astype(np.int64)

        w = np.where(ok, byte_at(4) | (byte_at(5) << 8), 0)
        h = np.where(ok, byte_at(6) | (byte_at(7) << 8), 0)
        c = np.where(ok, byte_at(8), 0)
        csum = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
        p0 = np.minimum(starts + 9, offsets[1:])
        psum = csum[offsets[1:]] - csum[p0]
        plen = (offsets[1:] - p0).astype(np.int64)
        mean_byte = np.where(
            ok, np.where(plen > 0, psum / np.maximum(plen, 1), 0.0), np.nan
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "width": pa.array(w.astype(np.int32)),
                "height": pa.array(h.astype(np.int32)),
                "channels": pa.array(c.astype(np.int32)),
                "mean_byte": pa.array(round_half_away(mean_byte, 4)),
                "payload_bytes": pa.array(np.where(ok, plen, 0).astype(np.int64)),
            }
        )


def decode_stage(ds: ray.data.Dataset, codec: str = "fake", concurrency=(1, 8),
                 batch_size: int = 256) -> ray.data.Dataset:
    """Decode actor pool. ``batch_size`` deliberately small: media rows are
    wide (MBs in production), so batch × concurrency must fit in a worker
    heap — the knob the task brief calls out for binary payloads."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_args=(codec,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampler:
    """Frame-sample plumbing (video analogue): emits ``every_kth`` pseudo-
    frame reference per media row — at production scale the payload decode
    happens downstream per sampled frame, so the sampler only touches
    metadata. Deterministic: frame count derives from payload length."""

    def __init__(self, every_kth: int = 4):
        self.k = every_kth

    def __call__(self, batch: pa.Table) -> pa.Table:
        # payload lengths straight off the Arrow buffers (no per-row pylist)
        nbytes = pa.compute.binary_length(batch["media"]).to_numpy().astype(np.int64) - 9
        n_frames = np.maximum(nbytes // 32, 1)
        ids = batch["media_id"].to_numpy()
        # frames per row at stride k, then offsets/repeat/cumsum expansion
        # (same idiom as MediaDecoder.__call__)
        counts = (n_frames + self.k - 1) // self.k
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        total = int(counts.sum())
        flat = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "media_id": pa.array(np.repeat(ids, counts)),
                "frame_idx": pa.array((flat * self.k).astype(np.int32)),
            }
        )


def frame_sample_stage(ds: ray.data.Dataset, every_kth: int = 4, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler, fn_constructor_args=(every_kth,), batch_format="pyarrow",
        batch_size=256, concurrency=concurrency, num_cpus=1,
    )


class MediaResizer:
    """Resize plumbing (image analogue of the brief's decode/resize/frame
    stages): deterministic nearest-neighbor resample of the GLRM payload to
    ``out_w × out_h`` positions (1-D: pos_j = (j·L) // out_n), re-emitted
    as a NEW GLRM container — media stays an opaque binary column through
    the stage, exactly like a production thumbnailer. ``codec="real"`` is
    the PIL seam (Image.resize); the fake path is fully vectorized off the
    Arrow buffers, output binary built from raw offset/value buffers (no
    per-row Python)."""

    def __init__(self, out_w: int = 8, out_h: int = 8, codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real image resize requires Pillow: PIL.Image.open(...)."
                "resize((out_w, out_h)) — this container ships no codec "
                "libraries (task brief: stub the decode/resize kernels)"
            )
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        width = np.int32 if not pa.types.is_large_binary(col.type) else np.int64
        offsets = np.frombuffer(col.buffers()[1], width)[col.offset : col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64) + 9
        plen = np.maximum(offsets[1:].astype(np.int64) - starts, 0)
        n = len(plen)
        out_n = self.out_w * self.out_h
        j = np.arange(out_n, dtype=np.int64)[None, :]
        pos = (j * plen[:, None]) // out_n  # nearest-neighbor sample grid
        valid = plen[:, None] > 0
        idx = np.minimum(starts[:, None] + pos, max(len(data) - 1, 0))
        sampled = np.where(valid, data[idx], 0).astype(np.uint8)
        row = np.empty((n, 9 + out_n), np.uint8)
        row[:, 0:4] = np.frombuffer(MAGIC, np.uint8)
        row[:, 4] = self.out_w & 255
        row[:, 5] = self.out_w >> 8
        row[:, 6] = self.out_h & 255
        row[:, 7] = self.out_h >> 8
        row[:, 8] = 3
        row[:, 9:] = sampled
        out_off = (np.arange(n + 1, dtype=np.int32) * (9 + out_n))
        media = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(row.tobytes())],
        )
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "width": pa.array(np.full(n, self.out_w, np.int32)),
            "height": pa.array(np.full(n, self.out_h, np.int32)),
            "checksum": pa.array(np.where(plen > 0, sampled.astype(np.int64).sum(axis=1), 0)),
            "media": media,
        })


def resize_stage(ds: ray.data.Dataset, out_w: int = 8, out_h: int = 8,
                 codec: str = "fake", concurrency=(1, 8),
                 batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(
        MediaResizer, fn_constructor_args=(out_w, out_h, codec),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class MediaFeaturizer:
    """Feature-extract plumbing: a 16-bin byte histogram per media payload
    (the opaque-binary stand-in for an embedding/feature model — a real
    deployment loads the model in ``__init__`` and runs batched inference
    in ``__call__``). One vectorized bincount per batch."""

    def __init__(self, codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real feature extraction requires a model runtime (torch); "
                "load the model here and run batched inference in __call__"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        width = np.int32 if not pa.types.is_large_binary(col.type) else np.int64
        offsets = np.frombuffer(col.buffers()[1], width)[col.offset : col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64) + 9
        plen = np.maximum(offsets[1:].astype(np.int64) - starts, 0)
        n = len(plen)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), plen)
        take = np.concatenate(
            [np.arange(s, s + l) for s, l in zip(starts, plen)]
        ) if n else np.zeros(0, np.int64)
        bins = data[take] >> 4
        hist = np.bincount(row_idx * 16 + bins, minlength=n * 16).reshape(n, 16)
        cols = {"media_id": batch["media_id"]}
        for b in range(16):
            cols[f"h{b}"] = pa.array(hist[:, b].astype(np.int64))
        return pa.table(cols)


def featurize_stage(ds: ray.data.Dataset, codec: str = "fake",
                    concurrency=(1, 8), batch_size: int = 256) -> ray.data.Dataset:
    return ds.map_batches(
        MediaFeaturizer, fn_constructor_args=(codec,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1,
    )


class DHasher:
    """Perceptual difference-hash actor (the image near-dup fingerprint:
    dHash, Krawetz 2013 — bit j set iff payload byte j > byte j+1 over the
    first 65 payload bytes, zero-padded). On a real deployment the bytes
    are the 9×8 downsampled grayscale pixels; here they are the GLRM
    payload — the hashing plumbing, bit packing and dedup exchange are the
    real thing. Fully vectorized off the Arrow value buffer (MediaDecoder's
    standard)."""

    WIDTH = 65  # 64 adjacent comparisons

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[col.offset : col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[col.offset : col.offset + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], np.uint8) if col.buffers()[2] is not None else np.zeros(0, np.uint8)
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        p0 = np.minimum(starts + 9, ends)  # skip the GLRM header
        k = np.arange(self.WIDTH, dtype=np.int64)
        idx = p0[:, None] + k[None, :]
        valid = idx < ends[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        mat = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.int64)
        bits = (mat[:, :64] > mat[:, 1:65]).astype(np.uint64)
        dh = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        return pa.table({"media_id": batch["media_id"],
                         "dhash": pa.array(dh.view(np.int64))})


def dhash_dedup_stage(media: ray.data.Dataset, num_buckets: int = 64,
                      concurrency=(1, 8), batch_size: int = 256) -> ray.data.Dataset:
    """media → (media_id, dhash, n_same): hash in an actor pool (small
    batches — wide binary rows), ONE dhash-keyed exchange attaches each
    hash's duplicate-group size with a groupby transform. Exact-duplicate
    groups are hash-equality groups (64-bit dHash, documented criterion —
    the SQL twin restates the identical bit chain)."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    hashed = media.map_batches(DHasher, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency,
                               num_cpus=1)

    def part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        old = np.seterr(over="ignore")
        try:
            b["_part"] = (splitmix64(b["dhash"].to_numpy(np.int64).view(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return b

    def count_same(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["n_same"] = g.groupby("dhash", sort=False)["media_id"] \
            .transform("size").astype(np.int64)
        return g

    return bucket_exchange(hashed.map_batches(part, batch_format="pandas"),
                           count_same)


class SceneCutDetector:
    """Scene-change detection plumbing (video analogue of dHash dedup):
    consecutive 32-byte pseudo-frames of the payload get integer
    byte-sum signatures; a cut fires where |Δsignature| > threshold.
    All-integer (no float crosses the oracle boundary); payloads are
    gathered into one zero-padded byte matrix straight off the Arrow
    binary value buffer — no per-row Python."""

    HEADER = 9
    FRAME = 32
    MAXP = 256

    def __init__(self, threshold: int = 100):
        self.t = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[
                col.offset: col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[
                col.offset: col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        n = len(col)
        lens = ends - starts
        # zero-padded payload gather (the DHasher idiom, wider window)
        k = np.arange(self.MAXP, dtype=np.int64)
        idx = (starts + self.HEADER)[:, None] + k[None, :]
        valid = idx < ends[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        pay = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.int64)
        sig = pay.reshape(n, self.MAXP // self.FRAME, self.FRAME).sum(axis=2)
        n_frames = np.maximum(lens - self.HEADER, 0) // self.FRAME
        ids = batch["media_id"].to_numpy()
        f = np.arange(sig.shape[1] - 1)
        valid = f[None, :] + 1 < n_frames[:, None]
        delta = np.abs(sig[:, 1:] - sig[:, :-1])
        hit = valid & (delta > self.t)
        r, c = np.nonzero(hit)
        return pa.table({
            "media_id": pa.array(ids[r].astype(np.int64)),
            "cut_after": pa.array(c.astype(np.int64)),
            "delta": pa.array(delta[r, c].astype(np.int64)),
        })


def scene_cut_stage(ds: ray.data.Dataset, threshold: int = 100,
                    concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        SceneCutDetector, fn_constructor_args=(threshold,),
        batch_format="pyarrow", batch_size=256, concurrency=concurrency,
        num_cpus=1)


class LoudnessMeter:
    """Audio loudness plumbing (the RMS/peak framing every audio-corpus
    filter runs before keeping a clip): payload bytes after the GLRM
    header are treated as unsigned 8-bit PCM centered at 128;
    consecutive 32-byte frames report energy = Σ(b−128)² (the squared-RMS
    numerator), peak = max|b−128| and n_clip = #samples with |b−128| ≥
    clip — all exact integers, so the SQL twin needs zero float
    discipline. Payload gather is the zero-copy byte-matrix idiom
    (DHasher/SceneCutDetector); partial trailing frames are dropped
    (frame semantics, mirrored by the twin's length // frame bound)."""

    HEADER = 9
    FRAME = 32
    MAXP = 256

    def __init__(self, clip: int = 120):
        self.clip = clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[
                col.offset: col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[
                col.offset: col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        n = len(col)
        lens = ends - starts
        k = np.arange(self.MAXP, dtype=np.int64)
        idx = (starts + self.HEADER)[:, None] + k[None, :]
        valid = idx < ends[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        pay = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.int64)
        dev = pay - 128
        nfr = self.MAXP // self.FRAME
        dev3 = dev.reshape(n, nfr, self.FRAME)
        energy = (dev3 * dev3).sum(axis=2)
        peak = np.abs(dev3).max(axis=2)
        nclip = (np.abs(dev3) >= self.clip).sum(axis=2).astype(np.int64)
        n_frames = np.maximum(lens - self.HEADER, 0) // self.FRAME
        ids = batch["media_id"].to_numpy()
        f = np.arange(nfr)
        keep = f[None, :] < n_frames[:, None]
        r, c = np.nonzero(keep)
        return pa.table({
            "media_id": pa.array(ids[r].astype(np.int64)),
            "frame": pa.array(c.astype(np.int64)),
            "energy": pa.array(energy[r, c].astype(np.int64)),
            "peak": pa.array(peak[r, c].astype(np.int64)),
            "n_clip": pa.array(nclip[r, c]),
        })


def loudness_stage(ds: ray.data.Dataset, clip: int = 120,
                   concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        LoudnessMeter, fn_constructor_args=(clip,),
        batch_format="pyarrow", batch_size=256, concurrency=concurrency,
        num_cpus=1)


def _dct_basis(scale: int = 1024) -> np.ndarray:
    """8-point DCT-II basis quantized to integers: B[u,x] =
    floor(cos(π(2x+1)u/16)·scale + 0.5) — shared verbatim (as VALUES
    literals) with the SQL twin, so the transform is exact int math."""
    x = np.arange(8, dtype=np.float64)
    u = np.arange(8, dtype=np.float64)
    return np.floor(np.cos(np.pi * (2 * x[None, :] + 1) * u[:, None]
                           / 16.0) * scale + 0.5).astype(np.int64)


class PHasher:
    """Perceptual DCT hash (pHash, Krawetz 2010): the first 64 payload
    bytes form an 8×8 'image', an INTEGER-quantized 8×8 DCT-II yields 64
    coefficients, and bit j−1 is set iff coefficient j (DC excluded)
    exceeds the median of the 63 AC coefficients (two-middle doubled
    median — no float forms anywhere). Same GLRM-header skip and Arrow
    buffer gather as DHasher."""

    WIDTH = 64

    def __init__(self, scale: int = 1024):
        self.B = _dct_basis(scale)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[
                col.offset: col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[
                col.offset: col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        p0 = np.minimum(starts + 9, ends)
        k = np.arange(self.WIDTH, dtype=np.int64)
        idx = p0[:, None] + k[None, :]
        valid = idx < ends[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        mat = np.where(valid, data[safe] if len(data) else 0, 0) \
            .astype(np.int64).reshape(-1, 8, 8)
        C = np.einsum("ux,nxy,vy->nuv", self.B, mat, self.B) \
            .reshape(-1, 64)
        ac = C[:, 1:]                       # DC excluded
        srt = np.sort(ac, axis=1)
        m2 = srt[:, 31] + srt[:, 31]        # 63 odd → lo == hi == mid
        bits = (2 * ac > m2[:, None]).astype(np.uint64)
        ph = (bits << np.arange(63, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        return pa.table({"media_id": batch["media_id"],
                         "phash": pa.array(ph.view(np.int64))})


def phash_dedup_stage(media: ray.data.Dataset, num_buckets: int = 64,
                      concurrency=(1, 8),
                      batch_size: int = 256) -> ray.data.Dataset:
    """media → (media_id, phash, n_same): the DCT sibling of
    dhash_dedup_stage — actor-pool hashing, one phash-keyed exchange
    attaches duplicate-group sizes."""
    from ..functions.hashing import splitmix64
    from .exchange import bucket_exchange

    hashed = media.map_batches(PHasher, batch_format="pyarrow",
                               batch_size=batch_size,
                               concurrency=concurrency, num_cpus=1)

    def part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        old = np.seterr(over="ignore")
        try:
            b["_part"] = (splitmix64(b["phash"].to_numpy(np.int64)
                                     .view(np.uint64))
                          % np.uint64(num_buckets)).astype(np.int32)
        finally:
            np.seterr(**old)
        return b

    def count_same(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"]).copy()
        g["n_same"] = g.groupby("phash", sort=False)["media_id"] \
            .transform("size").astype(np.int64)
        return g

    return bucket_exchange(
        hashed.map_batches(part, batch_format="pandas"), count_same)


def _dft_basis(frame: int = 32, nbins: int = 8,
               scale: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Integer-quantized DFT basis for the spectrogram: C[b,n] =
    floor(cos(2π(b+1)n/frame)·scale + 0.5) and the matching −sin table
    (bins 1..nbins — DC skipped). Shared verbatim (as SQL list literals)
    with the twin, so every re/im/power value is exact int64 (|dev| ≤ 128,
    |coef| ≤ 1024, 32 terms → power ≤ 2·(32·128·1024)² < 2^46)."""
    n = np.arange(frame, dtype=np.float64)
    b = np.arange(1, nbins + 1, dtype=np.float64)
    ang = 2.0 * np.pi * b[:, None] * n[None, :] / frame
    C = np.floor(np.cos(ang) * scale + 0.5).astype(np.int64)
    S = np.floor(-np.sin(ang) * scale + 0.5).astype(np.int64)
    return C, S


class Spectrogrammer:
    """Audio feature-extraction plumbing (the spectrogram every
    audio-corpus pipeline computes before filtering/embedding): GLRM
    payload bytes as unsigned 8-bit PCM centered at 128 (LoudnessMeter
    framing — 32-sample frames, partial trailing frames dropped), an
    integer-quantized 8-bin DFT per frame (power_b = re² + im², exact
    int64), the peak bin (ties → smaller bin), the L1 positive spectral
    flux vs the previous frame, and a relative onset flag
    (2·flux > previous frame's total power — integer cross-multiply, no
    division). Stateful basis tables live in ``__init__`` (once per
    actor); the payload gather is the zero-copy byte-matrix idiom."""

    HEADER = 9
    FRAME = 32
    MAXP = 256
    NBINS = 8

    def __init__(self, scale: int = 1024):
        self.C, self.S = _dft_basis(self.FRAME, self.NBINS, scale)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["media"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_large_binary(col.type):
            offsets = np.frombuffer(col.buffers()[1], np.int64)[
                col.offset: col.offset + len(col) + 1]
        else:
            offsets = np.frombuffer(col.buffers()[1], np.int32)[
                col.offset: col.offset + len(col) + 1]
        data = (np.frombuffer(col.buffers()[2], np.uint8)
                if col.buffers()[2] is not None else np.zeros(0, np.uint8))
        starts = offsets[:-1].astype(np.int64)
        ends = offsets[1:].astype(np.int64)
        n = len(col)
        lens = ends - starts
        k = np.arange(self.MAXP, dtype=np.int64)
        idx = (starts + self.HEADER)[:, None] + k[None, :]
        valid = idx < ends[:, None]
        safe = np.minimum(idx, max(len(data) - 1, 0))
        pay = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.int64)
        nfr = self.MAXP // self.FRAME
        dev = (pay - 128).reshape(n, nfr, self.FRAME)
        re = np.einsum("nfk,bk->nfb", dev, self.C)
        im = np.einsum("nfk,bk->nfb", dev, self.S)
        power = re * re + im * im                       # (n, nfr, NBINS)
        peak = np.argmax(power, axis=2).astype(np.int64) + 1  # first max
        tot = power.sum(axis=2)
        prev = np.concatenate(
            [np.zeros((n, 1, self.NBINS), np.int64), power[:, :-1]], axis=1)
        flux = np.maximum(power - prev, 0).sum(axis=2)
        flux[:, 0] = 0
        prev_tot = np.concatenate([np.zeros((n, 1), np.int64),
                                   tot[:, :-1]], axis=1)
        onset = ((2 * flux > prev_tot) & (np.arange(nfr)[None, :] > 0)) \
            .astype(np.int64)
        n_frames = np.maximum(lens - self.HEADER, 0) // self.FRAME
        ids = batch["media_id"].to_numpy()
        f = np.arange(nfr)
        keep = f[None, :] < n_frames[:, None]
        r, c = np.nonzero(keep)
        cols = {"media_id": pa.array(ids[r].astype(np.int64)),
                "frame": pa.array(c.astype(np.int64))}
        for b in range(self.NBINS):
            cols[f"p{b + 1}"] = pa.array(power[r, c, b])
        cols["peak_bin"] = pa.array(peak[r, c])
        cols["flux"] = pa.array(flux[r, c])
        cols["is_onset"] = pa.array(onset[r, c])
        return pa.table(cols)


def spectrogram_stage(ds: ray.data.Dataset,
                      concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        Spectrogrammer, batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=1)


PNG_SEED = np.uint64(0x9E3779B97F4A7C15)
PNG_SIDE = 16


class PngRoundtrip:
    """REAL-codec media stage (upgrades the MediaDecoder fake-codec seam
    for the one format stdlib can do): per document, a deterministic
    16×16 gray image (splitmix64 keystream — the WMS fake-transport
    recipe) is ENCODED to a genuine PNG (functions/pngcodec, zlib
    deflate + CRC-checked chunks) and DECODED back inside the actor;
    output stats come from the DECODED pixels, so a green oracle hash
    certifies the full encode→bytes→decode path bit-exactly. The
    keystream, not the zlib bytestream, is what SQL restates — deflate
    output is build-dependent, pixels are not."""

    def __init__(self):
        from ..functions import pngcodec

        self.enc = pngcodec.encode_png
        self.dec = pngcodec.decode_png

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        npx = PNG_SIDE * PNG_SIDE
        old = np.seterr(over="ignore")
        try:
            base = splitmix64(ids.astype(np.uint64) ^ PNG_SEED)
            draws = splitmix64(base[:, None]
                               + np.arange(npx, dtype=np.uint64)[None, :])
        finally:
            np.seterr(**old)
        imgs = (draws & np.uint64(0xFF)).astype(np.uint8).reshape(
            len(ids), PNG_SIDE, PNG_SIDE)
        sums = np.zeros(len(ids), np.int64)
        mins = np.zeros(len(ids), np.int64)
        maxs = np.zeros(len(ids), np.int64)
        nbytes = np.zeros(len(ids), np.int64)
        for i in range(len(ids)):
            blob = self.enc(imgs[i])
            out = self.dec(blob)
            sums[i] = int(out.astype(np.int64).sum())
            mins[i] = int(out.min())
            maxs[i] = int(out.max())
            nbytes[i] = len(blob)
        return pd.DataFrame({
            "doc_id": ids, "n_px": np.full(len(ids), npx, np.int64),
            "px_sum": sums, "px_min": mins, "px_max": maxs,
            # engine-side only (deflate bytes are zlib-build-dependent);
            # NOT an oracle-compared column — see png_media_roundtrip
            "png_bytes": nbytes})


def png_roundtrip_stage(ds: ray.data.Dataset,
                        concurrency=(1, 8)) -> ray.data.Dataset:
    out = ds.map_batches(PngRoundtrip, batch_format="pandas",
                         concurrency=concurrency, num_cpus=1)
    return out.select_columns(["doc_id", "n_px", "px_sum", "px_min",
                               "px_max"])

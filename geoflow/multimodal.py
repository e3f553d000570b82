"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels for real media (image/audio/video) are STUBS — the
container has no codec libraries — but the Ray-side plumbing is real and
tested: schema, batch sizing for fat binary rows, actor signature, output
layout.  ``FakeDecoder`` is the deterministic stand-in (byte histogram +
size features) used by tests and queries; ``ImageDecoder`` /
``AudioDecoder`` raise ``NotImplementedError`` with the intended contract
documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),   # "image" | "audio" | "video" | "text"
    ("meta", pa.string()),         # JSON metadata (dims, codec, duration)
])


class FakeDecoder:
    """Deterministic media 'decode': 16-bin byte histogram + size.

    Real pipelines swap this class for ImageDecoder/AudioDecoder with the
    same signature; everything else (batching, actor pool, schema) stays.
    Use small ``batch_size`` — payloads are fat binary rows.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        # zero-copy over the concatenated payload buffer
        off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset:col.offset + n + 1].astype(np.int64)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
            off[0]:off[-1]]
        off = off - off[0]
        sizes = np.diff(off)
        rows = np.repeat(np.arange(n, dtype=np.int64), sizes)
        hists = np.bincount(rows * 16 + (buf >> 4).astype(np.int64),
                            minlength=n * 16).reshape(n, 16)
        return pa.table({
            "media_id": batch["media_id"],
            "n_bytes": pa.array(sizes),
            "feature": pa.array(list(hists),
                                type=pa.list_(pa.int64(), 16)),
        })


class ImageDecoder:
    """STUB: decode image bytes -> (H, W, 3) uint8 + resize to
    ``target``.  Contract: __init__ loads the codec once per actor;
    __call__ returns columns (media_id, height, width, pixels:
    fixed_size_list<uint8>).  Requires an image library not present in
    this container."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target
        raise NotImplementedError(
            "image decoding requires PIL/cv2 (not in this container); "
            "use FakeDecoder for plumbing tests")


class AudioDecoder:
    """STUB: decode audio bytes -> mono float32 PCM + frame-sample.
    Requires an audio library not present in this container."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate
        raise NotImplementedError(
            "audio decoding requires soundfile/ffmpeg (not in this "
            "container); use FakeDecoder for plumbing tests")


class VideoFrameSampler:
    """STUB: demux video bytes -> every Nth frame as (H, W, 3) uint8.
    Contract: __init__ opens the demuxer once per actor; __call__ flat-maps
    each video row into ``n_frames`` rows (media_id, frame_idx, pixels).
    Requires ffmpeg/pyav (not in this container)."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n
        raise NotImplementedError(
            "video demuxing requires pyav/ffmpeg (not in this "
            "container); use FakeDecoder for plumbing tests")


def media_from_documents(sf_dir: str):
    """Documents' text bytes as stand-in media payloads (deterministic)."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["text"] * batch.num_rows),
            "meta": pa.array(["{}"] * batch.num_rows),
        })

    return docs.map_batches(to_media, batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Actor-pool decode stage over binary payloads; small batches."""
    media = media_from_documents(sf_dir)
    out = media.map_batches(FakeDecoder, batch_format="pyarrow",
                            batch_size=256, concurrency=(1, 4))

    def flatten(batch: pa.Table) -> pa.Table:
        feats = np.stack([np.asarray(f) for f in
                          batch["feature"].to_pylist()])
        return pa.table({
            "media_id": batch["media_id"],
            "n_bytes": batch["n_bytes"],
            "hist0": pa.array(feats[:, 0]),
            "hist6": pa.array(feats[:, 6]),
        })

    return out.map_batches(flatten, batch_format="pyarrow") \
        .sort("media_id")


Q_MEDIA_SQL = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       LENGTH(text) - LENGTH(regexp_replace(text,
           '[\\x00-\\x0f]', '', 'g')) AS hist0,
       LENGTH(text) - LENGTH(regexp_replace(text,
           '[\\x60-\\x6f]', '', 'g')) AS hist6
FROM documents ORDER BY media_id
"""


class FakeFrameSampler:
    """Deterministic stand-in exercising the ``VideoFrameSampler``
    CONTRACT — a flat-map that turns one media row into one row per
    sampled frame — without codec libraries: a "frame" is the
    ``frame_len``-byte window at every ``every_n``-byte stride of the
    payload.  Same plumbing as the real thing: per-actor setup in
    ``__init__``, fat-binary-aware batches, flat-map output
    (media_id, frame_idx, frame)."""

    def __init__(self, every_n: int = 64, frame_len: int = 32):
        self.every_n = every_n
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset:col.offset + n + 1].astype(np.int64)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        sizes = np.diff(off)
        nf = np.maximum(
            (sizes - self.frame_len) // self.every_n + 1, 0)
        nf[sizes < self.frame_len] = 0
        media = np.repeat(
            batch["media_id"].to_numpy(zero_copy_only=False), nf)
        # frame start offsets, vectorized across the whole batch
        starts_in_doc = (np.arange(int(nf.sum()), dtype=np.int64)
                         - np.repeat(np.concatenate(
                             ([0], np.cumsum(nf[:-1]))), nf))
        starts = np.repeat(off[:-1], nf) \
            + starts_in_doc * self.every_n
        take = starts[:, None] + np.arange(self.frame_len)[None, :]
        windows = buf[take.ravel()].reshape(-1, self.frame_len) \
            if len(starts) else np.empty((0, self.frame_len), np.uint8)
        frames = [w.tobytes().decode("utf-8", "replace")
                  for w in windows]
        return pa.table({
            "media_id": pa.array(media, type=pa.int64()),
            "frame_idx": pa.array(starts_in_doc),
            "frame": pa.array(frames, type=pa.string())})


def q_media_frames(sf_dir: str):
    """Frame-sampling flat-map over binary payloads (actor pool, small
    batches) — one row per 32-byte frame every 64 bytes; full SQL
    substr oracle (payloads are ASCII in the synth tables, so byte
    windows == char windows)."""
    media = media_from_documents(sf_dir)
    out = media.map_batches(FakeFrameSampler, batch_format="pyarrow",
                            batch_size=256, concurrency=(1, 4))
    return out.sort(["media_id", "frame_idx"])


Q_MEDIA_FRAMES_SQL = """
WITH d AS (SELECT doc_id, text,
                  CAST((length(text) - 32) // 64 + 1 AS BIGINT)
                      AS nf
           FROM documents WHERE length(text) >= 32)
SELECT doc_id AS media_id,
       CAST(unnest(generate_series(0, nf - 1)) AS BIGINT) AS frame_idx,
       unnest(list_transform(generate_series(0, nf - 1),
              i -> substr(text, CAST(i * 64 + 1 AS BIGINT), 32)))
           AS frame
FROM d ORDER BY media_id, frame_idx
"""

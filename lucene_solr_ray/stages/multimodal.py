"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design per the build brief: media payloads are ``binary`` columns with a
metadata struct; decode / resize / frame-sample / feature-extract run as
actor-pool ``map_batches`` stages (state in ``__init__``, small
``batch_size`` because payload bytes dominate block memory).

The image/audio libraries are not in this container, so the codec here is a
**deterministic fake format** (self-describing headers below) that makes
the Ray-side plumbing — schemas, batch sizing, actor signatures, output
layout — fully real and testable end-to-end. Swapping in PIL/ffmpeg means
replacing only the ``_decode_*`` internals; :class:`ImageEmbed` shows the
honest stub shape for a model-inference stage
(``NotImplementedError`` until a model runtime exists).

Fake formats (little-endian):
  image: b"FIMG" | u16 width | u16 height | width*height u8 gray pixels
  audio: b"FAUD" | u32 sample_rate | u32 n_samples | n_samples i16 pcm
  video: b"FVID" | u16 width | u16 height | u16 n_frames | frames of
         width*height u8 (concatenated)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_MAGIC, AUDIO_MAGIC, VIDEO_MAGIC = b"FIMG", b"FAUD", b"FVID"


def synth_media_table(n: int, seed: int = 42, kind: str = "image") -> pa.Table:
    """Deterministic fake media corpus (no external data)."""
    rng = np.random.default_rng(seed)
    payloads, meta = [], []
    for i in range(n):
        if kind == "image":
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            px = rng.integers(0, 256, w * h, dtype=np.uint8)
            payloads.append(
                IMAGE_MAGIC + np.uint16(w).tobytes() + np.uint16(h).tobytes()
                + px.tobytes()
            )
            meta.append({"kind": "image", "bytes": len(payloads[-1])})
        elif kind == "audio":
            sr = 16000
            ns = int(rng.integers(100, 4000))
            pcm = rng.integers(-(1 << 14), 1 << 14, ns).astype("<i2")
            payloads.append(
                AUDIO_MAGIC + np.uint32(sr).tobytes()
                + np.uint32(ns).tobytes() + pcm.tobytes()
            )
            meta.append({"kind": "audio", "bytes": len(payloads[-1])})
        else:
            w, h, nf = 16, 16, int(rng.integers(4, 32))
            px = rng.integers(0, 256, w * h * nf, dtype=np.uint8)
            payloads.append(
                VIDEO_MAGIC + np.uint16(w).tobytes() + np.uint16(h).tobytes()
                + np.uint16(nf).tobytes() + px.tobytes()
            )
            meta.append({"kind": "video", "bytes": len(payloads[-1])})
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([m["kind"] for m in meta], pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "payload_bytes": pa.array([m["bytes"] for m in meta], pa.int64()),
    })


def _decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    assert payload[:4] == IMAGE_MAGIC, "not a FIMG payload"
    w = int(np.frombuffer(payload, "<u2", 1, 4)[0])
    h = int(np.frombuffer(payload, "<u2", 1, 6)[0])
    px = np.frombuffer(payload, np.uint8, w * h, 8).reshape(h, w)
    return w, h, px


class ImageStats:
    """Actor stage: decode + per-image features (mean/std/entropy-ish).

    Use ``map_batches(ImageStats, batch_size=64, concurrency=N)`` — small
    batches because payload bytes dominate memory (guide: memory-aware
    batch sizing for binary columns)."""

    def __init__(self):
        self.decode = _decode_image  # real lib would be loaded here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means, stds = [], [], [], []
        for p in batch["payload"].to_pylist():
            w, h, px = self.decode(p)
            ws.append(w)
            hs.append(h)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return pa.table({
            "item_id": batch["item_id"],
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_px": pa.array(means, pa.float64()),
            "std_px": pa.array(stds, pa.float64()),
        })


class ImageResize:
    """Actor stage: nearest-neighbor resize, re-encoded payload out."""

    def __init__(self, target: int = 16):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        t = self.target
        for p in batch["payload"].to_pylist():
            w, h, px = _decode_image(p)
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            small = px[yi, xi]
            out.append(
                IMAGE_MAGIC + np.uint16(t).tobytes() + np.uint16(t).tobytes()
                + small.tobytes()
            )
        return pa.table({
            "item_id": batch["item_id"],
            "payload": pa.array(out, pa.large_binary()),
            "payload_bytes": pa.array([len(x) for x in out], pa.int64()),
        })


class AudioFeatures:
    """Actor stage: decode fake PCM -> rms / zero-crossing-rate / duration."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr, dur = [], [], []
        for p in batch["payload"].to_pylist():
            assert p[:4] == AUDIO_MAGIC
            sr = int(np.frombuffer(p, "<u4", 1, 4)[0])
            ns = int(np.frombuffer(p, "<u4", 1, 8)[0])
            pcm = np.frombuffer(p, "<i2", ns, 12).astype(np.float64)
            rms.append(float(np.sqrt(np.mean(pcm ** 2))) if ns else 0.0)
            zcr.append(
                float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
                if ns > 1 else 0.0
            )
            dur.append(ns / sr)
        return pa.table({
            "item_id": batch["item_id"],
            "rms": pa.array(rms, pa.float64()),
            "zcr": pa.array(zcr, pa.float64()),
            "duration_s": pa.array(dur, pa.float64()),
        })


class FrameSample:
    """Actor stage: sample every Nth frame of a fake video -> image rows
    (flat_map shape: one input row -> several output rows)."""

    def __init__(self, every: int = 4):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for item, p in zip(batch["item_id"].to_pylist(),
                           batch["payload"].to_pylist()):
            assert p[:4] == VIDEO_MAGIC
            w = int(np.frombuffer(p, "<u2", 1, 4)[0])
            h = int(np.frombuffer(p, "<u2", 1, 6)[0])
            nf = int(np.frombuffer(p, "<u2", 1, 8)[0])
            px = np.frombuffer(p, np.uint8, w * h * nf, 10)
            for f in range(0, nf, self.every):
                ids.append(item)
                frames.append(f)
                payloads.append(
                    IMAGE_MAGIC + np.uint16(w).tobytes()
                    + np.uint16(h).tobytes()
                    + px[f * w * h : (f + 1) * w * h].tobytes()
                )
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame": pa.array(frames, pa.int32()),
            "payload": pa.array(payloads, pa.large_binary()),
        })


class PixelGridEmbed:
    """REAL (deterministic, non-learned) image embedding: an ``g x g``
    grid of region means + the global mean/std, L2-normalized — the
    classic pixel-statistics baseline descriptor. This is not a stub:
    it makes the image -> embedding -> ANN path runnable end-to-end
    (decoded near-duplicate images land near each other in cosine
    space) while :class:`ImageEmbed` stays the honest learned-model
    slot. Actor shape: decode bound once in __init__, vectorized pool
    per batch."""

    def __init__(self, grid: int = 4):
        self.grid = grid
        self.decode = _decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        out = []
        for p in batch["payload"].to_pylist():
            w, h, px = self.decode(p)
            ys = np.linspace(0, h, g + 1).astype(int)
            xs = np.linspace(0, w, g + 1).astype(int)
            feats = [px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                     if ys[i + 1] > ys[i] and xs[j + 1] > xs[j] else 0.0
                     for i in range(g) for j in range(g)]
            feats += [float(px.mean()), float(px.std())]
            v = np.asarray(feats, np.float32)
            n = float(np.linalg.norm(v))
            out.append((v / n if n > 0 else v).tolist())
        return pa.table({
            "item_id": batch["item_id"],
            "embedding": pa.array(out, pa.list_(pa.float32())),
        })


class ImageEmbed:
    """Model-inference stage STUB: the actor/batch plumbing is the real
    shape (load model once, embed per batch); inference itself needs a
    model runtime that is not in this container."""

    def __init__(self, model_name: str = "fake-vit"):
        self.model_name = model_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "image embedding requires a model runtime (torch/onnx) that is "
            "not available in this container; wire the model load into "
            "__init__ and batched inference here"
        )

"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode/resize/feature kernels require codec libraries not present in
this environment, so the *kernels* are stubbed behind
``DeterministicFakeDecoder`` (seeded, shape-correct fake) or raise
``NotImplementedError`` — but the Ray-side plumbing (schema, actor-pool
stage shape, small-batch sizing for wide binary rows, output layout) is real
and tested.

Usage pattern (actor pool; small batches because rows are wide):

    ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                   batch_size=32, concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("media_type", pa.string(), nullable=False),  # image|audio|video
        pa.field("payload", pa.binary(), nullable=False),
        pa.field("width", pa.int32(), nullable=True),
        pa.field("height", pa.int32(), nullable=True),
        pa.field("sample_rate", pa.int32(), nullable=True),
        pa.field("n_frames", pa.int32(), nullable=True),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(256 + int(i) * 16) for i in range(n)]
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.where(kinds == "image", 64, 0).astype("int32"), pa.int32()),
            "height": pa.array(np.where(kinds == "image", 48, 0).astype("int32"), pa.int32()),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype("int32"), pa.int32()),
            "n_frames": pa.array(np.where(kinds == "video", 30, 0).astype("int32"), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class DeterministicFakeDecoder:
    """Stand-in for a real codec: maps payload bytes to a fixed-size feature
    vector deterministically (md5-seeded). Swap for PIL/libav in a real
    deployment — the stage signature stays identical."""

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim

    def decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        return np.random.default_rng(seed).standard_normal(self.feat_dim).astype(np.float32)


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract image rows.

    Real decode would be ``PIL.Image.open(io.BytesIO(payload))`` +
    resize + model inference; here the decoder is the deterministic fake
    (set ``strict=True`` to get the honest NotImplementedError instead).
    """

    def __init__(self, feat_dim: int = 16, strict: bool = False):
        self.strict = strict
        self.decoder = DeterministicFakeDecoder(feat_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image codec libraries are not available in this environment"
            )
        feats = [
            self.decoder.decode(p.as_py())
            for p in batch["payload"]
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "n_bytes": pa.array(
                    [len(p.as_py()) for p in batch["payload"]], pa.int64()
                ),
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: sample n uniform 'frames' (byte slices) per audio/
    video payload — deterministic plumbing stand-in for frame extraction."""

    def __init__(self, n_samples: int = 4):
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, p in zip(batch["media_id"], batch["payload"]):
            raw = p.as_py()
            step = max(1, len(raw) // self.n)
            for i in range(self.n):
                ids.append(mid.as_py())
                frame_idx.append(i)
                frames.append(raw[i * step : i * step + 16])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def decode_images(ds, feat_dim: int = 16, batch_size: int = 32, concurrency: int = 4):
    """Wide binary rows -> small batches, actor pool (setup once per actor)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, n_samples: int = 4, batch_size: int = 32, concurrency: int = 4):
    return ds.map_batches(
        AudioFrameSampleStage,
        fn_constructor_kwargs={"n_samples": n_samples},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

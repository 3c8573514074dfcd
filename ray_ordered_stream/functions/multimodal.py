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


def _binary_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(byte data, per-item offsets) of a binary column, zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_binary())
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, offsets


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
        data, offsets = _binary_buffers(batch["payload"])
        # zero-copy memoryview per payload (``as_py()`` would copy every
        # payload's bytes); the per-item call is the codec itself
        feats = [
            self.decoder.decode(data[offsets[i] : offsets[i + 1]])
            for i in range(len(offsets) - 1)
        ]
        flat = np.concatenate(feats) if feats else np.zeros(0, np.float32)
        feat_arr = pa.ListArray.from_arrays(
            pa.array(
                np.arange(len(feats) + 1, dtype=np.int32) * self.decoder.feat_dim
            ),
            pa.array(flat, pa.float32()),
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": feat_arr,
                "n_bytes": pa.array(np.diff(offsets), pa.int64()),
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: sample n uniform 'frames' (byte slices) per audio/
    video payload — deterministic plumbing stand-in for frame extraction."""

    def __init__(self, n_samples: int = 4):
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        n_rows = len(offsets) - 1
        lens = np.diff(offsets)
        step = np.maximum(1, lens // self.n)
        fi = np.tile(np.arange(self.n, dtype=np.int64), n_rows)
        row = np.repeat(np.arange(n_rows), self.n)
        starts = offsets[:-1][row] + fi * step[row]
        flen = np.minimum(16, np.maximum(0, lens[row] - fi * step[row]))
        # assemble the frame binary column from vectorized (start, len)
        # pairs; the per-frame copy is 16 bytes, payloads are never
        # converted to Python objects
        out_off = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(flen, out=out_off[1:])
        buf = np.empty(int(out_off[-1]), dtype=np.uint8)
        for j in range(len(starts)):
            buf[out_off[j] : out_off[j + 1]] = data[
                starts[j] : starts[j] + flen[j]
            ]
        frames = pa.Array.from_buffers(
            pa.binary(),
            len(starts),
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        ids = batch["media_id"].to_numpy(zero_copy_only=False)[row]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fi.astype(np.int32), pa.int32()),
                "frame": frames,
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

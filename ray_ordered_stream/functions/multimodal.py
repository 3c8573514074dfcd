"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata.

Decode paths, in preference order per stage actor (__init__ holds the
codec, once per actor):

1. **Optional libraries** — PIL for images, soundfile for audio — used
   automatically when importable (not present in this sandbox).
2. **Builtin codecs** (stdlib-only, this module): BMP (24/32-bit
   uncompressed), PPM/PGM (binary), PNG (8-bit non-interlaced; zlib
   inflate + vectorized scanline unfilter) for images; WAV PCM16 via the
   ``wave`` module for audio. These are REAL decoders — pixel/sample
   values come out of the payload bytes.
3. **DeterministicFakeDecoder** — seeded, shape-correct stand-in for
   payloads in formats neither path handles (``decoder="fake"``); with
   ``strict=True`` unsupported formats raise instead.

Usage pattern (actor pool; small batches because rows are wide):

    ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                   batch_size=32, concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import hashlib
import struct
import zlib

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


# ---------------------------------------------------------------------------
# builtin image/audio codecs (stdlib-only; real pixel/sample decode)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (tests/fixtures)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    h, w, _ = a.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up, BGR
        body += a[y, :, ::-1].tobytes() + b"\x00" * pad
    size = 54 + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return hdr + dib + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3 if bpp == 24 else w * 4
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off)
    px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    return rgb[::-1].copy() if flip else rgb.copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> (H, W, 3|1) uint8."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, whitespace-separated w h maxval (comments allowed)
    pos, fields = 2, []
    while len(fields) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1  # the single whitespace after maxval
    w, h, _maxv = fields
    c = 3 if magic == b"P6" else 1
    return np.frombuffer(payload, np.uint8, count=h * w * c, offset=pos).reshape(
        h, w, c
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG encoder, filter 0 (tests/fixtures)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[..., None]
    h, w, c = a.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG (gray/RGB/RGBA) -> (H, W, C) uint8.
    zlib inflate + per-scanline unfilter (Paeth incl.)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})"
                )
            c = {0: 1, 2: 3, 6: 4}[color]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * c
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, cur = int(filters[y]), lines[y].copy()
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if f == 0:
            out[y] = cur.astype(np.uint8)
        elif f == 2:  # up (vectorized)
            out[y] = ((cur + prev) & 0xFF).astype(np.uint8)
        elif f in (1, 3, 4):  # sub / average / paeth need the running left
            row = out[y]
            for x in range(stride):
                a = int(row[x - c]) if x >= c else 0
                b = int(prev[x])
                if f == 1:
                    v = cur[x] + a
                elif f == 3:
                    v = cur[x] + ((a + b) >> 1)
                else:
                    cc = int(out[y - 1][x - c]) if (x >= c and y) else 0
                    p = a + b - cc
                    pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else cc)
                    v = cur[x] + pred
                row[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(h, w, c)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """PCM16 mono/stereo WAV encoder (tests/fixtures; stdlib ``wave``)."""
    import io
    import wave

    s = np.asarray(samples)
    if s.dtype != np.int16:
        s = np.clip(s, -1.0, 1.0)
        s = (s * 32767.0).astype(np.int16)
    ch = 1 if s.ndim == 1 else s.shape[1]
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.tobytes())
    return bio.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM16 -> (samples float32 in [-1, 1] (n,) or (n, ch), rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported by the builtin codec")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        s = np.frombuffer(f.readframes(n), dtype=np.int16)
    s = s.astype(np.float32) / 32768.0
    return (s.reshape(-1, ch) if ch > 1 else s), rate


class ImageCodec:
    """Image decode with library fallback: PIL when importable (held once
    per actor), else the builtin BMP/PPM/PNG decoders by magic bytes."""

    def __init__(self):
        try:
            from PIL import Image  # optional dependency

            self._pil = Image
        except ImportError:
            self._pil = None

    @property
    def backend(self) -> str:
        return "pil" if self._pil is not None else "builtin"

    def decode(self, payload: bytes) -> np.ndarray:
        if self._pil is not None:
            import io

            arr = np.asarray(self._pil.open(io.BytesIO(payload)))
            return arr[..., None] if arr.ndim == 2 else arr
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return decode_png(payload)
        if payload[:2] in (b"P6", b"P5"):
            return decode_ppm(payload)
        raise ValueError("unrecognized image payload (builtin codec)")


class AudioCodec:
    """Audio decode with library fallback: soundfile when importable, else
    the stdlib ``wave`` WAV PCM16 decoder."""

    def __init__(self):
        try:
            import soundfile  # optional dependency

            self._sf = soundfile
        except ImportError:
            self._sf = None

    @property
    def backend(self) -> str:
        return "soundfile" if self._sf is not None else "builtin"

    def decode(self, payload: bytes) -> tuple[np.ndarray, int]:
        if self._sf is not None:
            import io

            data, rate = self._sf.read(io.BytesIO(payload), dtype="float32")
            return data, int(rate)
        return decode_wav(payload)


class DeterministicFakeDecoder:
    """Stand-in for a real codec: maps payload bytes to a fixed-size feature
    vector deterministically (md5-seeded). Swap for PIL/libav in a real
    deployment — the stage signature stays identical."""

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim

    def decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        return np.random.default_rng(seed).standard_normal(self.feat_dim).astype(np.float32)


def _image_feature(arr: np.ndarray, feat_dim: int = 16) -> np.ndarray:
    """Deterministic feature of a DECODED image: [h, w, c, mean, std] +
    an (feat_dim-5)-bin grayscale histogram (density)."""
    h, w, c = arr.shape
    gray = arr.mean(axis=2, dtype=np.float64)
    hist, _ = np.histogram(gray, bins=feat_dim - 5, range=(0.0, 256.0))
    out = np.empty(feat_dim, dtype=np.float32)
    out[:5] = (h, w, c, float(arr.mean()), float(arr.std()))
    out[5:] = hist / max(1, gray.size)
    return out


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract image rows.

    ``decoder="real"`` holds an ``ImageCodec`` per actor (PIL when
    importable, else the builtin BMP/PPM/PNG decoders) and features are
    computed from the ACTUAL pixels; ``decoder="fake"`` (default, matches
    round-2 behavior for arbitrary payload bytes) uses the deterministic
    fake; ``strict=True`` with the fake raises instead of faking.
    """

    def __init__(self, feat_dim: int = 16, strict: bool = False,
                 decoder: str = "fake"):
        self.strict = strict
        self.feat_dim = feat_dim
        self.mode = decoder
        self.codec = ImageCodec() if decoder == "real" else None
        self.decoder = DeterministicFakeDecoder(feat_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and self.mode != "real":
            raise NotImplementedError(
                "image codec libraries are not available in this environment"
            )
        data, offsets = _binary_buffers(batch["payload"])
        # zero-copy memoryview per payload (``as_py()`` would copy every
        # payload's bytes); the per-item call is the codec itself
        if self.mode == "real":
            feats = [
                _image_feature(
                    self.codec.decode(data[offsets[i] : offsets[i + 1]].tobytes()),
                    self.feat_dim,
                )
                for i in range(len(offsets) - 1)
            ]
        else:
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


class ImageStatsStage:
    """Actor-pool stage: REAL decode of image payloads to scalar per-image
    stats (height, width, channels, integer mean pixel) — the SQL-oracle
    surface for the real codec path. The codec is held once per actor."""

    def __init__(self):
        self.codec = ImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        hs, ws, cs, means = [], [], [], []
        for i in range(len(offsets) - 1):
            arr = self.codec.decode(data[offsets[i] : offsets[i + 1]].tobytes())
            h, w, c = arr.shape
            hs.append(h)
            ws.append(w)
            cs.append(c)
            means.append(int(round(float(arr.mean()))))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "mean_val": pa.array(means, pa.int64()),
            }
        )


class AudioDecodeStage:
    """Actor-pool stage: REAL decode of audio payloads (soundfile when
    importable, stdlib WAV otherwise) to (n_samples, sample_rate, integer
    mean amplitude scaled by 1e4)."""

    def __init__(self):
        self.codec = AudioCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        data, offsets = _binary_buffers(batch["payload"])
        ns, rates, means = [], [], []
        for i in range(len(offsets) - 1):
            s, rate = self.codec.decode(
                data[offsets[i] : offsets[i + 1]].tobytes()
            )
            ns.append(len(s))
            rates.append(rate)
            # floor(x+0.5): no half-to-even ambiguity vs the SQL oracle
            means.append(int(np.floor(float(s.mean()) * 10_000 + 0.5)))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int32()),
                "mean_amp_1e4": pa.array(means, pa.int64()),
            }
        )


def synth_real_media_table(n: int = 48, seed: int = 0) -> pa.Table:
    """Deterministic REAL media payloads: solid-color images rotating
    through BMP/PPM/PNG encodings plus constant-amplitude WAV clips — every
    decoded stat is a closed form of media_id, so a SQL oracle can verify
    the full decode path end-to-end."""
    rows = {k: [] for k in (
        "media_id", "media_type", "payload", "width", "height",
        "sample_rate", "n_frames",
    )}
    for i in range(n):
        if i % 4 < 3:  # image (solid color -> mean == color)
            w, h = 16 + (i % 8) * 4, 12 + (i % 5) * 4
            color = (i * 7) % 256
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            payload = (encode_bmp, encode_ppm, encode_png)[i % 4](arr)
            rows["media_type"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sample_rate"].append(0)
            rows["n_frames"].append(0)
        else:  # audio: constant PCM16 amplitude -> exact mean
            rate = 8000 + (i % 3) * 4000
            n_samp = 100 + (i % 10) * 10
            # integer arithmetic (== int(amp*32767) for amp=k/1e4) so the
            # SQL oracle's closed form is exact
            k = (i * 11) % 1000
            samples = np.full(n_samp, (k * 32767) // 10_000, dtype=np.int16)
            payload = encode_wav(samples, rate)
            rows["media_type"].append("audio")
            rows["width"].append(0)
            rows["height"].append(0)
            rows["sample_rate"].append(rate)
            rows["n_frames"].append(n_samp)
        rows["media_id"].append(i)
        rows["payload"].append(payload)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "media_type": pa.array(rows["media_type"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_images(ds, feat_dim: int = 16, batch_size: int = 32,
                  concurrency: int = 4, decoder: str = "fake"):
    """Wide binary rows -> small batches, actor pool (setup once per actor)."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feat_dim": feat_dim, "decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_stats(ds, batch_size: int = 32, concurrency: int = 4):
    """Real-decode image stats (see ImageStatsStage)."""
    return ds.map_batches(
        ImageStatsStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_stats(ds, batch_size: int = 32, concurrency: int = 4):
    """Real-decode audio stats (see AudioDecodeStage)."""
    return ds.map_batches(
        AudioDecodeStage,
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

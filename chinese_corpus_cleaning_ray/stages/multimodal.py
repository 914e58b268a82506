"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool decode/feature stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
actual byte→pixels step is pluggable: ``DeterministicFakeDecoder`` (default in
tests) derives stable pseudo-features from the payload bytes, and
``RealImageDecoder`` raises NotImplementedError with a clear message until a
decoder dependency is provided. Everything Ray-side — schema, batch sizing for
wide binary rows, actor signature, output layout — is real and tested.

Scale note: binary payloads are wide; keep ``batch_size`` small (default 64)
and rely on Arrow binary buffers (no Python copies) so a batch × concurrency
fits the worker heap.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


class DeterministicFakeDecoder:
    """Stand-in decoder: stable (width, height, mean_value) from payload bytes."""

    def decode(self, payload: bytes) -> dict:
        if payload is None or len(payload) == 0:
            return {"width": 0, "height": 0, "mean_value": 0.0, "ok": False}
        h = hashlib.blake2b(payload, digest_size=8).digest()
        return {
            "width": 16 + h[0] % 240,
            "height": 16 + h[1] % 240,
            "mean_value": h[2] / 255.0,
            "ok": True,
        }

    def decode_luma(self, payload: bytes):
        """Deterministic fake luma (16x16 from a blake2b expansion of the
        payload) so the perceptual-hash plumbing tests run without a codec:
        equal payloads -> equal luma -> equal hash."""
        import numpy as np

        if payload is None or len(payload) == 0:
            return None
        raw = hashlib.blake2b(payload, digest_size=32).digest()
        seed = np.frombuffer(raw, np.uint8).astype(np.float64)
        return np.add.outer(seed[:16], seed[16:]) % 256.0


class PurePythonImageDecoder:
    """REAL in-sandbox decode path, stdlib-only: parses PNG (8-bit gray /
    RGB / RGBA, all five scanline filters, zlib IDAT) and uncompressed
    24-bit BMP, returning true width/height and mean luma (ITU-R BT.601
    0.299R+0.587G+0.114B, alpha ignored) under the same
    ``.decode(bytes)->dict`` contract as the fake/PIL decoders. Built from
    the public PNG (RFC 2083) and BMP format specs — no image library.
    Unsupported variants (palette/16-bit/interlaced PNG, compressed BMP)
    and corrupt payloads degrade to ok=False rather than failing the
    block. Intended for feature extraction on small images; a production
    deployment with pillow installed should prefer RealImageDecoder."""

    _FAIL = {"width": 0, "height": 0, "mean_value": 0.0, "ok": False}

    def decode_luma(self, payload: bytes):
        """Full luma matrix (float64 HxW) of a decodable payload, else None
        — the pixel-level seam the perceptual-hash stage consumes."""
        d = self.decode(payload)
        return d.get("luma") if d.get("ok") else None

    def decode(self, payload: bytes) -> dict:
        if not payload:
            return dict(self._FAIL)
        try:
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                return self._decode_png(payload)
            if payload[:2] == b"BM":
                return self._decode_bmp(payload)
        except Exception:
            pass
        return dict(self._FAIL)

    def _decode_png(self, payload: bytes) -> dict:
        import struct
        import zlib

        import numpy as np

        pos, idat = 8, []
        width = height = None
        bit_depth = color_type = interlace = None
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if ctype == b"IHDR":
                width, height, bit_depth, color_type, _, _, interlace = (
                    struct.unpack(">IIBBBBB", data))
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + crc
        # supported: 8-bit gray(0) / RGB(2) / gray+alpha(4) / RGBA(6), no interlace
        channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
        if not width or not height or bit_depth != 8 or channels is None or interlace:
            return dict(self._FAIL)
        raw = zlib.decompress(b"".join(idat))
        stride = width * channels
        if len(raw) < height * (stride + 1):
            return dict(self._FAIL)
        bpp = channels
        prev = np.zeros(stride, dtype=np.uint8)
        rows = np.empty((height, stride), dtype=np.uint8)
        for y in range(height):
            off = y * (stride + 1)
            f = raw[off]
            line = np.frombuffer(raw, dtype=np.uint8,
                                 count=stride, offset=off + 1).astype(np.int32)
            if f == 0:        # None
                cur = line
            elif f == 2:      # Up
                cur = (line + prev) & 0xFF
            else:             # Sub / Average / Paeth need left-recurrence
                cur = np.zeros(stride, dtype=np.int32)
                for i in range(stride):
                    a = cur[i - bpp] if i >= bpp else 0
                    b = int(prev[i])
                    if f == 1:
                        cur[i] = (line[i] + a) & 0xFF
                    elif f == 3:
                        cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                    elif f == 4:
                        c = int(rows[y - 1, i - bpp]) if (i >= bpp and y > 0) else 0
                        p = a + b - c
                        pa_, pb, pcv = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa_ <= pb and pa_ <= pcv) else (b if pb <= pcv else c)
                        cur[i] = (line[i] + pred) & 0xFF
                    else:
                        return dict(self._FAIL)
            rows[y] = cur.astype(np.uint8)
            prev = rows[y]
        px = rows.reshape(height, width, channels).astype(np.float64)
        if channels == 1:
            luma = px[:, :, 0]
        elif channels == 2:
            luma = px[:, :, 0]
        else:
            luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        return {"width": int(width), "height": int(height),
                "mean_value": float(luma.mean() / 255.0), "ok": True,
                "luma": luma}

    def _decode_bmp(self, payload: bytes) -> dict:
        import struct

        import numpy as np

        if len(payload) < 54:
            return dict(self._FAIL)
        (data_off,) = struct.unpack("<I", payload[10:14])
        hdr_size, width, height = struct.unpack("<IiI", payload[14:26])
        planes, bpp = struct.unpack("<HH", payload[26:30])
        (compression,) = struct.unpack("<I", payload[30:34])
        if hdr_size < 40 or bpp != 24 or compression != 0 or width <= 0:
            return dict(self._FAIL)
        height = int(np.int32(height))
        flipped = height > 0          # positive height ⇒ bottom-up rows
        height = abs(height)
        row_bytes = (width * 3 + 3) & ~3
        if len(payload) < data_off + row_bytes * height:
            return dict(self._FAIL)
        buf = np.frombuffer(payload, dtype=np.uint8,
                            count=row_bytes * height, offset=data_off)
        rows = buf.reshape(height, row_bytes)[:, : width * 3]
        if flipped:
            rows = rows[::-1]
        px = rows.reshape(height, width, 3).astype(np.float64)  # BGR order
        luma = 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]
        return {"width": int(width), "height": int(height),
                "mean_value": float(luma.mean() / 255.0), "ok": True,
                "luma": luma}


class RealImageDecoder:  # pragma: no cover - env-gated (PIL absent here)
    """Real decode path, fully wired for when pillow is installed: grayscale
    decode → width/height/mean — same output contract as the fake, so the
    Ray plumbing (schema, batch size, actor signature) is identical. A
    corrupt payload degrades to ok=False rather than failing the block.
    In-sandbox, ``PurePythonImageDecoder`` covers PNG/BMP without PIL."""

    def __init__(self):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image decoding requires PIL/pillow, which is not available in "
                "this environment; inject DeterministicFakeDecoder or provide "
                "a decoder with a .decode(bytes)->dict method"
            ) from e
        self._Image = Image

    def decode(self, payload: bytes) -> dict:
        import io

        import numpy as np

        if not payload:
            return {"width": 0, "height": 0, "mean_value": 0.0, "ok": False}
        try:
            with self._Image.open(io.BytesIO(payload)) as im:
                gray = im.convert("L")
                arr = np.asarray(gray, dtype=np.float64)
                return {
                    "width": int(im.width),
                    "height": int(im.height),
                    "mean_value": float(arr.mean() / 255.0),
                    "ok": True,
                }
        except Exception:
            return {"width": 0, "height": 0, "mean_value": 0.0, "ok": False}


class ImageFeatureStage:
    """Actor-pool stage: binary column → width/height/mean_value/ok columns.
    Decoder is constructed once per actor."""

    def __init__(self, binary_col: str = "payload", decoder_factory=DeterministicFakeDecoder):
        self.binary_col = binary_col
        self.decoder = decoder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.binary_col).to_pylist()
        feats = [self.decoder.decode(p) for p in payloads]
        batch = batch.append_column("width", pa.array([f["width"] for f in feats], pa.int32()))
        batch = batch.append_column("height", pa.array([f["height"] for f in feats], pa.int32()))
        batch = batch.append_column("mean_value", pa.array([f["mean_value"] for f in feats], pa.float64()))
        batch = batch.append_column("decode_ok", pa.array([f["ok"] for f in feats], pa.bool_()))
        return batch


class FrameSampleStage:
    """Actor-pool stage for video-like payloads: deterministic frame sampling —
    emits ``frame_hashes``: list<int64> of ``num_frames`` stable samples drawn
    from evenly spaced byte windows (the real frame extraction slots in via the
    same decoder-injection seam as ImageFeatureStage)."""

    def __init__(self, binary_col: str = "payload", num_frames: int = 4):
        self.binary_col = binary_col
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        payloads = batch.column(self.binary_col).to_pylist()
        all_hashes = []
        for p in payloads:
            if not p:
                all_hashes.append([])
                continue
            n = len(p)
            step = max(1, n // self.num_frames)
            hashes = []
            for i in range(self.num_frames):
                window = p[i * step : i * step + step]
                if not window:
                    break
                h = hashlib.blake2b(window, digest_size=8).digest()
                hashes.append(struct.unpack("<q", h)[0])
            all_hashes.append(hashes)
        return batch.append_column(
            "frame_hashes", pa.array(all_hashes, pa.list_(pa.int64()))
        )


class DeterministicFakeResizer:
    """Resize contract without an image lib: emits a deterministic payload
    derived from (source bytes, target dims) plus the target dims — stable
    across runs, so downstream schemas/dedup behave like the real path."""

    def __init__(self, width: int = 64, height: int = 64):
        self.width = width
        self.height = height

    def resize(self, payload: bytes) -> dict:
        if not payload:
            return {"payload": b"", "width": 0, "height": 0, "ok": False}
        h = hashlib.blake2b(payload + f"{self.width}x{self.height}".encode(),
                            digest_size=32).digest()
        # fake thumbnail: digest tiled to a size proportional to the target
        fake = (h * (self.width * self.height // len(h) + 1))[: self.width * self.height]
        return {"payload": bytes(fake), "width": self.width, "height": self.height,
                "ok": True}


class RealImageResizer:  # pragma: no cover - env-gated (PIL absent here)
    """Real PIL resize → PNG re-encode; same .resize(bytes)->dict contract."""

    def __init__(self, width: int = 64, height: int = 64):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image resizing requires PIL/pillow; inject "
                "DeterministicFakeResizer or any .resize(bytes)->dict object"
            ) from e
        self._Image = Image
        self.width = width
        self.height = height

    def resize(self, payload: bytes) -> dict:
        import io

        if not payload:
            return {"payload": b"", "width": 0, "height": 0, "ok": False}
        try:
            with self._Image.open(io.BytesIO(payload)) as im:
                out = im.resize((self.width, self.height))
                buf = io.BytesIO()
                out.save(buf, format="PNG")
                return {"payload": buf.getvalue(), "width": self.width,
                        "height": self.height, "ok": True}
        except Exception:
            return {"payload": b"", "width": 0, "height": 0, "ok": False}


class ImageResizeStage:
    """Actor-pool stage: binary column → resized binary + dims. Resizer is
    constructed once per actor; small batches — wide binary rows."""

    def __init__(self, binary_col: str = "payload", width: int = 64, height: int = 64,
                 resizer_factory=DeterministicFakeResizer):
        self.binary_col = binary_col
        self.resizer = resizer_factory(width, height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.binary_col).to_pylist()
        outs = [self.resizer.resize(p) for p in payloads]
        batch = batch.append_column(
            "resized", pa.array([o["payload"] for o in outs], pa.binary()))
        batch = batch.append_column(
            "resized_width", pa.array([o["width"] for o in outs], pa.int32()))
        batch = batch.append_column(
            "resized_height", pa.array([o["height"] for o in outs], pa.int32()))
        batch = batch.append_column(
            "resize_ok", pa.array([o["ok"] for o in outs], pa.bool_()))
        return batch


def resize_images(ds, binary_col: str = "payload", width: int = 64, height: int = 64,
                  resizer_factory=DeterministicFakeResizer,
                  batch_size: int = 64, concurrency=4):
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs=dict(binary_col=binary_col, width=width, height=height,
                                   resizer_factory=resizer_factory),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_pool(concurrency, fraction=0.4),
        num_cpus=1,
    )


def decode_images(ds, binary_col: str = "payload", decoder_factory=DeterministicFakeDecoder,
                  batch_size: int = 64, concurrency=4):
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    concurrency = resolve_pool(concurrency, fraction=0.4)
    return ds.map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs=dict(binary_col=binary_col, decoder_factory=decoder_factory),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds, binary_col: str = "payload", num_frames: int = 4,
                  batch_size: int = 64, concurrency=4):
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    concurrency = resolve_pool(concurrency, fraction=0.4)
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(binary_col=binary_col, num_frames=num_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def ahash64(luma) -> int:
    """64-bit average hash (aHash) of a luma matrix: 8x8 block means
    thresholded at their own mean, packed row-major LSB-first, returned as
    a SIGNED int64 (Arrow-friendly; the Hamming machinery views the bits).
    Deterministic, resolution-robust for same-content images (uniform
    brightness shifts do not flip bits); matrices smaller than 8x8 are
    edge-repeated up first."""
    import numpy as np

    a = np.asarray(luma, np.float64)
    if a.ndim != 2 or a.size == 0:
        return 0
    h, w = a.shape
    if h < 8:
        a = np.repeat(a, -(-8 // h), axis=0)
        h = a.shape[0]
    if w < 8:
        a = np.repeat(a, -(-8 // w), axis=1)
        w = a.shape[1]
    re = (np.arange(9, dtype=np.int64) * h) // 8
    ce = (np.arange(9, dtype=np.int64) * w) // 8
    sums = np.add.reduceat(np.add.reduceat(a, re[:-1], axis=0), ce[:-1], axis=1)
    counts = np.outer(np.diff(re), np.diff(ce)).astype(np.float64)
    means = sums / counts
    bits = (means > means.mean()).ravel()
    packed = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            packed |= np.uint64(1) << np.uint64(i)
    return int(packed.astype(np.int64))


class ImagePHashStage:
    """Actor-pool stage: binary column -> ``phash`` (int64 aHash) +
    ``phash_ok`` columns. Decoder built once per actor; any payload the
    decoder cannot handle gets phash_ok=False (and is EXCLUDED from dedup
    downstream, never silently grouped under hash 0)."""

    def __init__(self, binary_col: str = "payload",
                 decoder_factory=PurePythonImageDecoder):
        self.binary_col = binary_col
        self.decoder = decoder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        payloads = batch.column(self.binary_col).to_pylist()
        hashes = np.zeros(len(payloads), np.int64)
        ok = np.zeros(len(payloads), bool)
        for i, p in enumerate(payloads):
            luma = self.decoder.decode_luma(p)
            if luma is not None:
                hashes[i] = ahash64(luma)
                ok[i] = True
        batch = batch.append_column("phash", pa.array(hashes, pa.int64()))
        batch = batch.append_column("phash_ok", pa.array(ok, pa.bool_()))
        return batch


def image_phash_dedup(ds, id_col: str = "image_id",
                      binary_col: str = "payload", max_hamming: int = 0,
                      decoder_factory=PurePythonImageDecoder,
                      batch_size: int = 64, concurrency=4,
                      strategy: str = "auto",
                      broadcast_limit: int = 2_000_000):
    """Perceptual image dedup: decode (actor pool, real in-sandbox PNG/BMP
    decoder by default) -> 64-bit aHash -> the SAME banded Hamming plan as
    text SimHash (``dedup_stage.hamming_dup_ids``): 4x16-bit band blocking
    finds every pair within Hamming <= 3, buckets verify by exact popcount,
    keep-first by id. Undecodable payloads always survive (no hash — no
    claim). Returns ``(filtered_ds, dup_ids)`` like every house dedup; the
    filtered Dataset keeps the ``phash``/``phash_ok`` columns for audit."""
    from chinese_corpus_cleaning_ray.stages.dedup_stage import (
        anti_filter,
        hamming_dup_ids,
    )
    from chinese_corpus_cleaning_ray.stages.pools import resolve_pool

    hashed = ds.map_batches(
        ImagePHashStage,
        fn_constructor_kwargs=dict(binary_col=binary_col,
                                   decoder_factory=decoder_factory),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_pool(concurrency, fraction=0.4),
        num_cpus=1,
    ).materialize()  # hash once; both the dedup plan and the output read it

    def only_ok(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("phash_ok"), True)).select(
            [id_col, "phash"])

    dup_ids = hamming_dup_ids(
        hashed.map_batches(only_ok, batch_format="pyarrow"), id_col, "phash",
        max_hamming=max_hamming)
    return anti_filter(hashed, dup_ids, id_col, strategy=strategy,
                       broadcast_limit=broadcast_limit)

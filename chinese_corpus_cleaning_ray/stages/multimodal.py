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


class RealImageDecoder:  # pragma: no cover - env-gated (PIL absent here)
    """Real decode path, fully wired for when pillow is installed: grayscale
    decode → width/height/mean — same output contract as the fake, so the
    Ray plumbing (schema, batch size, actor signature) is identical. A
    corrupt payload degrades to ok=False rather than failing the block."""

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

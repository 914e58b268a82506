"""Perceptual image dedup: aHash kernel + the decode->hash->banded-Hamming
pipeline over REAL in-sandbox PNG payloads (stdlib-built fixtures), plus the
fake-decoder plumbing path. The Hamming half is the same plan text SimHash
uses (dedup_stage.hamming_dup_ids), so this pins the factoring too."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from chinese_corpus_cleaning_ray.stages.multimodal import (
    DeterministicFakeDecoder,
    ImagePHashStage,
    PurePythonImageDecoder,
    ahash64,
    image_phash_dedup,
)


def make_gray_png(px: np.ndarray, filters: bool = False) -> bytes:
    """Minimal 8-bit grayscale PNG (stdlib only). With ``filters=True`` the
    scanlines alternate None/Up so byte-identical pixels can come from
    byte-DIFFERENT files (re-encoded duplicates)."""
    h, w = px.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = bytearray()
    prev = np.zeros(w, np.int32)
    for y in range(h):
        cur = px[y].astype(np.int32)
        if filters and y % 2 == 1:
            raw.append(2)  # Up
            raw.extend(((cur - prev) & 0xFF).astype(np.uint8).tobytes())
        else:
            raw.append(0)  # None
            raw.extend(cur.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


class TestAHash:
    def test_brightness_invariance_and_sensitivity(self):
        rng = np.random.default_rng(4)
        base = rng.integers(0, 200, (32, 32)).astype(np.float64)
        h0 = ahash64(base)
        assert h0 == ahash64(base + 30.0)       # uniform shift: same bits
        assert h0 == ahash64(base * 1.2)        # uniform scale: same bits
        other = rng.integers(0, 200, (32, 32)).astype(np.float64)
        assert bin(np.uint64(h0) ^ np.uint64(ahash64(other))).count("1") > 10

    def test_small_and_degenerate_inputs(self):
        assert ahash64(np.zeros((0, 0))) == 0
        # smaller than 8x8: edge-repeat up, still a stable function
        tiny = np.arange(6, dtype=np.float64).reshape(2, 3)
        assert ahash64(tiny) == ahash64(tiny)
        assert isinstance(ahash64(tiny), int)

    def test_real_decoder_roundtrip_matches_pixels(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (24, 24)).astype(np.uint8)
        dec = PurePythonImageDecoder()
        plain = dec.decode_luma(make_gray_png(px))
        filt = dec.decode_luma(make_gray_png(px, filters=True))
        assert plain is not None and np.array_equal(plain, px.astype(float))
        assert np.array_equal(plain, filt)  # re-encode: same pixels
        assert dec.decode_luma(b"not an image") is None


class TestImagePHashDedup:
    def _payloads(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 230, (24, 24)).astype(np.uint8)  # headroom: +25 never clips
        b = rng.integers(0, 230, (24, 24)).astype(np.uint8)
        return {
            1: make_gray_png(a),                      # keeper (min id)
            2: make_gray_png(a, filters=True),        # re-encoded dup of 1
            3: make_gray_png(b),                      # distinct image
            4: make_gray_png((a + 25).astype(np.uint8)),  # uniform brighten
            5: b"corrupt bytes not an image",         # undecodable
        }

    def test_real_png_dedup_keep_first(self, ray_session):
        import ray

        pl = self._payloads()
        t = pa.table({"image_id": pa.array(list(pl), pa.int64()),
                      "payload": pa.array(list(pl.values()), pa.binary())})
        kept, dup_ids = image_phash_dedup(
            ray.data.from_arrow(t).repartition(2), "image_id",
            max_hamming=0, concurrency=2)
        got = kept.to_pandas().sort_values("image_id")
        # 2 drops (same pixels as 1); 4 (brightness shift -> same aHash)
        # also collapses onto 1; 3 distinct survives; 5 undecodable survives
        assert list(got.image_id) == [1, 3, 5]
        assert not bool(got.loc[got.image_id == 5, "phash_ok"].iloc[0])
        ph = dict(zip(got.image_id, got.phash))
        assert ph[1] != ph[3]

    def test_layout_invariance(self, ray_session):
        import ray

        pl = self._payloads()
        t = pa.table({"image_id": pa.array(list(pl), pa.int64()),
                      "payload": pa.array(list(pl.values()), pa.binary())})
        a, _ = image_phash_dedup(ray.data.from_arrow(t), "image_id",
                                 concurrency=1)
        b, _ = image_phash_dedup(ray.data.from_arrow(t).repartition(5),
                                 "image_id", concurrency=3)
        assert (sorted(a.to_pandas().image_id)
                == sorted(b.to_pandas().image_id))

    def test_fake_decoder_plumbing(self, ray_session):
        """Without a codec: equal payloads dedup, distinct survive — the
        plumbing contract any real decoder inherits."""
        import ray

        t = pa.table({"image_id": pa.array([1, 2, 3], pa.int64()),
                      "payload": pa.array([b"xx", b"xx", b"yy"], pa.binary())})
        kept, _ = image_phash_dedup(ray.data.from_arrow(t), "image_id",
                                    decoder_factory=DeterministicFakeDecoder,
                                    concurrency=1)
        assert sorted(kept.to_pandas().image_id) == [1, 3]

    def test_stage_schema(self, ray_session):
        stage = ImagePHashStage(decoder_factory=DeterministicFakeDecoder)
        out = stage(pa.table({"image_id": pa.array([1], pa.int64()),
                              "payload": pa.array([b""], pa.binary())}))
        assert out.column("phash_ok").to_pylist() == [False]
        assert out.column("phash").type == pa.int64()

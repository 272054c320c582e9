"""Real raster codec (BMP 24-bit / PPM P6) — pure decode-kernel gates.

The Spark-side plumbing (schema, Arrow batching, mapInPandas) is covered
in test_pipeline_ops.py; here the decoder itself is pinned: header
parsing, row padding, bottom-up order, BGR→RGB, and the exact feature
statistics an SQL oracle recomputes arithmetically
(CORRECTNESS query ``media_featurize_real``).
"""

from __future__ import annotations

import numpy as np
import pytest

from probabilistic_rs_spark.datagen import bmp_for_id, bmp_solid
from probabilistic_rs_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_ppm,
    image_features,
    _image_decode_featurize,
)


def ppm_bytes(w: int, h: int, pixels: np.ndarray, comment: str | None = None) -> bytes:
    head = b"P6\n"
    if comment:
        head += b"# " + comment.encode() + b"\n"
    head += f"{w} {h}\n255\n".encode()
    return head + pixels.astype(np.uint8).tobytes()


class TestBMP:
    def test_solid_roundtrip_geometry_and_color(self):
        img = decode_bmp(bmp_solid(5, 3, (10, 200, 31)))
        assert img.shape == (3, 5, 3)
        assert (img[:, :, 0] == 10).all()
        assert (img[:, :, 1] == 200).all()
        assert (img[:, :, 2] == 31).all()

    def test_row_padding_widths(self):
        # stride padding differs for w % 4 ∈ {0,1,2,3} — all must decode
        for w in (4, 5, 6, 7):
            img = decode_bmp(bmp_solid(w, 2, (1, 2, 3)))
            assert img.shape == (2, w, 3)
            assert (img == np.array([1, 2, 3], dtype=np.uint8)).all()

    def test_bottom_up_row_order(self):
        # hand-build a 1x2 bottom-up BMP: storage row 0 is the BOTTOM row
        top, bottom = (255, 0, 0), (0, 0, 255)
        stride_row = lambda rgb: bytes((rgb[2], rgb[1], rgb[0])) + b"\x00"
        header = bytearray(bmp_solid(1, 2, (0, 0, 0)))
        payload = stride_row(bottom) + stride_row(top)  # bottom first on disk
        data = bytes(header[:54]) + payload
        img = decode_bmp(data)
        assert tuple(img[0, 0]) == top
        assert tuple(img[1, 0]) == bottom

    def test_rejects_non_bmp_and_unsupported(self):
        with pytest.raises(ValueError, match="not a BMP"):
            decode_bmp(b"JUNK" * 20)
        # 24bpp flag corrupted to 8bpp
        bad = bytearray(bmp_solid(4, 4, (0, 0, 0)))
        bad[28] = 8
        with pytest.raises(ValueError, match="unsupported BMP"):
            decode_bmp(bytes(bad))
        with pytest.raises(ValueError, match="truncated"):
            decode_bmp(bmp_solid(8, 8, (1, 1, 1))[:-10])


class TestPPM:
    def test_roundtrip_with_comment(self):
        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        img = decode_ppm(ppm_bytes(3, 2, px, comment="fixture"))
        assert (img == px).all()

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="not a P6"):
            decode_ppm(b"P3\n1 1\n255\n000")
        with pytest.raises(ValueError, match="truncated PPM payload"):
            decode_ppm(b"P6\n4 4\n255\n\x00\x00")
        with pytest.raises(ValueError, match="maxval"):
            decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


class TestFeatures:
    def test_solid_color_stats_are_exact(self):
        img = decode_bmp(bmp_solid(6, 4, (51, 102, 255)))
        f = image_features(img)
        assert f.shape == (FEATURE_DIM,)
        assert (f[0], f[1]) == (6.0, 4.0)
        np.testing.assert_allclose(f[2:5], [51 / 255, 102 / 255, 255 / 255], rtol=1e-6)
        np.testing.assert_allclose(f[5:8], 0.0, atol=1e-7)  # solid → zero std
        np.testing.assert_allclose(f[8:11], f[2:5], rtol=1e-6)  # min == mean
        np.testing.assert_allclose(f[11:14], f[2:5], rtol=1e-6)  # max == mean
        assert f[15] == 24.0

    def test_id_derived_bmp_matches_arithmetic_oracle(self):
        # the exact contract media_featurize_real's SQL oracle relies on
        for did in (0, 1, 12, 13, 255, 256, 9999):
            f = image_features(decode_bmp(bmp_for_id(did)))
            assert f[0] == 4 + did % 13
            assert f[1] == 3 + did % 7
            assert round(float(f[2]) * 255) == did % 256
            assert round(float(f[3]) * 255) == (7 * did) % 256
            assert round(float(f[4]) * 255) == (13 * did) % 256

    def test_batch_featurize_mixed_and_guards(self):
        import pandas as pd

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        batch = pd.Series([bmp_for_id(7), ppm_bytes(2, 2, px), None, b""])
        out = _image_decode_featurize(batch)
        assert out.shape == (4, FEATURE_DIM)
        assert out[0, 0] == 4 + 7 % 13
        assert out[1, 15] == 4.0
        assert (out[2] == 0).all() and (out[3] == 0).all()
        with pytest.raises(NotImplementedError):  # compressed container
            _image_decode_featurize(pd.Series([b"\xff\xd8\xff rest-of-jpeg"]))
        with pytest.raises(ValueError):
            _image_decode_featurize(pd.Series([b"garbage-bytes"]))

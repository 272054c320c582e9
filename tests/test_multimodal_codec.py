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
        with pytest.raises(NotImplementedError):  # audio container
            _image_decode_featurize(pd.Series([b"RIFF\x00\x00\x00\x00WAVE"]))
        with pytest.raises(ValueError):  # JPEG magic but corrupt stream
            _image_decode_featurize(pd.Series([b"\xff\xd8\xff rest-of-jpeg"]))
        with pytest.raises(ValueError):
            _image_decode_featurize(pd.Series([b"garbage-bytes"]))


class TestPNG:
    """Round 6: the real zlib-based PNG decoder (chunk walk + CRC, IHDR,
    IDAT inflate, all five scanline unfilters, RGB + RGBA)."""

    def test_solid_roundtrip_both_color_types_all_filters(self):
        from probabilistic_rs_spark.datagen import bmp_for_id, png_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            decode_bmp,
            decode_png,
        )

        # (did >> 2) % 3 rotates the color type: RGB / RGBA / palette
        for did in (0, 1, 2, 7, 8, 10, 13, 23, 35, 91, 107, 255, 511, 999):
            img = decode_png(png_for_id(did))
            w, h = 4 + did % 13, 3 + did % 7
            assert img.shape == (h, w, 3)
            assert (img[:, :, 0] == did % 256).all()
            assert (img[:, :, 1] == (7 * did) % 256).all()
            assert (img[:, :, 2] == (13 * did) % 256).all()
            # codec parity: PNG and BMP twins decode identically
            assert (img == decode_bmp(bmp_for_id(did))).all()

    @staticmethod
    def _encode(img: np.ndarray) -> bytes:
        """Minimal test-side encoder for arbitrary content, rotating
        through every filter type per row."""
        import zlib

        from probabilistic_rs_spark.datagen import _png_chunk

        h, w, c = img.shape
        bpp, stride = c, w * c
        prev = bytes(stride)
        out = bytearray()

        def pp(a, b, cc):
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

        for r in range(h):
            raw = img[r].tobytes()
            f = r % 5
            out.append(f)
            for i in range(stride):
                left = raw[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    v = raw[i]
                elif f == 1:
                    v = raw[i] - left
                elif f == 2:
                    v = raw[i] - prev[i]
                elif f == 3:
                    v = raw[i] - ((left + prev[i]) >> 1)
                else:
                    v = raw[i] - pp(left, prev[i], ul)
                out.append(v & 0xFF)
            prev = raw
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes((8, 6 if c == 4 else 2, 0, 0, 0))
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 9))
            + _png_chunk(b"IEND", b"")
        )

    def test_arbitrary_content_roundtrip(self):
        from probabilistic_rs_spark.operators.multimodal import decode_png

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
        assert (decode_png(self._encode(img)) == img).all()
        img4 = rng.integers(0, 256, (8, 5, 4), dtype=np.uint8)
        assert (decode_png(self._encode(img4)) == img4[:, :, :3]).all()

    def test_rejects_corrupt_and_unsupported(self):
        from probabilistic_rs_spark.datagen import png_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_png

        good = bytearray(png_for_id(4))
        bad = bytearray(good)
        bad[20] ^= 0xFF  # flip a bit inside IHDR
        with pytest.raises(ValueError, match="CRC mismatch"):
            decode_png(bytes(bad))
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"BM not a png")
        with pytest.raises(ValueError, match="truncated"):
            decode_png(bytes(good[:30]))
        # interlace byte (last IHDR byte) flipped to 1 (CRC recomputed)
        import zlib as _z

        ihdr = bytes(good[16:29])
        patched = ihdr[:-1] + b"\x01"
        rebuilt = (
            bytes(good[:12])
            + b"IHDR"
            + patched
            + (_z.crc32(b"IHDR" + patched) & 0xFFFFFFFF).to_bytes(4, "big")
            + bytes(good[33:])
        )
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(rebuilt)

    def test_palette_roundtrip_and_guards(self):
        """Round 7: color type 3 — indices map through PLTE; distractor
        entries mean an index/entry mixup cannot round-trip; missing
        PLTE, malformed PLTE, and out-of-range indices fail loudly."""
        import zlib as _z

        from probabilistic_rs_spark.datagen import (
            _png_chunk,
            png_palette_solid,
        )
        from probabilistic_rs_spark.operators.multimodal import decode_png

        for idx in (0, 1, 4):
            img = decode_png(png_palette_solid(9, 5, (200, 10, 99), index=idx))
            assert img.shape == (5, 9, 3)
            assert (img == np.array([200, 10, 99], dtype=np.uint8)).all()
        good = bytearray(png_palette_solid(6, 4, (1, 2, 3), index=1))
        # strip the PLTE chunk → loud fail
        p = good.find(b"PLTE") - 4
        plen = int.from_bytes(good[p : p + 4], "big")
        without_plte = bytes(good[:p]) + bytes(good[p + 12 + plen :])
        with pytest.raises(ValueError, match="missing its PLTE"):
            decode_png(without_plte)
        # malformed PLTE length (not a multiple of 3)
        badplte = (
            bytes(good[:p])
            + _png_chunk(b"PLTE", b"\x01\x02\x03\x04")
            + bytes(good[p + 12 + plen :])
        )
        with pytest.raises(ValueError, match="malformed PLTE"):
            decode_png(badplte)
        # out-of-range index: 2-entry palette, index byte 7
        ihdr = (6).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes((8, 3, 0, 0, 0))
        oor = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", bytes(range(6)))
            + _png_chunk(b"IDAT", _z.compress(b"\x00" + b"\x07" * 6))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="palette index"):
            decode_png(oor)

    def test_featurize_dispatches_png(self):
        from probabilistic_rs_spark.datagen import png_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            _image_decode_featurize,
        )

        import pandas as pd

        out = _image_decode_featurize(pd.Series([png_for_id(6)]))
        assert out[0, 0] == 4 + 6 % 13 and out[0, 1] == 3 + 6 % 7


class TestGIF:
    """Round 6b: the real LZW GIF decoder (color tables, interlace,
    variable code width, table reset) against the independent encoder in
    datagen — GIF is lossless at ≤256 colors, so round trips are exact."""

    def test_patterned_roundtrip_plain_and_interlaced(self):
        from probabilistic_rs_spark.datagen import gif_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_gif

        rng = np.random.default_rng(11)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 256, (23, 17))]
        for interlace in (False, True):
            out = decode_gif(gif_from_array(img, interlace=interlace))
            assert out.shape == img.shape
            assert (out == img).all()

    def test_small_palette_and_lzw_table_reset(self):
        from probabilistic_rs_spark.datagen import gif_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_gif

        rng = np.random.default_rng(12)
        # 3 colors → 2-bit min code size path
        pal3 = np.array([[0, 0, 0], [255, 0, 0], [0, 0, 255]], dtype=np.uint8)
        img3 = pal3[rng.integers(0, 3, (9, 31))]
        assert (decode_gif(gif_from_array(img3)) == img3).all()
        # big random 256-color frame: LZW table hits 4096 and resets
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        big = pal[rng.integers(0, 256, (128, 130))]
        assert (decode_gif(gif_from_array(big)) == big).all()

    def test_id_fixture_matches_arithmetic_oracle(self):
        from probabilistic_rs_spark.datagen import bmp_for_id, gif_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            decode_bmp,
            decode_gif,
        )

        for did in (0, 1, 2, 4, 6, 91, 255, 999):
            img = decode_gif(gif_for_id(did))
            assert img.shape == (3 + did % 7, 4 + did % 13, 3)
            assert (img == decode_bmp(bmp_for_id(did))).all()

    def test_rejects_corrupt(self):
        from probabilistic_rs_spark.datagen import gif_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_gif

        good = gif_for_id(4)
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"NOPE" + good[4:])
        with pytest.raises(ValueError, match="truncated|no image"):
            decode_gif(good[:14])
        # trailer immediately after the screen descriptor: no frame
        with pytest.raises(ValueError, match="no image"):
            decode_gif(good[:13] + good[13 : 13 + 3 * 2] + b"\x3b")


class TestJPEG:
    """Round 6b: the real baseline-DCT JPEG decoder (canonical Huffman
    from DHT, zigzag dequant, float IDCT, YCbCr) against the independent
    encoder in datagen."""

    def test_solid_gray_fixture_is_exact(self):
        from probabilistic_rs_spark.datagen import jpeg_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        for did in (0, 1, 3, 7, 11, 91, 255, 12345):
            img = decode_jpeg(jpeg_for_id(did))
            assert img.shape == (3 + did % 7, 4 + did % 13, 3)
            assert (img == (29 * did) % 256).all()

    def test_patterned_gray_within_quant_bound(self):
        from probabilistic_rs_spark.datagen import jpeg_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        rng = np.random.default_rng(13)
        gray = rng.integers(0, 256, (33, 41), dtype=np.uint8)
        out = decode_jpeg(jpeg_from_array(gray))
        assert out.shape == (33, 41, 3)
        assert (out[:, :, 0] == out[:, :, 1]).all()
        err = np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max()
        assert err <= 3  # flat quant=1: rounding error only

    def test_color_within_chroma_bound_and_coarser_quant(self):
        from probabilistic_rs_spark.datagen import jpeg_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        rng = np.random.default_rng(14)
        img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        out = decode_jpeg(jpeg_from_array(img))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
        # a real quant table (q=16) stays visually close on smooth data
        smooth = np.tile(
            np.linspace(40, 200, 32, dtype=np.uint8)[None, :, None], (16, 1, 3)
        )
        out16 = decode_jpeg(jpeg_from_array(smooth, quant=16))
        assert np.abs(out16.astype(int) - smooth.astype(int)).mean() < 8

    def test_rejects_corrupt_and_unsupported(self):
        from probabilistic_rs_spark.datagen import jpeg_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        good = jpeg_for_id(4)
        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg(b"\x89PNG....")
        with pytest.raises(ValueError, match="truncated|no scan"):
            decode_jpeg(good[:20])
        # progressive frame marker is rejected honestly
        prog = bytearray(good)
        sof = prog.find(b"\xff\xc0")
        prog[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(bytes(prog))
        # zero sampling factor is rejected
        sub = bytearray(good)
        sub[sof + 11] = 0x20  # component 1 H/V: V = 0
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg(bytes(sub))

    def test_chroma_subsampled_roundtrip(self):
        """4:2:0 / 4:2:2 — the interleaved-MCU geometry, per-component
        block rasters, and chroma upsampling against an independent
        box-filtering encoder."""
        from probabilistic_rs_spark.datagen import jpeg_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        # smooth gradients (no wrap discontinuities — those legitimately
        # smear under chroma subsampling): the round trip stays tight
        yy, xx = np.mgrid[0:37, 0:45]
        img = np.stack(
            [40 + 4 * xx, 60 + 3 * yy, 80 + 2 * (xx + yy)], axis=2
        ).astype(np.uint8)
        for mode in ("4:2:0", "4:2:2"):
            out = decode_jpeg(jpeg_from_array(img, subsampling=mode))
            assert out.shape == img.shape
            err = np.abs(out.astype(int) - img.astype(int))
            assert err.mean() < 6.0 and err.max() <= 24, (mode, err.max())
        # solid color survives subsampling exactly at quant=1
        solid = np.tile(np.array([90, 140, 60], np.uint8), (21, 19, 1))
        out = decode_jpeg(jpeg_from_array(solid, subsampling="4:2:0"))
        assert np.abs(out.astype(int) - solid.astype(int)).max() <= 1

    def test_featurize_dispatches_gif_and_jpeg(self):
        from probabilistic_rs_spark.datagen import gif_for_id, jpeg_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            _image_decode_featurize,
        )

        import pandas as pd

        out = _image_decode_featurize(
            pd.Series([gif_for_id(6), jpeg_for_id(7)])
        )
        assert out[0, 0] == 4 + 6 % 13 and out[0, 1] == 3 + 6 % 7
        assert out[1, 0] == 4 + 7 % 13 and out[1, 1] == 3 + 7 % 7


class TestCodecRobustness:
    """Deterministic corruption sweep over all four real codecs: any
    truncation or single-byte flip must either raise ValueError (clean
    rejection) or decode to a valid (h, w, 3) uint8 array (flips in
    pixel payloads legitimately decode to different pixels) — never an
    unbounded allocation, hang, or foreign exception type."""

    @staticmethod
    def _assault(decode, good: bytes):
        # truncations at a spread of cut points
        for cut in range(0, len(good), max(1, len(good) // 23)):
            try:
                out = decode(good[:cut])
                assert out.ndim == 3 and out.shape[2] == 3
            except ValueError:
                pass
        # single-byte flips at a spread of positions, incl. header bytes
        for pos in list(range(min(64, len(good)))) + list(
            range(0, len(good), max(1, len(good) // 41))
        ):
            bad = bytearray(good)
            bad[pos] ^= 0x5A
            try:
                out = decode(bytes(bad))
                assert out.ndim == 3 and out.shape[2] == 3
            except ValueError:
                pass

    def test_all_codecs_reject_or_decode_cleanly(self):
        from probabilistic_rs_spark.datagen import (
            bmp_for_id,
            gif_for_id,
            jpeg_for_id,
            png_for_id,
        )
        from probabilistic_rs_spark.operators.multimodal import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
        )

        self._assault(decode_bmp, bmp_for_id(37))
        self._assault(decode_png, png_for_id(37))
        self._assault(decode_gif, gif_for_id(37))
        self._assault(decode_jpeg, jpeg_for_id(37))

    def test_jpeg_dims_bomb_rejected(self):
        from probabilistic_rs_spark.datagen import jpeg_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_jpeg

        good = bytearray(jpeg_for_id(4))
        sof = good.find(b"\xff\xc0")
        good[sof + 5 : sof + 9] = (65535).to_bytes(2, "big") * 2  # h=w=65535
        with pytest.raises(ValueError, match="implausible"):
            decode_jpeg(bytes(good))


class TestWAV:
    """Round 6b: PCM RIFF/WAVE — audio is now a real decode path (raw
    PCM needs no codec); only compressed audio/video remain at the
    ffmpeg hook."""

    def test_roundtrip_mono_and_stereo(self):
        from probabilistic_rs_spark.datagen import wav_from_array
        from probabilistic_rs_spark.operators.multimodal import decode_wav

        rng = np.random.default_rng(16)
        mono = rng.integers(-32768, 32768, 500, dtype=np.int16)
        rate, out = decode_wav(wav_from_array(mono, rate=16000))
        assert rate == 16000 and out.shape == (500, 1)
        np.testing.assert_array_equal(
            (out[:, 0] * 32768).astype(np.int16), mono
        )
        stereo = rng.integers(-32768, 32768, (300, 2), dtype=np.int16)
        rate, out = decode_wav(wav_from_array(stereo, rate=44100))
        assert rate == 44100 and out.shape == (300, 2)
        np.testing.assert_array_equal((out * 32768).astype(np.int16), stereo)

    def test_id_fixture_features_are_arithmetic(self):
        from probabilistic_rs_spark.datagen import wav_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            audio_features,
            decode_wav,
        )

        for did in (0, 1, 7, 99, 100, 9999):
            f = audio_features(*decode_wav(wav_for_id(did)))
            n = 64 + did % 191
            amp = 256 * (1 + did % 100) / 32768.0
            assert f[0] == 8000.0 and f[1] == n and f[2] == 1.0
            np.testing.assert_allclose(f[3], n / 8000.0, rtol=1e-6)
            np.testing.assert_allclose(f[5], amp, rtol=1e-6)  # rms of ±amp
            np.testing.assert_allclose(f[6], amp, rtol=1e-6)  # peak
            np.testing.assert_allclose(f[7], -amp, rtol=1e-6)
            np.testing.assert_allclose(f[8], amp, rtol=1e-6)

    def test_rejects_compressed_and_corrupt(self):
        from probabilistic_rs_spark.datagen import wav_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_wav

        good = bytearray(wav_for_id(4))
        with pytest.raises(ValueError, match="not a RIFF"):
            decode_wav(b"FFIR" + bytes(good[4:]))
        fmt_off = bytes(good).find(b"fmt ") + 8
        comp = bytearray(good)
        comp[fmt_off] = 85  # format tag 85 = MP3
        with pytest.raises(ValueError, match="compressed WAV"):
            decode_wav(bytes(comp))
        with pytest.raises(ValueError, match="truncated|missing"):
            decode_wav(bytes(good[:40]))

    def test_media_decoder_dispatches_audio_and_images(self):
        import pandas as pd

        from probabilistic_rs_spark.datagen import gif_for_id, wav_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            _media_decode_featurize,
        )

        out = _media_decode_featurize(
            pd.Series([wav_for_id(3), gif_for_id(6), None])
        )
        assert out[0, 0] == 8000.0 and out[0, 2] == 1.0
        assert out[1, 0] == 4 + 6 % 13
        assert (out[2] == 0).all()
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            _media_decode_featurize(pd.Series([b"RIFF\x00\x00\x00\x00RMID"]))


class TestAVI:
    """Round 6b: MJPEG-in-AVI video — the RIFF walk + per-frame baseline
    JPEG decode + frame sampling. All three modalities now have a real
    dependency-free decode path; only modern compressed codecs remain
    at the ffmpeg hook."""

    def test_roundtrip_timing_and_exact_frames(self):
        from probabilistic_rs_spark.datagen import avi_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            decode_avi_mjpeg,
            video_features,
        )

        for did in (0, 1, 7, 91, 255):
            fps, total, frames = decode_avi_mjpeg(avi_for_id(did))
            w, h = 4 + did % 13, 3 + did % 7
            assert (fps, total, len(frames)) == (10.0, 8, 8)
            for f, fr in enumerate(frames):
                assert fr.shape == (h, w, 3)
                assert (fr == (29 * did + 16 * f) % 256).all()
            v = video_features(fps, total, frames)
            assert v[0] == w and v[1] == h and v[2] == 8
            assert v[3] == 10.0 and v[5] == 8
            np.testing.assert_allclose(v[4], 0.8, rtol=1e-6)  # 8 / 10 fps

    def test_frame_sampling(self):
        from probabilistic_rs_spark.datagen import avi_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_avi_mjpeg

        _, total, all_frames = decode_avi_mjpeg(avi_for_id(5))
        _, total2, sampled = decode_avi_mjpeg(avi_for_id(5), sample_every=3)
        assert total2 == total == 8
        assert len(sampled) == 3  # frames 0, 3, 6
        assert (sampled[1] == all_frames[3]).all()
        _, _, capped = decode_avi_mjpeg(avi_for_id(5), max_frames=2)
        assert len(capped) == 2

    def test_rejects_non_mjpeg_and_corrupt(self):
        from probabilistic_rs_spark.datagen import avi_for_id
        from probabilistic_rs_spark.operators.multimodal import decode_avi_mjpeg

        good = avi_for_id(3)
        bad = bytearray(good)
        off = bytes(bad).find(b"00dc") + 8
        bad[off : off + 3] = b"\x00\x00\x00"
        with pytest.raises(ValueError, match="non-MJPEG"):
            decode_avi_mjpeg(bytes(bad))
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            decode_avi_mjpeg(good[:8] + b"WAVE" + good[12:])
        with pytest.raises(ValueError, match="no video frames"):
            decode_avi_mjpeg(b"RIFF" + (4).to_bytes(4, "little") + b"AVI ")

    def test_media_featurizer_dispatches_video(self):
        import pandas as pd

        from probabilistic_rs_spark.datagen import avi_for_id, wav_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            _media_decode_featurize,
        )

        out = _media_decode_featurize(pd.Series([avi_for_id(6), wav_for_id(6)]))
        assert out[0, 0] == 4 + 6 % 13 and out[0, 3] == 10.0  # video geometry
        assert out[1, 0] == 8000.0  # audio rate

    def test_corruption_sweep_wav_and_avi(self):
        from probabilistic_rs_spark.datagen import avi_for_id, wav_for_id
        from probabilistic_rs_spark.operators.multimodal import (
            decode_avi_mjpeg,
            decode_wav,
        )

        def assault(decode, good, ok_types):
            for cut in range(0, len(good), max(1, len(good) // 19)):
                try:
                    decode(good[:cut])
                except ok_types:
                    pass
            for pos2 in list(range(min(72, len(good)))) + list(
                range(0, len(good), max(1, len(good) // 31))
            ):
                bad = bytearray(good)
                bad[pos2] ^= 0x5A
                try:
                    decode(bytes(bad))
                except ok_types:
                    pass

        assault(decode_wav, wav_for_id(37), (ValueError,))
        assault(
            decode_avi_mjpeg, avi_for_id(37), (ValueError, NotImplementedError)
        )


class TestPNGGrayscale:
    """Round 6b: PNG color types 0 (grayscale) and 4 (gray+alpha)."""

    @staticmethod
    def _encode_gray(img2d: np.ndarray, alpha: bool) -> bytes:
        import zlib

        from probabilistic_rs_spark.datagen import _png_chunk

        h, w = img2d.shape
        bpp = 2 if alpha else 1
        lines = bytearray()
        for r in range(h):
            lines.append(0)  # filter None
            for v in img2d[r]:
                lines.append(int(v))
                if alpha:
                    lines.append(0xFF)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes((8, 4 if alpha else 0, 0, 0, 0))
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 9))
            + _png_chunk(b"IEND", b"")
        )

    def test_gray_and_gray_alpha_roundtrip(self):
        from probabilistic_rs_spark.operators.multimodal import decode_png

        rng = np.random.default_rng(17)
        g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        for alpha in (False, True):
            out = decode_png(self._encode_gray(g, alpha))
            assert out.shape == (9, 13, 3)
            assert (out[:, :, 0] == g).all()
            assert (out == out[:, :, :1]).all()  # replicated channels

    def test_palette_type_requires_plte(self):
        """Round 7 turned color type 3 into a SUPPORTED path; a type-3
        stream without its PLTE chunk still fails loudly, and the same
        pixels with a PLTE decode through the lookup."""
        import zlib

        from probabilistic_rs_spark.datagen import _png_chunk
        from probabilistic_rs_spark.operators.multimodal import decode_png

        ihdr = (1).to_bytes(4, "big") * 2 + bytes((8, 3, 0, 0, 0))  # type 3
        no_plte = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="missing its PLTE"):
            decode_png(no_plte)
        with_plte = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", bytes((9, 8, 7)))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + _png_chunk(b"IEND", b"")
        )
        assert (decode_png(with_plte) == np.array([[[9, 8, 7]]])).all()

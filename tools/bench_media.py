#!/usr/bin/env python
"""Price the pure-Python media decode path (VERDICT r6 #4): decode +
featurize throughput per codec — images (or clips/waves) per second and
payload MB/s — at the fixture sizes the oracle queries decode, plus a
larger frame so the per-pixel cost is visible.

These are the HONEST sandbox numbers for the stdlib-only decoders
(``operators/multimodal.py``); a production deployment swaps a C codec
(ffmpeg/libvips) into the same ``decoder=`` hook and keeps the Spark
plumbing (schema, mapInPandas batching, partitioning) unchanged. Single
process, single thread — multiply by executor cores for cluster
throughput; the featurizer is embarrassingly parallel across rows.

Usage: python tools/bench_media.py    (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _bench(name: str, payloads: list[bytes], decode, reps: int = 3) -> dict:
    import statistics

    n = len(payloads)
    total_bytes = sum(len(p) for p in payloads)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in payloads:
            decode(p)
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {
        "codec": name,
        "n_payloads": n,
        "payload_bytes": total_bytes,
        "items_per_sec": round(n / best, 1),
        "mb_per_sec": round(total_bytes / best / 1e6, 3),
        "median_s": round(statistics.median(times), 4),
    }


def main() -> None:
    from probabilistic_rs_spark import datagen as dg
    from probabilistic_rs_spark.operators import multimodal as mm

    N = 400
    ids = list(range(N))
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)

    rows = [
        # fixture-size payloads (the oracle rotation's 4-16 x 3-9 px)
        _bench("bmp_fixture", [dg.bmp_for_id(i) for i in ids], mm.decode_bmp),
        _bench(
            "png_fixture", [dg.png_for_id(i) for i in ids], mm.decode_png
        ),
        _bench(
            "png_palette_fixture",
            [dg.png_palette_solid(4 + i % 13, 3 + i % 7, (i % 256, 0, 9), i % 5)
             for i in ids],
            mm.decode_png,
        ),
        _bench("gif_fixture", [dg.gif_for_id(i) for i in ids], mm.decode_gif),
        _bench(
            "jpeg_fixture", [dg.jpeg_for_id(i) for i in ids], mm.decode_jpeg
        ),
        _bench("wav_fixture", [dg.wav_for_id(i) for i in ids], mm.decode_wav),
        _bench(
            "avi_mjpeg_fixture",
            [dg.avi_for_id(i) for i in range(60)],
            mm.decode_avi_mjpeg,
        ),
        # 128x128 frames — the per-pixel cost of each compressed codec
        _bench(
            "png_128px",
            [dg.png_solid(128, 128, (i % 256, 0, 0)) for i in range(40)],
            mm.decode_png,
        ),
        _bench(
            "gif_128px",
            [dg.gif_from_array(np.full((128, 128, 3), i % 256, np.uint8))
             for i in range(40)],
            mm.decode_gif,
        ),
        _bench(
            "jpeg_128px_noise",
            [dg.jpeg_from_array(big, quant=8) for _ in range(10)],
            mm.decode_jpeg,
        ),
    ]
    print(json.dumps({"metric": "media_decode_throughput", "rows": rows}))


if __name__ == "__main__":
    main()

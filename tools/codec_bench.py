#!/usr/bin/env python
"""Reproduce the SCALING.md codec decode-throughput table: native
decode wall time vs image size on max-entropy noise (the worst case
for entropy coding) plus the real-file fixtures when present.

Usage: python tools/codec_bench.py  → one JSON document on stdout.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kenshin_spark.multimodal import codecs, webp  # noqa: E402


def _t(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    rng = np.random.default_rng(2)
    report: dict = {"noise_ms": {}}
    for side in (64, 128, 256):
        arr = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        report["noise_ms"][f"{side}x{side}"] = {
            "jpeg_baseline": _t(codecs.decode_image, codecs.encode_jpeg(arr)),
            "jpeg_progressive": _t(
                codecs.decode_image, codecs.encode_jpeg_progressive(arr)
            ),
            "vp8l": _t(codecs.decode_image, webp.encode_webp_lossless(arr)),
            "bmp": _t(codecs.decode_image, codecs.encode_bmp(arr)),
        }
    real = {}
    for label, pat in (
        ("baseline_720x477",
         "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/verify.jpeg"),
        ("progressive_720x477",
         "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/f3.jpg"),
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            payload = open(hits[0], "rb").read()
            real[label] = _t(codecs.decode_image, payload)
    if real:
        report["real_files_ms"] = real
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

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
    if real and "--jvm" in sys.argv:
        report["bulk_resize_ms"] = _bulk_resize_bench()
    print(json.dumps(report, indent=1))


def _bulk_resize_bench(copies: int = 64) -> dict:
    """The production bulk-decode comparison (VERDICT r9 next-round #4):
    ``resize_images`` over N copies of the real photos, native codecs vs
    the ``decoder="jvm"`` javax.imageio path (spill included, so the
    JVM number carries its real overhead). Run with ``--jvm``."""
    import tempfile

    from kenshin_spark.multimodal.transforms import resize_images
    from kenshin_spark.session import get_spark

    spark = get_spark("codec-bench", cpus=8)
    payloads = []
    for pat in (
        "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/verify.jpeg",
        "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/f3.jpg",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            payloads.append(open(hits[0], "rb").read())
    rows = [
        (k, bytearray(payloads[k % len(payloads)]))
        for k in range(copies)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary"
    ).repartition(8).cache()
    df.count()
    out = {}
    for label, kwargs in (
        ("native", {}),
        ("jvm", {"decoder": "jvm", "scratch_dir": tempfile.mkdtemp()}),
    ):
        t0 = time.perf_counter()
        n = resize_images(df, 224, 224, **kwargs).count()
        wall = time.perf_counter() - t0
        out[label] = {
            "images": n,
            "wall_ms": round(wall * 1000, 1),
            "images_per_s": round(n / wall, 1),
        }
    out["jvm_speedup"] = round(
        out["native"]["wall_ms"] / out["jvm"]["wall_ms"], 1
    )
    return out


if __name__ == "__main__":
    main()

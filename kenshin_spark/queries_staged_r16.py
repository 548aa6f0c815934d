"""Overflow bank — ROUND 16: six rows. ``q_ship_latency_bands`` was
deferred from the round-9 bank so round 9's 50-slot driver window could
seat the re-verification of ``q_zero_discount_share`` (the one
never-green registry row, red on the r8 HUGEINT oracle-typing bug fixed
in that round's ``oracle_types`` sweep) alongside 49 new rows; the
round-9 continuation session added five driver rows for the native
codec + hybrid-CC work (VP8L dims, progressive-JPEG dims, the WebP
resize pixel-sum loop, the animated frame timeline, and the hybrid CC
escalation graph).

Same staging mechanism and gate as the earlier banks
(``tests/test_queries_staged_r16.py``). Promote with
``python tools/promote_staged.py queries_staged_r16`` once round 15's
window clears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kenshin_spark.io import load_table
from kenshin_spark.queries import QuerySpec

STAGED_R16: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        STAGED_R16[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


@stage(
    "q_ship_latency_bands",
    """
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
           CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                  THEN '0-30'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 60
                  THEN '31-60'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90
                  THEN '61-90'
                ELSE '90+' END AS band,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
    """,
    "order-to-ship latency bands per order month: the lineitem-orders "
    "key join (co-partitioned on orderkey — the classic TPC-H join "
    "Catalyst plans as one shuffle pair) with integer day arithmetic "
    "banded into fulfilment SLas",
)
def q_q_ship_latency_bands(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lat = F.datediff("l_shipdate", "o_orderdate")
    band = (
        F.when(lat <= 30, "0-30")
        .when(lat <= 60, "31-60")
        .when(lat <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        j.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            band.alias("band"),
        )
        .groupBy("month", "band")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------------------
# r9-continuation surface: lossless-WebP / progressive-JPEG codecs,
# animated-frame sampling, and the hybrid CC escalation — each new
# engine component gets a driver-oracled row (topping this overflow
# bank up from 1 to 6; the window still fits with room to spare).
# --------------------------------------------------------------------------


# shared with the r10 bank (one definition; r10 never imports r16, so
# no bank-import cycle — the hazard the bloom_oracle split fixed)
from kenshin_spark.queries_staged_r10 import _doc_ids  # noqa: E402


def _rgb_gradient(doc_id: int, h: int, w: int):
    import numpy as np

    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    c = np.arange(3)[None, None, :]
    return ((doc_id + 31 * y + 17 * x + 5 * c) % 256).astype(np.uint8)


@stage(
    "mm_webp_container_dims",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(5 + doc_id % 12 AS BIGINT) AS width,
           CAST(4 + (doc_id * 3) % 9 AS BIGINT) AS height,
           'webp' AS format
    FROM documents WHERE doc_id % 50 = 0
    """,
    "the lossless-WebP write/read loop as a driver row: per-doc RGB "
    "gradients encoded to REAL VP8L containers by the engine's "
    "encode_webp_lossless (canonical-Huffman bitstream, color cache on "
    "odd docs), then image_metadata parses the 14-bit VP8L dims "
    "natively — no PIL anywhere in the path (multimodal/webp.py)",
)
def q_mm_webp_container_dims(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal import image_metadata

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 5 + did % 12, 4 + (did * 3) % 9
                payload = webp.encode_webp_lossless(
                    _rgb_gradient(did, h, w), use_cache=4 * (did % 2)
                )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return image_metadata(payloads).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
    )


@stage(
    "mm_progressive_jpeg_dims",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(8 + doc_id % 24 AS BIGINT) AS width,
           CAST(8 + (doc_id * 7) % 16 AS BIGINT) AS height,
           'jpeg' AS format
    FROM documents WHERE doc_id % 50 = 0
    """,
    "progressive JPEG (SOF2) as a driver row: per-doc gradients "
    "encoded with encode_jpeg_progressive (spectral selection + "
    "successive approximation at doc-varying levels), then "
    "image_metadata reads the SOF2 frame header natively "
    "(multimodal/codecs.py T.81 Annex G path)",
)
def q_mm_progressive_jpeg_dims(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal import image_metadata

    def kern(batches):
        from kenshin_spark.multimodal import codecs

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 24, 8 + (did * 7) % 16
                payload = codecs.encode_jpeg_progressive(
                    _rgb_gradient(did, h, w), levels=did % 3
                )
                rows.append((did, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return image_metadata(payloads).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
    )


@stage(
    "mm_webp_resize_pixel_sum",
    """
    WITH ijc AS (
      SELECT a.i, b.j, c.c
      FROM (SELECT unnest(generate_series(0, 7)) AS i) a
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) b
      CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
    )
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(sum((d.doc_id + 62 * ijc.i + 34 * ijc.j + 5 * ijc.c) % 256)
                AS BIGINT) AS pixel_sum
    FROM (SELECT doc_id FROM documents WHERE doc_id % 50 = 0) d
    CROSS JOIN ijc
    GROUP BY d.doc_id
    """,
    "the WebP resize loop down to PIXEL VALUES: 16x16 engine-built "
    "VP8L gradients through resize_images(out_format='webp') "
    "(nearest-neighbor -> 8x8 VP8L re-encode), decoded back and the "
    "RGB channels summed — nearest-neighbor is exact index math "
    "(ys = 2i, xs = 2j), so the oracle replays the selected pixels "
    "with integer arithmetic alone",
)
def q_mm_webp_resize_pixel_sum(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.transforms import resize_images

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rows.append(
                    (did, webp.encode_webp_lossless(_rgb_gradient(did, 16, 16)))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    resized = resize_images(payloads, width=8, height=8, out_format="webp")

    def sum_kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["resized"]):
                arr = webp.decode_webp(bytes(payload))
                rows.append((int(did), int(arr[:, :, :3].sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "pixel_sum"])

    return resized.select("doc_id", "resized").mapInPandas(
        sum_kern, "doc_id long, pixel_sum long"
    )


@stage(
    "mm_anim_frame_timeline",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST((2 + doc_id % 3) * (1 + doc_id % 2) AS BIGINT) AS n_sampled,
           CAST(((2 + doc_id % 3) * (1 + doc_id % 2) - 1) * 100 AS BIGINT)
             AS max_ts_ms
    FROM documents WHERE doc_id % 50 = 0
    """,
    "animated-WebP frame sampling as a driver row: per-doc VP8X+ANMF "
    "animations (2-4 frames, 100/200 ms durations) built by "
    "encode_webp_animation, sampled by transforms.sample_frames at "
    "100 ms ticks over the REAL container timeline (webp_frames + "
    "native VP8L frame decode); the oracle replays the timeline "
    "arithmetic: n_sampled = total_ms / 100 = n_frames * dur_units",
)
def q_mm_anim_frame_timeline(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.transforms import sample_frames

    def kern(batches):
        from kenshin_spark.multimodal import webp

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 2 + did % 3
                dur = 100 * (1 + did % 2)
                frames = [
                    (_rgb_gradient(did + 7 * k, 4, 4), dur) for k in range(n)
                ]
                rows.append((did, webp.encode_webp_animation(frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    return (
        sample_frames(payloads, every_ms=100, max_frames=8)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.max("frame_ts_ms").alias("max_ts_ms"),
        )
    )


@stage(
    "dedup_clusters_hybrid_escalation",
    """
    SELECT CAST(doc_id AS BIGINT) AS node,
           CAST((SELECT min(doc_id) FROM documents
                 WHERE doc_id % 10 = 0 AND doc_id < 320)
                AS BIGINT) AS cluster_id
    FROM documents WHERE doc_id % 10 = 0 AND doc_id < 320
    UNION ALL
    SELECT CAST(10000000 + d.doc_id * 10 + u.k AS BIGINT) AS node,
           CAST(10000000 + d.doc_id * 10 AS BIGINT) AS cluster_id
    FROM (SELECT doc_id FROM documents WHERE doc_id % 70 = 0) d,
         unnest(generate_series(0, 3)) AS u(k)
    """,
    "the r9 hybrid CC escalation as a driver row: a mixed graph (a "
    "32-node chain — fixed size, so the adversarial diameter is "
    "SF-independent — plus 4-cliques on "
    "synthetic ids per 70th doc, scaling with the data) forced down "
    "the label path with patience=2 — label converges the cliques, "
    "the chain defeats it, escalation contracts to the quotient and "
    "solves it under the driver gate (dedup/cluster.py), and the composed "
    "labelling must equal the component minima the oracle derives "
    "from the construction (chain -> min chain id, clique -> its "
    "block min)",
)
def q_dedup_clusters_hybrid_escalation(spark, sf_dir):
    from pyspark.sql import Window

    from kenshin_spark.dedup.cluster import connected_components

    chain_nodes = _doc_ids(spark, sf_dir, modulo=10).where(
        F.col("doc_id") < 320
    )
    w = Window.orderBy("doc_id")
    chain = (
        chain_nodes.select(
            F.col("doc_id").alias("doc_a"),
            F.lead("doc_id").over(w).alias("doc_b"),
        )
        .where(F.col("doc_b").isNotNull())
    )
    clique_base = _doc_ids(spark, sf_dir, modulo=70).select(
        (F.lit(10_000_000) + F.col("doc_id") * 10).alias("base")
    )
    ks = spark.range(4).select(F.col("id").alias("k"))
    members = clique_base.crossJoin(ks).select(
        "base", (F.col("base") + F.col("k")).alias("node")
    )
    cliques = (
        members.alias("x")
        .join(members.alias("y"), "base")
        .where(F.col("x.node") < F.col("y.node"))
        .select(
            F.col("x.node").alias("doc_a"), F.col("y.node").alias("doc_b")
        )
    )
    pairs = chain.unionByName(cliques)
    return connected_components(
        pairs, algorithm="label", max_iter=50, patience=2
    ).select(
        F.col("node").cast("long").alias("node"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


@stage(
    "mm_phash_real_pixels",
    """
    WITH ids AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
    cells AS (SELECT unnest(generate_series(0, 63)) AS i),
    g AS (
      SELECT ids.doc_id, cells.i,
             ('0x' || substr(md5('apx|' || CAST(ids.doc_id AS VARCHAR)
                || '|' || CAST(cells.i AS VARCHAR)), 1, 2))::BIGINT AS b
      FROM ids CROSS JOIN cells
    ),
    gp AS (
      SELECT doc_id, i, b,
             CASE WHEN i IN (5, 17, 42) THEN (b + 37) % 256 ELSE b END AS p
      FROM g
    ),
    tot AS (SELECT doc_id, sum(b) AS tb, sum(p) AS tp
            FROM gp GROUP BY doc_id),
    h AS (
      SELECT gp.doc_id,
             sum(CASE WHEN (gp.b * 64 >= t.tb) <> (gp.p * 64 >= t.tp)
                 THEN 1 ELSE 0 END) AS hh
      FROM gp JOIN tot t ON gp.doc_id = t.doc_id
      GROUP BY gp.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(3 + CASE WHEN hh <= 6 THEN 3 ELSE 0 END AS BIGINT)
             AS n_pairs,
           CAST(3 + CASE WHEN hh = 0 THEN 3 ELSE 0 END AS BIGINT) AS n_h0,
           CAST(CASE WHEN hh <= 6 THEN hh ELSE 0 END AS BIGINT) AS pert_h
    FROM h
    """,
    "REAL pixels through perceptual-hash dedup (VERDICT r9 next-round "
    "#3): per doc, one md5-derived 8x8 grid rendered as a 64x64 block-"
    "constant image and engine-ENCODED into three lossless containers "
    "(BMP, VP8L WebP, RGB PNG) plus a BMP whose cells 5/17/42 are "
    "perturbed (+37 mod 256); real_pixels decodes each container "
    "natively and area-means back to the grid (multimodal/phash.py), "
    "and phash_neardup_pairs must find every re-encoded variant pair "
    "at hamming 0 — the thing the md5 stand-in can never do — plus the "
    "perturbed variant iff its aHash is within 6 bits. The oracle "
    "replays grid, threshold, and hamming in pure SQL (integer luma of "
    "an equal-RGB image is the identity; block area-mean of a block-"
    "constant image is exact)",
)
def q_mm_phash_real_pixels(spark, sf_dir):
    import pandas as pd

    from kenshin_spark.multimodal.phash import phash_neardup_pairs, real_pixels

    def kern(batches):
        import hashlib
        import struct
        import zlib

        import numpy as np

        from kenshin_spark.multimodal import codecs, webp

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        def png_rgb(img):
            h, w, _ = img.shape
            raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
            )

        def block_image(grid):
            g = np.asarray(grid, dtype=np.uint8).reshape(8, 8)
            img = np.kron(g, np.ones((8, 8), dtype=np.uint8))
            return np.repeat(img[:, :, None], 3, axis=2)

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                grid = [
                    int(hashlib.md5(f"apx|{did}|{i}".encode())
                        .hexdigest()[:2], 16)
                    for i in range(64)
                ]
                pert = [
                    (v + 37) % 256 if i in (5, 17, 42) else v
                    for i, v in enumerate(grid)
                ]
                base = block_image(grid)
                rows += [
                    (did * 10 + 0, bytearray(codecs.encode_bmp(base))),
                    (did * 10 + 1,
                     bytearray(webp.encode_webp_lossless(base))),
                    (did * 10 + 2, bytearray(png_rgb(base))),
                    (did * 10 + 3,
                     bytearray(codecs.encode_bmp(block_image(pert)))),
                ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    images = _doc_ids(spark, sf_dir).mapInPandas(
        kern, "doc_id long, payload binary"
    )
    pairs = phash_neardup_pairs(real_pixels(images), max_hamming=6)
    return (
        pairs.groupBy(F.floor(F.col("doc_a") / 10).alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((F.col("hamming") == 0).cast("long")).alias("n_h0"),
            F.max("hamming").alias("pert_h"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_h0").cast("long").alias("n_h0"),
            F.col("pert_h").cast("long").alias("pert_h"),
        )
    )


@stage(
    "store_manifest_snapshot_lifecycle",
    None,  # placeholder — real oracle set below (needs the r8 fragment)
)
def q_store_manifest_snapshot_lifecycle(spark, sf_dir):
    import os
    import time

    from kenshin_spark.queries_staged_r8_engine import (
        _BANK,
        _week_slots,
        _workdir,
        DAY1_END,
    )
    from kenshin_spark.store import ParquetTieredStore

    st = ParquetTieredStore(
        spark,
        _BANK,
        os.path.join(
            _workdir(sf_dir, "store_manifest_snapshot_lifecycle"), "store"
        ),
        mode="mor",
        commit_protocol="manifest",
    )
    slots = _week_slots(spark, sf_dir).localCheckpoint(eager=True)
    st.upsert(0, slots.where(F.col("ts") % 120 == 0))
    st.upsert(0, slots.where(F.col("ts") % 120 == 60))
    # fold the first two day partitions' append logs (logical replace —
    # the superseded files stay on disk until vacuum)
    st.compact(0, days=st._live_days(0)[:2])
    # logical expiry of day 0 (Jan 1): one manifest transaction, no
    # physical delete; then vacuum reclaims every retired file
    st.expire(now=DAY1_END + 90 * 86400)
    st.vacuum(grace_s=0.0, now=time.time() + 60)
    return st.read(0)


def _set_manifest_oracle():
    from kenshin_spark.queries_staged_r8_engine import _W, DAY1_END

    spec = STAGED_R16["store_manifest_snapshot_lifecycle"]
    STAGED_R16["store_manifest_snapshot_lifecycle"] = QuerySpec(
        fn=spec.fn,
        oracle=(
            f"WITH {_W} SELECT metric, ts, value FROM t0 "
            f"WHERE ts >= {DAY1_END}"
        ),
        doc=(
            "the manifest-log commit backend's full lifecycle as a "
            "driver row (VERDICT r9 next-round #2): mor upserts in two "
            "stamped appends, a two-day log fold committed as one "
            "manifest transaction, LOGICAL retention expiry of day 0 "
            "(a manifest drop — files persist for readers mid-scan), "
            "then vacuum physically reclaims every retired file; the "
            "read back — planned from the committed file list, never a "
            "directory listing — must equal the week's LWW grid minus "
            "the expired day (kenshin_spark/commit.py "
            "ManifestCommitProtocol, store.py manifest branches)"
        ),
    )


_set_manifest_oracle()

"""Minimal VP8 keyframe bitstream WRITER (test vector generator).

Builds spec-valid keyframes with chosen per-MB intra modes and no
residuals (all-skip), so each predictor / parse path can be exercised
in isolation: libwebp decodes the handmade stream as the ground truth
and the native decoder must match bit-exact. RFC 6386 §7.2 bool
encoder, §9 uncompressed + header layout."""

import numpy as np

KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-0, 2, -1, 4, -2, -3)
UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9,
)


class BoolEnc:
    """RFC 6386 §7.2 arithmetic encoder."""

    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.buf = bytearray()

    def _carry(self):
        i = len(self.buf) - 1
        while i >= 0 and self.buf[i] == 255:
            self.buf[i] = 0
            i -= 1
        if i >= 0:
            self.buf[i] += 1

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.buf.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def tree(self, tree, probs, leaf):
        path = self._find(tree, 0, leaf)
        for node, bit in path:
            self.put(bit, probs[node >> 1])

    def _find(self, tree, i, leaf, path=()):
        for b in (0, 1):
            nxt = tree[i + b]
            if nxt == -leaf and nxt <= 0:
                return path + ((i, b),)
            if nxt > 0:
                r = self._find(tree, nxt, leaf, path + ((i, b),))
                if r is not None:
                    return r
        return None

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.buf.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.buf)


def write_keyframe(w, h, mbs, q_index=40, filter_level=0,
                   sharpness=0, filter_type=0):
    """``mbs``: list (raster order, mb_w*mb_h entries) of dicts
    {ymode: 0-3 or 4 (B_PRED), bmodes: [16] when B_PRED, uvmode: 0-3}.
    All MBs are skipped (no residuals) and an empty token partition is
    appended. Returns the raw VP8 frame (chunk body)."""
    from kenshin_spark.multimodal.vp8_tables import COEFF_UPDATE_PROBS

    mb_w = (w + 15) >> 4
    mb_h = (h + 15) >> 4
    assert len(mbs) == mb_w * mb_h
    e = BoolEnc()
    e.put(0, 128)  # color space
    e.put(0, 128)  # clamping
    e.put(0, 128)  # segmentation disabled
    e.put(filter_type & 1, 128)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.put(0, 128)  # lf delta disabled
    e.literal(0, 2)  # one token partition
    e.literal(q_index, 7)
    for _ in range(5):
        e.put(0, 128)  # no quantizer deltas
    e.put(1, 128)  # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    e.put(0, COEFF_UPDATE_PROBS[t][b][c][p])
    e.put(1, 128)  # mb_no_skip_coeff present
    prob_skip = 200
    e.literal(prob_skip, 8)

    above = [[0] * 4 for _ in range(mb_w)]
    for mb_y in range(mb_h):
        left = [0] * 4
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            e.put(1, prob_skip)  # skip = 1
            e.tree(KF_YMODE_TREE, KF_YMODE_PROBS, mb["ymode"])
            if mb["ymode"] == 4:
                bm = mb["bmodes"]
                from kenshin_spark.multimodal.vp8_tables import (
                    KF_BMODE_PROBS,
                )
                for sy in range(4):
                    for sx in range(4):
                        a = above[mb_x][sx] if sy == 0 else bm[(sy - 1) * 4 + sx]
                        lf = left[sy] if sx == 0 else bm[sy * 4 + sx - 1]
                        e.tree(BMODE_TREE, KF_BMODE_PROBS[a][lf],
                               bm[sy * 4 + sx])
            else:
                bm = [(0, 2, 3, 1)[mb["ymode"]]] * 16
            above[mb_x] = bm[12:16]
            left = [bm[3], bm[7], bm[11], bm[15]]
            e.tree(UV_MODE_TREE, UV_MODE_PROBS, mb["uvmode"])
    part0 = e.flush()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([w & 0xFF, (w >> 8) & 0x3F])
    head += bytes([h & 0xFF, (h >> 8) & 0x3F])
    return head + part0 + b"\x00\x00"  # empty token partition


def wrap_webp(frame: bytes) -> bytes:
    """RIFF container around a raw VP8 frame."""
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk

#!/usr/bin/env python
"""Generate ``kenshin_spark/multimodal/vp8_tables.py`` — the RFC 6386
constant tables (quantizer lookups, coefficient bands, default/update
token probabilities, keyframe b-mode probabilities).

These are PUBLIC spec constants (RFC 6386 §13.4, §13.5, §14.1); rather
than transcribing ~3,000 numbers by hand (one typo = silent corruption),
this script locates them inside the system libwebp shared object by
signature match and emits them as Python data. Re-run against any
libwebp build; the signatures are the tables' well-known first rows.

Layout found in libwebp.so.7.1.5 (contiguous .rodata):
  kAcTable  uint16[128]   — ac_qlookup
  kDcTable  uint8[128]    — dc_qlookup
  kBands    uint8[16+1]   — coefficient band map
  CoeffsUpdateProba [4][8][3][11]
  kBModesProba      [10][10][9]
  (gap)
  CoeffsProba0      [4][8][3][11]
"""

import re
import struct
import sys
from pathlib import Path

LIB_CANDIDATES = [
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7",
    "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5",
]
OUT = Path(__file__).resolve().parents[1] / (
    "kenshin_spark/multimodal/vp8_tables.py"
)


def find_one(data: bytes, sig: bytes, what: str) -> int:
    hits = [m.start() for m in re.finditer(re.escape(sig), data)]
    if not hits:
        raise SystemExit(f"signature for {what} not found")
    return hits[0]


def main() -> None:
    lib = next((p for p in LIB_CANDIDATES if Path(p).exists()), None)
    if lib is None:
        raise SystemExit("no libwebp shared object found")
    data = Path(lib).read_bytes()

    # ac_qlookup (uint16): begins 4,5,6,7,8,9,10,11 and ends at 284
    ac_off = find_one(
        data, struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11), "ac_qlookup"
    )
    ac = list(struct.unpack("<128H", data[ac_off:ac_off + 256]))
    assert ac[-1] == 284, ac[-8:]

    # dc_qlookup (uint8): 4,5,6,7,8,9,10,10,... ends at 157 —
    # immediately after the ac table in this build, but locate by its
    # own signature to stay layout-independent
    dc_off = find_one(
        data, bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12]), "dc_qlookup"
    )
    dc = list(data[dc_off:dc_off + 128])
    assert dc[-1] == 157, dc[-8:]

    # coefficient band map
    bands_sig = bytes([0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7])
    bands_off = find_one(data, bands_sig, "coeff bands")
    bands = list(data[bands_off:bands_off + 16])

    # keyframe b-mode probabilities [10][10][9] — first row is the
    # well-known {231,120,48,89,115,113,120,152,112}
    bm_off = find_one(
        data, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]),
        "kf b-mode probs",
    )
    bmode = list(data[bm_off:bm_off + 900])
    assert all(1 <= v <= 255 for v in bmode)
    # libwebp's internal b-mode enum swaps three ids relative to the
    # RFC's intra_bmode order (libwebp: 4=B_RD, 5=B_VR, 6=B_LD; RFC:
    # 4=B_LD, 5=B_RD, 6=B_VR) — permute the [top][left] context rows
    # into RFC numbering, which is what the decoder tree emits
    lib_of_rfc = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]
    rows = [bmode[i * 9:(i + 1) * 9] for i in range(100)]
    bmode = []
    for a in range(10):
        for l in range(10):
            bmode.extend(rows[lib_of_rfc[a] * 10 + lib_of_rfc[l]])

    # token probability UPDATE table [4][8][3][11] sits immediately
    # before the b-mode table in this build; its own signature (row 3
    # of block 0: {176,246,255,...}) pins it independently
    upd_off = find_one(
        data, bytes([176, 246, 255, 255, 255, 255, 255, 255]),
        "coeff update probs",
    ) - 33  # three all-255 rows precede it
    upd = list(data[upd_off:upd_off + 1056])
    assert upd_off + 1056 == bm_off or all(
        1 <= v <= 255 for v in upd
    )

    # DEFAULT token probabilities [4][8][3][11] — band 0 of type 0 is
    # never coded (type-0 luma starts at coefficient 1), stored as
    # three all-128 rows; the well-known {253,136,254,...} row is
    # [0][1][0], 33 bytes in
    prob_off = find_one(
        data, bytes([253, 136, 254, 255, 228, 219, 128, 128]),
        "default coeff probs",
    ) - 33
    probs = list(data[prob_off:prob_off + 1056])
    assert probs[:11] == [128] * 11, probs[:11]
    assert all(1 <= v <= 255 for v in probs)

    def fmt4d(flat, d2, d3, d4, name):
        out = [f"{name} = ["]
        i = 0
        for _t in range(4):
            out.append("    [")
            for _b in range(d2):
                rows = []
                for _c in range(d3):
                    row = flat[i:i + d4]
                    i += d4
                    rows.append("[" + ", ".join(map(str, row)) + "]")
                out.append("        [" + (",\n         ".join(rows)) + "],")
            out.append("    ],")
        out.append("]")
        return "\n".join(out)

    def fmt_bmode(flat):
        out = ["KF_BMODE_PROBS = ["]
        i = 0
        for _a in range(10):
            rows = []
            for _l in range(10):
                row = flat[i:i + 9]
                i += 9
                rows.append("[" + ", ".join(map(str, row)) + "]")
            out.append("    [" + (",\n     ".join(rows)) + "],")
        out.append("]")
        return "\n".join(out)

    body = f'''"""RFC 6386 constant tables (PUBLIC spec data), extracted from the
system libwebp shared object by tools/extract_vp8_tables.py to avoid
hand-transcription errors. Do not edit by hand — regenerate.

Sources: RFC 6386 §14.1 (quantizer lookups), §13.4 (token probability
update flags), §13.5 (default token probabilities), §11.4 (keyframe
b-mode probabilities), §13.3 (coefficient bands).
"""

AC_QLOOKUP = {ac!r}

DC_QLOOKUP = {dc!r}

COEFF_BANDS = {bands!r}

{fmt4d(upd, 8, 3, 11, "COEFF_UPDATE_PROBS")}

{fmt4d(probs, 8, 3, 11, "COEFF_PROBS_DEFAULT")}

{fmt_bmode(bmode)}
'''
    OUT.write_text(body)
    print(f"wrote {OUT} from {lib}")
    print(
        f"offsets: ac={ac_off} dc={dc_off} bands={bands_off} "
        f"upd={upd_off} bmode={bm_off} probs={prob_off}"
    )


if __name__ == "__main__":
    sys.exit(main())

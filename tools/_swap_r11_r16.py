#!/usr/bin/env python
"""One-shot surgery for the round-11 promotion (VERDICT r10 item 1):
swap 8 filler rows out of the r11 bank into the r16 overflow so the
round-10 engine rows (store_manifest_snapshot_lifecycle,
mm_phash_real_pixels, and the rest of the r16 bank) ride the r11
driver window instead of waiting ~6 rounds."""

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
R11 = REPO / "kenshin_spark" / "queries_staged_r11.py"
R16 = REPO / "kenshin_spark" / "queries_staged_r16.py"

FILLER = [  # r11 -> r16 (pure-SQL analytics rows, no engine surface)
    "q_q_nation_quarter_matrix",
    "q_q_order_first_last_gap",
    "q_q_event_session_value_bands",
    "q_q_events_active_days_histogram",
    "q_q_discount_quantity_curve",
    "q_q_events_type_dow_heatmap",
    "q_q_orders_mom_growth",
    "q_q_part_name_words",
]


def extract_blocks(path, fn_names):
    """Return (remaining_src, {fn_name: block_src}) where each block is
    the decorated function including its @stage(...) decorator."""
    src = path.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    spans = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in fn_names:
            start = min(
                [d.lineno for d in node.decorator_list] + [node.lineno]
            )
            spans[node.name] = (start - 1, node.end_lineno)  # 0-based
    assert set(spans) == set(fn_names), (set(fn_names) - set(spans))
    blocks = {
        n: "".join(lines[a:b]).rstrip() + "\n" for n, (a, b) in spans.items()
    }
    keep = []
    cut = sorted(spans.values())
    pos = 0
    for a, b in cut:
        keep.append("".join(lines[pos:a]).rstrip("\n"))
        pos = b
    keep.append("".join(lines[pos:]))
    remaining = ""
    for part in keep[:-1]:
        if part:
            remaining += part + "\n\n\n"
    remaining += keep[-1].lstrip("\n")
    return remaining, blocks


def main():
    r11_rest, filler_blocks = extract_blocks(R11, FILLER)

    # everything in r16 from the first decorated def onward is the
    # engine payload (incl. helpers _rgb_gradient, the _doc_ids import
    # and _set_manifest_oracle) — take it verbatim
    r16_src = R16.read_text()
    cut_marker = "# ------"
    payload_start = r16_src.index(cut_marker)
    # the first row (q_ship_latency_bands) sits above the marker
    first_row_start = r16_src.index('@stage(\n    "q_ship_latency_bands"')
    engine_payload = r16_src[first_row_start:]
    engine_payload = engine_payload.replace("STAGED_R16", "STAGED_R11")

    # --- new r11: rest + engine payload spliced before _BIGINT_CASTS ---
    anchor = "_BIGINT_CASTS = {"
    idx = r11_rest.index(anchor)
    new_r11 = (
        r11_rest[:idx].rstrip("\n")
        + "\n\n\n"
        + "# --------------------------------------------------------------------------\n"
        + "# Promoted EARLY from the r16 overflow bank (VERDICT r10 item 1): the\n"
        + "# round-10 engine rows — the manifest-commit lifecycle and real-pixel\n"
        + "# perceptual dedup — plus the r9-continuation codec rows, so the driver\n"
        + "# adjudicates them THIS round. Eight self-contained analytics rows moved\n"
        + "# the other way to keep both banks at a legal window size.\n"
        + "# --------------------------------------------------------------------------\n\n\n"
        + engine_payload.rstrip("\n")
        + "\n\n\n"
        + r11_rest[idx:]
    )
    R11.write_text(new_r11)

    # --- new r16: header + stage() + the 8 filler rows ---
    header = '''"""Overflow bank — ROUND 16: eight self-contained analytics rows moved
out of the round-11 bank (round-11 surgery, VERDICT r10 item 1) so the
round-10 engine rows — ``store_manifest_snapshot_lifecycle``,
``mm_phash_real_pixels`` and the r9-continuation codec rows — could
ride the r11 driver window instead of waiting here until round 16.

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
'''
    body = "\n\n".join(filler_blocks[n] for n in FILLER)
    R16.write_text(header + "\n\n" + body)
    print("swap done:", len(FILLER), "filler rows r11->r16; engine rows r16->r11")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Promote a staged query bank into the live registry.

Usage:  python tools/promote_staged.py queries_staged      # round 5
        python tools/promote_staged.py queries_staged_r6   # round 6
        python tools/promote_staged.py queries_staged_r7   # round 7
        python tools/promote_staged.py queries_staged_r8   # round 8
        python tools/promote_staged.py queries_staged_r9   # round 9
        python tools/promote_staged.py queries_staged_r10  # round 10
        python tools/promote_staged.py queries_staged_r11  # round 11
        python tools/promote_staged.py queries_staged_r12  # round 12

Appends the two promotion lines to the BOTTOM of kenshin_spark/queries.py
(the circular import resolves because every name the staged module needs
is bound by then). Idempotent: refuses to add a bank twice. Run the
contract + oracle tests afterwards:

    python -m pytest tests/test_contract.py tests/test_queries_oracle.py -q
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
QUERIES_PY = REPO / "kenshin_spark" / "queries.py"

DICT_NAME = {
    "queries_staged": "STAGED",
    "queries_staged_r6": "STAGED_R6",
    "queries_staged_r7": "STAGED_R7",
    "queries_staged_r8": "STAGED_R8",
    "queries_staged_r9": "STAGED_R9",
    "queries_staged_r10": "STAGED_R10",
    "queries_staged_r11": "STAGED_R11",
    "queries_staged_r12": "STAGED_R12",
    "queries_staged_r13": "STAGED_R13",
    "queries_staged_r14": "STAGED_R14",
    "queries_staged_r15": "STAGED_R15",
    "queries_staged_r16": "STAGED_R16",
}


def main(argv: list[str]) -> int:
    if len(argv) != 1 or argv[0] not in DICT_NAME:
        print(__doc__)
        return 2
    module, dname = argv[0], DICT_NAME[argv[0]]
    src = QUERIES_PY.read_text()
    marker = f'_register_bank("kenshin_spark.{module}", "{dname}")'
    if marker in src or f"from kenshin_spark.{module} import {dname}" in src:
        print(f"{module} already promoted — nothing to do")
        return 0
    block = (
        f"\n\n# --- promoted staged bank: {module} "
        f"(see HANDOFF.md) ---\n"
        f'_register_bank("kenshin_spark.{module}", "{dname}")\n'
    )
    QUERIES_PY.write_text(src + block)
    print(f"promoted {module} ({dname}) into QUERIES — now run:")
    print("  python -m pytest tests/test_contract.py "
          "tests/test_queries_oracle.py -q")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

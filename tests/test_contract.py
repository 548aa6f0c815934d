"""Driver-contract invariants (the things that silently cost a round if
they drift — see VERDICT r2: 37 queries fell out of the evaluated
window)."""

from kenshin_spark.queries import DRIVER_VERIFIED, QUERIES, driver_order

DRIVER_WINDOW = 50  # the driver evaluates this many queries() entries


def test_driver_order_is_a_permutation():
    o = driver_order()
    assert sorted(o) == sorted(QUERIES)
    assert DRIVER_VERIFIED <= set(QUERIES)


def test_unverified_queries_fill_the_window_front():
    o = driver_order()
    n_unverified = len(QUERIES) - len(DRIVER_VERIFIED)
    front = o[:n_unverified]
    assert all(n not in DRIVER_VERIFIED for n in front)
    # every query without a prior driver CORRECTNESS row must sit inside
    # the evaluated window — if this trips, either promote r3-green names
    # into DRIVER_VERIFIED or stop adding window-hungry queries
    assert n_unverified <= DRIVER_WINDOW, (
        f"{n_unverified} never-driver-verified queries exceed the "
        f"{DRIVER_WINDOW}-slot window; the newest would go unevaluated"
    )


def test_every_query_has_doc_and_callable():
    for name, spec in QUERIES.items():
        assert callable(spec.fn), name
        assert spec.doc, f"{name} has no doc string in the registry"


def test_no_duplicate_defs_in_package():
    """A later duplicate def silently shadows the earlier one (the r2
    time_shift defect, nearly repeated with offset in r3) — scan every
    module for repeated top-level def names."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "kenshin_spark"
    offenders = []
    for py in pkg.rglob("*.py"):
        tree = ast.parse(py.read_text())
        names = [n.name for n in tree.body
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
        dups = {n for n in names if names.count(n) > 1}
        if dups:
            offenders.append((str(py), sorted(dups)))
    assert not offenders, f"duplicate top-level defs: {offenders}"


def test_driver_order_fronts_unverified():
    """The driver evaluates a 50-slot prefix: every not-yet-verified
    query must sit inside it (else it can never earn a CORRECTNESS row),
    with remaining slots backfilled by verified queries for
    re-verification coverage."""
    from kenshin_spark.queries import DRIVER_VERIFIED, QUERIES, driver_order

    order = driver_order()
    assert sorted(order) == sorted(QUERIES)  # permutation, no dupes/drops
    unverified = [n for n in order if n not in DRIVER_VERIFIED]
    assert len(unverified) <= 50, (
        f"{len(unverified)} unverified queries exceed the 50-slot window; "
        "promote driver-verified names before adding more"
    )
    assert order[: len(unverified)] == unverified  # all fronted


def test_promotion_dry_run_window_arithmetic():
    """Simulate the remaining staged-bank promotions forward from the
    CURRENT registry state (works both before and after each bank is
    actually promoted): every not-yet-promoted bank must land as
    exactly one <= 50-slot never-verified window, banks must be
    all-in or all-out (never partially promoted), and bank names must
    never collide with each other."""
    from kenshin_spark.queries import DRIVER_VERIFIED, QUERIES
    from kenshin_spark.queries_staged import STAGED
    from kenshin_spark.queries_staged_r6 import STAGED_R6
    from kenshin_spark.queries_staged_r7 import STAGED_R7
    from kenshin_spark.queries_staged_r8 import STAGED_R8
    from kenshin_spark.queries_staged_r9 import STAGED_R9
    from kenshin_spark.queries_staged_r10 import STAGED_R10
    from kenshin_spark.queries_staged_r11 import STAGED_R11
    from kenshin_spark.queries_staged_r12 import STAGED_R12
    from kenshin_spark.queries_staged_r13 import STAGED_R13
    from kenshin_spark.queries_staged_r14 import STAGED_R14
    from kenshin_spark.queries_staged_r15 import STAGED_R15
    from kenshin_spark.queries_staged_r16 import STAGED_R16

    banks = [set(STAGED), set(STAGED_R6), set(STAGED_R7), set(STAGED_R8),
             set(STAGED_R9), set(STAGED_R10), set(STAGED_R11),
             set(STAGED_R12), set(STAGED_R13), set(STAGED_R14),
             set(STAGED_R15), set(STAGED_R16)]
    for a in range(len(banks)):
        for b in range(a + 1, len(banks)):
            assert not banks[a] & banks[b], "bank name collision"

    reg = set(QUERIES)
    ver = set(DRIVER_VERIFIED)
    for bank in banks:
        promoted = bank <= reg
        assert promoted or not (bank & reg), "bank partially promoted"
        if promoted:
            continue
        # next round: the driver verifies the current window, the bank joins
        ver |= reg
        reg |= bank
        unverified = reg - ver
        assert unverified == bank
        assert len(unverified) <= DRIVER_WINDOW

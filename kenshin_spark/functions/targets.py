"""Graphite render-target expression parser.

graphite-web's user-facing query language is a nested function-call
string — ``"scale(movingAverage(sys.cpu.*, 5), 2)"`` — wrapping a
metric glob. This module parses that grammar into the repo's
``(glob, chain)`` form so a target string drives ``store.fetch_glob``
plus ``functions.render.apply_chain`` directly: the full
graphite-kenshin serving path (the reference delegates this to
graphite-web; here it is engine-side and testable).

Grammar (the subset every dashboard uses):

    target  := series | func "(" target ("," arg)* ")"
    series  := dotted glob path  (letters, digits, ., *, ?, [], {}, _, -)
    arg     := int | float | 'string' | "string"

Nested calls compose inside-out into an ``apply_chain`` list. The
parser is a ~60-line recursive-descent pass — pure Python, runs on the
driver once per request; nothing here touches data.
"""

from __future__ import annotations

from kenshin_spark.functions.render import RENDER_REGISTRY

#: ',' is legal ONLY because {a,b} glob alternation carries it; the
#: argument splitter never splits inside braces, so a comma reaching a
#: series token is always part of an alternation
_SERIES_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789._-*?[]{},#"
)


class TargetSyntaxError(ValueError):
    pass


def _parse_arg(tok: str):
    tok = tok.strip()
    if not tok:
        raise TargetSyntaxError("empty argument")
    if tok[0] in "\"'":
        if len(tok) < 2 or tok[-1] != tok[0]:
            raise TargetSyntaxError(f"unterminated string {tok!r}")
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            raise TargetSyntaxError(f"bad argument {tok!r}") from None


def _split_args(s: str) -> list[str]:
    """Split on top-level commas (commas inside nested parens or quotes
    don't count)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "({[":  # {a,b} glob alternation commas are not splits
            depth += 1
            cur.append(ch)
        elif ch in ")}]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def parse_target(target: str) -> tuple[str, list[tuple]]:
    """``"scale(movingAverage(sys.cpu.*,5),2)"`` →
    ``("sys.cpu.*", [("movingAverage", 5), ("scale", 2.0)])``.

    The chain is ordered inside-out, ready for ``apply_chain``. Unknown
    function names and malformed syntax raise ``TargetSyntaxError`` —
    the serving layer turns that into a 400, never a job submission."""
    t = target.strip()
    if not t:
        raise TargetSyntaxError("empty target")
    lparen = t.find("(")
    if lparen == -1:
        if not set(t) <= _SERIES_CHARS:
            raise TargetSyntaxError(f"bad series glob {t!r}")
        return t, []
    fname = t[:lparen].strip()
    if not t.endswith(")"):
        raise TargetSyntaxError(f"missing ')' in {target!r}")
    if fname not in RENDER_REGISTRY:
        raise TargetSyntaxError(f"unknown render function {fname!r}")
    inner = t[lparen + 1 : -1]
    parts = _split_args(inner)
    glob, chain = parse_target(parts[0])
    args = tuple(_parse_arg(p) for p in parts[1:])
    return glob, chain + [(fname, *args)]

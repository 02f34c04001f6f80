"""SQL-string predicate parsing for ``decode`` / ``orc_scan``.

Users write filters as the SQL they already know —
``"n_tok >= 60 AND source = 'web'"`` — and pruning still happens from
planning time: the string parses to the same ``(col, op, val)``
conjunction tuples the stats/stripe/stride pruners consume
(operators/encode.decode, sources/orcscan).

Grammar (deliberately the PRUNABLE subset, fail-loud on the rest):

    pred     := compare ( AND compare )*
    compare  := ident op literal | ident BETWEEN literal AND literal
    ident    := name ( '.' name )*        -- dotted nested leaves (r5)
    op       := >= | <= | > | < | = | ==
    literal  := number | 'single-quoted string' ('' escapes a quote)

OR / NOT / parentheses / IN raise with a pointer to ``df.filter`` —
a disjunction cannot prune stripes with per-column [min,max] stats
anyway, so accepting it would silently turn pruning off; better that
the residual-only filter stays visibly in user code.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""\s*(?:
    (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<op>>=|<=|==|=|<|>)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
)""", re.VERBOSE)

_REJECT = {"or", "not", "in", "like"}


def _tokens(s: str) -> list[tuple[str, object]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None or m.end() == pos:
            rest = s[pos:].strip()
            if not rest:
                break
            raise ValueError(
                f"predicate parse error at {rest[:20]!r} in {s!r}")
        pos = m.end()
        if m.group("num") is not None:
            txt = m.group("num")
            out.append(("lit", float(txt) if any(c in txt for c in ".eE")
                        else int(txt)))
        elif m.group("str") is not None:
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("op") is not None:
            op = m.group("op")
            out.append(("op", "==" if op == "=" else op))
        else:
            out.append(("ident", m.group("ident")))
    return out


def parse_predicate(s: str) -> list[tuple]:
    """SQL conjunction string -> [(col, op, val), ...] in the pruning
    grammar (op in {>=, >, <=, <, ==, between})."""
    toks = _tokens(s)
    preds: list[tuple] = []
    i = 0

    def expect(kind: str, what: str):
        nonlocal i
        if i >= len(toks) or toks[i][0] != kind:
            got = toks[i][1] if i < len(toks) else "<end>"
            raise ValueError(
                f"predicate parse error: expected {what}, got {got!r} "
                f"in {s!r}")
        i += 1
        return toks[i - 1][1]

    while True:
        col = expect("ident", "a column name")
        if str(col).lower() in _REJECT | {"and", "between"}:
            raise ValueError(
                f"predicate parse error: {col!r} is not a column name "
                f"in {s!r}")
        if i < len(toks) and toks[i][0] == "ident" \
                and str(toks[i][1]).lower() == "between":
            i += 1
            lo = expect("lit", "a literal")
            kw = expect("ident", "AND")
            if str(kw).lower() != "and":
                raise ValueError(
                    f"predicate parse error: BETWEEN needs AND, got "
                    f"{kw!r} in {s!r}")
            hi = expect("lit", "a literal")
            preds.append((col, "between", (lo, hi)))
        else:
            op = expect("op", "a comparison operator")
            val = expect("lit", "a literal")
            preds.append((col, op, val))
        if i >= len(toks):
            return preds
        kw = expect("ident", "AND")
        low = str(kw).lower()
        if low in _REJECT:
            raise ValueError(
                f"{kw.upper()} is not supported in pruning predicates "
                f"(a disjunction cannot prune with [min,max] stats); "
                f"use df.filter(...) on the scanned DataFrame instead")
        if low != "and":
            raise ValueError(
                f"predicate parse error: expected AND, got {kw!r} "
                f"in {s!r}")

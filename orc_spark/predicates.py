"""SQL-string predicate parsing for ``decode`` / ``orc_scan``.

Users write filters as the SQL they already know —
``"n_tok >= 60 AND source = 'web'"`` — and pruning still happens from
planning time: the string parses to the same ``(col, op, val)``
conjunction tuples the stats/stripe/stride pruners consume
(operators/encode.decode, sources/orcscan).

Grammar (deliberately the PRUNABLE subset, fail-loud on the rest):

    pred     := compare ( AND compare )*
    compare  := ident op literal
              | ident BETWEEN literal AND literal
              | ident IN '(' literal (',' literal)* ')'
              | ident LIKE 'prefix%'
    ident    := name ( '.' name )*        -- dotted nested leaves (r5)
    op       := >= | <= | > | < | = | ==
    literal  := number | 'single-quoted string' ('' escapes a quote)

IN (r5) prunes because it is a FINITE disjunction: a stripe survives
only if some listed value intersects [min,max] (and, with blooms,
only if some value may be present).  LIKE (r5) is accepted for
prefix patterns only — ``'abc%'`` prunes through the string range
[abc, abd); general patterns (inner %, _) and free OR / NOT /
parentheses still raise with a pointer to ``df.filter`` — those
cannot prune with per-column [min,max] stats, and accepting them
would silently turn pruning off.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r"""\s*(?:
    (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<op>>=|<=|==|=|<|>)
  | (?P<punct>[(),])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
)""", re.VERBOSE)

_REJECT = {"or", "not"}
_KEYWORDS = {"and", "between", "in", "like", "or", "not"}


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
        elif m.group("punct") is not None:
            out.append(("punct", m.group("punct")))
        else:
            out.append(("ident", m.group("ident")))
    return out


def _like_prefix(pattern: str, s: str) -> str:
    """Validate a LIKE pattern as prefix-only and return the prefix.
    ``'abc%'`` -> "abc"; anything with an inner wildcard or ``_``
    raises (those cannot prune with [min,max] stats)."""
    if "_" in pattern:
        raise ValueError(
            f"LIKE with '_' is not prunable; use df.filter(...) "
            f"in {s!r}")
    if not pattern.endswith("%") or "%" in pattern[:-1]:
        raise ValueError(
            f"only prefix LIKE patterns ('abc%') can prune; got "
            f"{pattern!r} in {s!r} — use df.filter(...) for general "
            f"patterns")
    prefix = pattern[:-1]
    if not prefix:
        raise ValueError(
            f"LIKE '%' matches everything; drop the predicate "
            f"in {s!r}")
    return prefix


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
        if str(col).lower() in _KEYWORDS:
            raise ValueError(
                f"predicate parse error: {col!r} is not a column name "
                f"in {s!r}")
        kw_next = str(toks[i][1]).lower() \
            if i < len(toks) and toks[i][0] == "ident" else None
        if kw_next == "between":
            i += 1
            lo = expect("lit", "a literal")
            kw = expect("ident", "AND")
            if str(kw).lower() != "and":
                raise ValueError(
                    f"predicate parse error: BETWEEN needs AND, got "
                    f"{kw!r} in {s!r}")
            hi = expect("lit", "a literal")
            preds.append((col, "between", (lo, hi)))
        elif kw_next == "in":
            i += 1
            if expect("punct", "'('") != "(":
                raise ValueError(
                    f"predicate parse error: IN needs '(' in {s!r}")
            vals = [expect("lit", "a literal")]
            while i < len(toks) and toks[i] == ("punct", ","):
                i += 1
                vals.append(expect("lit", "a literal"))
            if expect("punct", "')'") != ")":
                raise ValueError(
                    f"predicate parse error: IN needs ')' in {s!r}")
            preds.append((col, "in", tuple(vals)))
        elif kw_next == "like":
            i += 1
            pattern = expect("lit", "a pattern string")
            if not isinstance(pattern, str):
                raise ValueError(
                    f"predicate parse error: LIKE needs a string "
                    f"pattern in {s!r}")
            preds.append((col, "prefix", _like_prefix(pattern, s)))
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

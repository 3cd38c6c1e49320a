"""Cross-engine deterministic rounding.

``round(double, n)`` differs between engines at half-way points: Spark
rounds the shortest-decimal rendering HALF_UP (70160.805 → 70160.81)
while DuckDB rounds the binary value (70160.80499999… → 70160.80). For
oracle hash-matching we need one definition computed identically on
identical IEEE doubles, so both sides use

    floor(x * 10^n + 0.5) / 10^n

— multiply, add, floor and divide are all exact-deterministic IEEE ops,
so the two engines agree bit-for-bit. (Valid for |x|·10^n < 2^53; all
our aggregates are far below.)

``rewrite_oracle_round`` rewrites ``round(expr, n)`` calls inside
authored oracle SQL into the floor form (paren-aware), so oracle
strings stay readable while the executed SQL matches Spark exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def rnd(col: Column | str, n: int) -> Column:
    """Deterministic round-half-up via floor (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**n)
    return F.floor(c * scale + F.lit(0.5)) / scale


def _find_round_call(sql: str, start: int = 0) -> tuple[int, int, str, str] | None:
    """Locate the next top-level ``round(`` call; return
    (start_idx, end_idx_exclusive, inner_expr, n_digits)."""
    import re

    m = re.search(r"\bround\s*\(", sql[start:], flags=re.IGNORECASE)
    if not m:
        return None
    open_idx = start + m.end() - 1
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                body = sql[open_idx + 1 : i]
                # split on the LAST top-level comma (expr, n)
                d = 0
                last_comma = -1
                for j, ch in enumerate(body):
                    if ch == "(":
                        d += 1
                    elif ch == ")":
                        d -= 1
                    elif ch == "," and d == 0:
                        last_comma = j
                if last_comma < 0:
                    return None
                expr, n = body[:last_comma], body[last_comma + 1 :]
                return (start + m.start(), i + 1, expr.strip(), n.strip())
    return None


def rewrite_oracle_round(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in oracle SQL to the floor form."""
    out = sql
    pos = 0
    while True:
        hit = _find_round_call(out, pos)
        if hit is None:
            return out
        s, e, expr, n = hit
        if not n.isdigit():
            pos = e
            continue
        scale = 10 ** int(n)
        repl = f"(floor(({expr}) * {scale}.0 + 0.5) / {scale}.0)"
        out = out[:s] + repl + out[e:]
        pos = s + len(repl)

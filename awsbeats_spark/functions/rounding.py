"""Engine-independent rounding.

Spark's round() goes through the shortest decimal repr (BigDecimal
HALF_UP) while DuckDB rounds the binary double (nearbyint) — values
whose shortest repr sits exactly on a half boundary (e.g. 8285.425)
round differently. Both sides of every oracle comparison therefore use
the SAME formula: floor(x * 10^n + 0.5) / 10^n, computed in identical
double operations, so results are bit-identical whenever the inputs are.

`rewrite_round_sql` transparently rewrites `round(expr, n)` calls inside
oracle SQL into that formula (balanced-paren scan), so oracle literals
stay readable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int) -> Column:
    """floor(x * 10^n + 0.5) / 10^n — deterministic half-up on doubles."""
    c = F.col(col) if isinstance(col, str) else col
    p = 10**n
    return F.floor(c * F.lit(float(p)) + F.lit(0.5)) / F.lit(float(p))


def rnd_sql(expr: str, n: int) -> str:
    """Spark-SQL text form of :func:`rnd` — same floor half-up formula,
    D-suffixed literals so the arithmetic stays in DOUBLE (a bare 1.0
    parses as DECIMAL in Spark SQL). For single-string expression builds
    (the round-11 py4j fast paths)."""
    p = float(10**n)
    return f"(floor(({expr}) * {p}D + 0.5D) / {p}D)"


def _find_round(sql: str, start: int) -> int:
    """Index of the next standalone `round(` at/after start, or -1."""
    i = start
    low = sql.lower()
    while True:
        i = low.find("round(", i)
        if i < 0:
            return -1
        if i > 0 and (sql[i - 1].isalnum() or sql[i - 1] == "_"):
            i += 6  # part of another identifier (e.g. quantile_round)
            continue
        return i


def rewrite_round_sql(sql: str) -> str:
    """Rewrite every round(EXPR, N) in the SQL into the floor formula."""
    out = []
    pos = 0
    while True:
        i = _find_round(sql, pos)
        if i < 0:
            out.append(sql[pos:])
            break
        out.append(sql[pos:i])
        j = i + len("round(")
        depth = 1
        arg_end = None  # position of the comma separating expr and n
        while j < len(sql):
            ch = sql[j]
            if ch == "'":
                j = sql.index("'", j + 1)
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                arg_end = j
            j += 1
        if depth != 0 or arg_end is None:
            raise ValueError(f"unbalanced/ill-formed round() in SQL at {i}: {sql[i:i+80]!r}")
        # Recurse into the argument: round(round(x, m) + c, n) must
        # rewrite the INNER call too, or it survives verbatim inside
        # the emitted floor() and DuckDB's nearbyint semantics leak
        # back in for the nested value.
        expr = rewrite_round_sql(sql[i + len("round(") : arg_end].strip())
        n = int(sql[arg_end + 1 : j].strip())
        p = 10**n
        out.append(f"(floor(({expr}) * {float(p)} + 0.5) / {float(p)})")
        pos = j + 1
    return "".join(out)

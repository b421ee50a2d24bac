"""GWQL front-end: GeoWave Query Language → Spark SQL.

From-scratch translator for the reference's query language (grammar:
core/store/src/main/antlr4/.../GWQL.g4; statements `SELECT sel[, …] |
agg(…) FROM type [WHERE filter] [LIMIT n]` and `DELETE FROM type
[WHERE …]`, GWQL.g4:75-105; filters AND/OR/NOT/()/INCLUDE/EXCLUDE
:180-192; predicates =, <>, <, <=, >, >=, BETWEEN, IS [NOT] NULL, named
predicate functions, temporal infix operators :194-209; expressions
`+ - * /`, `::` casts :211-225).

GWQL is *almost* a subset of Spark SQL, so the translation is a token
rewrite, not a new engine:

- predicate functions map to the registered ST UDFs
  (``geowave_spark.functions.register_all``): ``BBOX``→``st_bbox``,
  ``INTERSECTS``→``st_intersects``, ``…LOOSE``→envelope-only variants
  (the reference's index-constraint-only predicates return a superset —
  exactly the envelope semantics), text predicates
  (``strStartsWith``→``startswith`` …, TextPredicates.java via
  GWQLCoreExtensions.java:45-50);
- ``::text/number/date/geometry`` casts (GWQLCoreExtensions.java:64-66)
  map to Spark ``::string/double/timestamp`` (geometry is WKT text in
  this engine, so ``::geometry`` is the identity);
- temporal infix operators (TemporalOperators.java): ``BEFORE``→``<``,
  ``AFTER``→``>``, ``BEFORE_OR_DURING``→``<=``, ``DURING_OR_AFTER``→``>=``,
  ``col DURING 'start/end'``→half-open range check;
- ``INCLUDE``/``EXCLUDE``→``TRUE``/``FALSE``;
- the ``BBOX(geom)`` *aggregate* selector (BboxFunction.java, reg
  GWQLSpatialTemporalExtensions.java:31) expands to four min/max envelope
  aggregates;
- ``DELETE FROM t WHERE f`` compiles to the surviving rows
  (``SELECT * FROM t WHERE NOT (f)``) — the copy-on-write rewrite a
  snapshot table store applies.

Everything else (comparisons, BETWEEN, IS NULL, AND/OR/NOT, arithmetic,
LIMIT) is already valid Spark SQL and passes through untouched; Catalyst
then plans the query like any native one (filter pushdown included).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_TOKEN = re.compile(
    r"\s*("
    r"'(?:[^']|'')*'"          # string literal
    r"|::"
    r"|<>|<=|>=|!="
    r"|[(),*+\-/=<>\[\]]"
    r"|[A-Za-z_][A-Za-z0-9_.]*"
    r"|\d+\.?\d*(?:[eE][+-]?\d+)?"
    r")"
)

# GWQL predicate/function name → Spark SQL function (case-insensitive)
_FN = {
    "bbox": "st_bbox",
    "bboxloose": "st_bbox_loose",
    "intersects": "st_intersects",
    "intersectsloose": "st_intersects_loose",
    "disjoint": "st_disjoint",
    "disjointloose": "not st_intersects_loose",
    "crosses": "st_crosses",
    "overlaps": "st_overlaps",
    "contains": "st_contains",
    "touches": "st_touches",
    "within": "st_within",
    "covers": "st_covers",
    "coveredby": "st_covered_by",
    "equals": "st_equals",
    "strstartswith": "startswith",
    "strendswith": "endswith",
    "strcontains": "contains",
}

_CAST = {"text": "string", "number": "double", "date": "timestamp"}

_TEMPORAL_INFIX = {
    "before": "<",
    "after": ">",
    "before_or_during": "<=",
    "during_or_after": ">=",
}


def _tokens(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip():
                raise ValueError(f"GWQL: cannot tokenize at {s[pos:pos+20]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _rewrite_expr(tokens: list[str]) -> str:
    """Token-level GWQL→Spark rewrite of one expression/filter."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        low = t.lower()
        nxt = tokens[i + 1] if i + 1 < len(tokens) else None
        if low in _FN and nxt == "(":
            out.append(_FN[low])
        elif low == "include":
            out.append("TRUE")
        elif low == "exclude":
            out.append("FALSE")
        elif low in _TEMPORAL_INFIX:
            out.append(_TEMPORAL_INFIX[low])
        elif low == "during" and nxt and nxt.startswith("'"):
            # col DURING 'start/end' → (col >= TIMESTAMP s AND col < TIMESTAMP e)
            if not out:
                raise ValueError("GWQL: DURING needs a left operand")
            left = out.pop()
            start, _, end = nxt[1:-1].partition("/")
            out.append(
                f"({left} >= TIMESTAMP '{start}' AND {left} < TIMESTAMP '{end}')"
            )
            i += 2
            continue
        elif t == "::" and nxt:
            ctype = nxt.lower()
            if ctype == "geometry":
                i += 2  # WKT text already is the engine's geometry
                continue
            out.append("::")
            out.append(_CAST.get(ctype, nxt))
            i += 2
            continue
        else:
            out.append(t)
        i += 1
    return " ".join(out)


def _split_selectors(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for tok in _tokens(s):
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        if tok == "," and depth == 0:
            parts.append(cur)
            cur = []
        else:
            cur.append(tok)
    if cur:
        parts.append(cur)
    return parts


def _rewrite_selector(tokens: list[str]) -> str:
    """One selector; expands the BBOX(geom) aggregate to 4 columns."""
    if tokens and tokens[0].lower() == "bbox" and len(tokens) >= 4 and tokens[1] == "(":
        depth, close = 0, None
        for j, t in enumerate(tokens[1:], start=1):
            depth += t == "("
            depth -= t == ")"
            if depth == 0:
                close = j
                break
        inner_toks = tokens[2:close]
        rest = tokens[close + 1 :]
        aggregate_form = "," not in inner_toks and (
            not rest or (len(rest) == 2 and rest[0].lower() == "as")
        )
        if aggregate_form:
            inner = _rewrite_expr(inner_toks)
            alias = rest[1] + "_" if rest else ""
            return (
                f"min(st_xmin({inner})) AS {alias}bbox_minx, "
                f"min(st_ymin({inner})) AS {alias}bbox_miny, "
                f"max(st_xmax({inner})) AS {alias}bbox_maxx, "
                f"max(st_ymax({inner})) AS {alias}bbox_maxy"
            )
    return _rewrite_expr(tokens)


_SELECT = re.compile(
    r"^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_.]*)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[A-Za-z_][A-Za-z0-9_.]*)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def translate(gwql: str) -> str:
    """GWQL statement → executable Spark SQL string."""
    m = _SELECT.match(gwql)
    if m:
        sels = ", ".join(_rewrite_selector(t) for t in _split_selectors(m.group("sel")))
        sql = f"SELECT {sels} FROM {m.group('tbl')}"
        if m.group("where"):
            sql += f" WHERE {_rewrite_expr(_tokens(m.group('where')))}"
        if m.group("limit"):
            sql += f" LIMIT {m.group('limit')}"
        return sql
    m = _DELETE.match(gwql)
    if m:
        sql = f"SELECT * FROM {m.group('tbl')}"
        if m.group("where"):
            sql += f" WHERE NOT ({_rewrite_expr(_tokens(m.group('where')))})"
        return sql
    raise ValueError(f"GWQL: unsupported statement: {gwql[:60]!r}")


def run(spark: SparkSession, gwql: str) -> DataFrame:
    """Execute a GWQL statement against the session's registered views
    (type name == temp view name, mirroring the reference's type-name
    resolution through the adapter store).  DELETE returns the surviving
    rows — apply with ``.write`` to complete the copy-on-write rewrite."""
    from .functions.registry import register_all

    register_all(spark)
    return spark.sql(translate(gwql))

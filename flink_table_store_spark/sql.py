"""Spark SQL surface over the engine catalog.

The reference exposes its tables through the host engine's SQL
(docs/content/spark/sql-query.md:58-110, sql-write.md; ``CALL`` + tag
DDL grammar paimon-spark/.../antlr4 PaimonSqlExtensions.g4:71-87). We
run without a JVM catalog plugin, so ``SqlSession`` rewrites engine
table references inside the SQL text into registered temp views (each
view IS the merge-on-read DataFrame, so Catalyst sees an ordinary
relation), resolves time travel / ``t$system`` / incremental-TVF
references the same way, and routes DML (INSERT / DELETE / UPDATE /
MERGE) and ``CALL sys.*`` statements to the Python table API. The
SELECT itself — joins, windows, aggregates — executes verbatim in
``spark.sql``, exactly as the reference delegates to its host engine.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P
from flink_table_store_spark.catalog import Catalog

_TRAVEL = (
    r"(?:\s+(?:VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(?:'[^']*'|\"[^\"]*\"|\x00\d+\x00|[\w.\-]+))?"
)
_REF = re.compile(
    r"(?i)\b(FROM|JOIN)\s+(`[^`]+`|[A-Za-z_][\w.$@]*)(" + _TRAVEL + ")",
)
_TVF = re.compile(
    r"(?i)\b(paimon_incremental_query|paimon_incremental_between_timestamp|"
    r"paimon_incremental_to_auto_tag|paimon_bucketed_join|"
    r"paimon_as_of_join|paimon_sessionize|paimon_range_join|"
    r"paimon_funnel|paimon_retention)\s*\(([^()]*)\)"
)
_KEYWORDS = {
    "select", "values", "unnest", "lateral", "table", "range",
}
# tokens that can FOLLOW a table reference without being its alias
_SQL_CLAUSE_KW = {
    "ON", "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "USING",
    "VERSION", "TIMESTAMP", "EXCEPT", "INTERSECT", "MINUS", "SORT",
    "DISTRIBUTE", "CLUSTER", "WINDOW", "QUALIFY", "SEMI", "ANTI", "SET",
}
# FROM a [AS] x (JOIN b [AS] y ON <cond>)+ — the auto-elision
# candidate shape. Alias tokens must not swallow the join keywords.
_ALIAS = r"(?:\s+AS)?(?:\s+(?!(?:INNER|LEFT|RIGHT|FULL|CROSS|JOIN|ON|WHERE|GROUP|ORDER|HAVING|LIMIT|UNION)\b)([A-Za-z_]\w*))?"
_JOIN_KW = r"(?:INNER\s+|LEFT\s+(?:OUTER\s+)?|RIGHT\s+(?:OUTER\s+)?|FULL\s+(?:OUTER\s+)?)?JOIN"
_FROM_BASE = re.compile(r"(?is)\bFROM\s+([A-Za-z_][\w.]*)" + _ALIAS)
_JOIN_HOP = re.compile(
    r"(?is)\s+(" + _JOIN_KW + r")\s+([A-Za-z_][\w.]*)" + _ALIAS +
    r"\s+ON\s+(.*?)(?=\s+(?:" + _JOIN_KW + r")\s|\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|UNION)\b|\s*$)"
)


# string-literal splitter: single-quoted AND double-quoted segments are
# protected from qualifier rewriting (Spark treats "..." as a string
# literal by default, not an identifier)
_QUOTED = re.compile(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")")
# masking additionally protects comments: a quote inside `-- don't` or
# /* ... */ must not pair with a later real quote and swallow SQL text.
# Alternation is positional (whichever construct STARTS first wins), so
# this is single-scanner semantics: quotes inside comments are comment
# text, comment markers inside quotes are string text.
_PROTECTED = re.compile(
    r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"|--[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)"
)


def _strip_qualifiers(
    s: str, quals: set[str], renames: list[tuple[re.Pattern, str]] = ()
) -> str:
    """Apply ``renames`` then remove ``alias.`` prefixes, both outside
    string literals. Case-insensitive like Spark's identifier
    resolution."""
    pat = re.compile(
        r"\b(?:"
        + "|".join(re.escape(x) for x in sorted(quals, key=len, reverse=True))
        + r")\.(?=[\w`])",
        re.IGNORECASE,
    )

    def fix(p: str) -> str:
        for rp, repl in renames:
            p = rp.sub(repl, p)
        return pat.sub("", p)

    parts = _QUOTED.split(s)
    return "".join(p if p[:1] in ("'", '"') else fix(p) for p in parts)


def _mask_literals(s: str) -> tuple[str, list[str]]:
    """Replace quoted string literals AND comments with ``\\x00<i>\\x00``
    placeholders (no spaces, no identifier characters) so
    clause-splitting regexes and identifier rewrites cannot touch
    literal contents. Every clause split in this module MUST run over
    masked text (the r6 HAVING bug class: a regex matching inside
    ``'... GROUP BY ...'``). Reverse with ``_unmask_literals``."""
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return _PROTECTED.sub(stash, s), lits


def _unmask_literals(s: str, lits: list[str]) -> str:
    return re.sub("\x00(\\d+)\x00", lambda m: lits[int(m.group(1))], s)


def sql_like_pattern(pattern: str, flags: int = 0) -> re.Pattern:
    """SQL LIKE pattern (``%`` = any run, ``_`` = any single char) →
    anchored regex. Shared by SHOW ... LIKE and the REST catalog's
    name-pattern listings so LIKE semantics cannot drift."""
    return re.compile(
        "^" + re.escape(pattern).replace("%", ".*").replace("_", ".") + "$", flags
    )


def _view_name(key: str) -> str:
    return "ftss_" + hashlib.md5(key.encode()).hexdigest()[:10]


def _split_depth0_parens(s: str) -> list[str]:
    """Split on commas outside BOTH <> and () nesting (generic types
    like map<string,array<int>>, parameterized types like
    decimal(10,2), and PRIMARY KEY (a, b) keep their inner commas)."""
    out, buf, angle, paren = [], [], 0, 0
    for ch in s:
        if ch == "<":
            angle += 1
        elif ch == ">":
            angle -= 1
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        if ch == "," and angle == 0 and paren == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def _split_commas(s: str) -> list[str]:
    """Split on commas outside ``()`` nesting — for MASKED expression/
    argument lists (quotes and comments are already placeholders, and
    ``<``/``>`` are comparison operators here, unlike the type lists
    ``_split_depth0_parens`` serves where they nest generics)."""
    out, buf, depth = [], [], 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return out


def _parse_clause_tail(s: str) -> tuple[str | None, str | None, str]:
    """PARTITIONED BY (...) / TBLPROPERTIES (...) in ANY order (Spark
    accepts both); the TBLPROPERTIES body is scanned with balanced
    parens outside string literals so a ')' inside a quoted value
    cannot close it. Returns (partition cols, properties, leftover)."""
    part_s = props_s = None
    if tm := re.search(r"(?is)\bTBLPROPERTIES\s*\(", s):
        i, depth, in_q = tm.end(), 1, False
        while i < len(s) and depth:
            ch = s[i]
            if in_q:
                if ch == "'":
                    in_q = False
            elif ch == "'":
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced TBLPROPERTIES in: {s}")
        props_s = s[tm.end() : i - 1]
        s = s[: tm.start()] + s[i:]
    if pm := re.search(r"(?is)\bPARTITIONED\s+BY\s*\(([^)]*)\)", s):
        part_s = pm.group(1)
        s = s[: pm.start()] + s[pm.end() :]
    return part_s, props_s, s.strip()


def _parse_props(props_s: str | None) -> dict[str, str]:
    options: dict[str, str] = {}
    if props_s:
        # masked split: a quoted value may contain ',' or '='
        mp, lits = _mask_literals(props_s)
        for piece in _split_commas(mp):
            k, _, v = piece.partition("=")
            options[str(_literal(_unmask_literals(k, lits).strip()))] = str(
                _literal(_unmask_literals(v, lits).strip())
            )
    return options


def _strip_wrap_parens(s: str) -> str:
    """Strip ONE pair of parens only when they wrap the whole string —
    'a decimal(10,2)' must keep its type parens while '(a int, b int)'
    loses the list wrapper."""
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        return s
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:-1].strip() if i == len(s) - 1 else s
    return s


def _literal(tok: str) -> Any:
    tok = tok.strip()
    if (tok.startswith("'") and tok.endswith("'")) or (
        tok.startswith('"') and tok.endswith('"')
    ):
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        return tok


def _ts_millis(v: Any) -> int:
    """TIMESTAMP AS OF accepts a datetime string or unix seconds
    (TimeTravelUtil semantics)."""
    if isinstance(v, (int, float)):
        return int(v * 1000)
    s = str(v)
    try:
        return int(float(s) * 1000)
    except ValueError:
        dt = _dt.datetime.fromisoformat(s)
        return int(dt.timestamp() * 1000)


def parse_condition(cond: str) -> P.Predicate:
    """SQL condition → predicate AST.

    Top-level ``AND`` conjunctions of ``col op literal`` comparisons
    become Leaf predicates (so DELETE/UPDATE get partition detection and
    manifest stats pruning, mirroring SparkV2FilterConverter.scala:32);
    anything more complex degrades to a Raw predicate around
    ``F.expr`` — correct, just not stats-prunable.
    """
    parts = _split_top_and(cond)
    preds: list[P.Predicate] = []
    for part in parts:
        p = _parse_comparison(part.strip())
        if p is None:
            return P.raw(F.expr(cond))
        preds.append(p)
    return preds[0] if len(preds) == 1 else P.and_(*preds)


def _split_top_and(cond: str) -> list[str]:
    out, depth, cur, i = [], 0, [], 0
    toks = re.split(r"(?i)(\bAND\b|\(|\)|'[^']*')", cond)
    for t in toks:
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0 and t.strip().upper() == "AND":
            out.append("".join(cur))
            cur = []
            continue
        cur.append(t)
    out.append("".join(cur))
    return out


_CMP = re.compile(
    r"^\(*\s*`?([A-Za-z_]\w*)`?\s*(=|==|!=|<>|<=|>=|<|>)\s*"
    r"('[^']*'|\"[^\"]*\"|[-\w.]+)\s*\)*$"
)
_NULLCMP = re.compile(r"(?i)^\(*\s*`?([A-Za-z_]\w*)`?\s+IS\s+(NOT\s+)?NULL\s*\)*$")
_INCMP = re.compile(r"(?i)^\(*\s*`?([A-Za-z_]\w*)`?\s+IN\s*\(([^()]*)\)\s*\)*$")


def _parse_comparison(s: str) -> P.Predicate | None:
    m = _NULLCMP.match(s)
    if m:
        return P.is_not_null(m.group(1)) if m.group(2) else P.is_null(m.group(1))
    m = _INCMP.match(s)
    if m:
        vals = [_literal(v) for v in m.group(2).split(",")]
        return P.or_(*[P.equal(m.group(1), v) for v in vals])
    m = _CMP.match(s)
    if not m:
        return None
    f, op, lit = m.group(1), m.group(2), _literal(m.group(3))
    if isinstance(lit, str) and lit == m.group(3) and not (
        m.group(3).startswith("'") or m.group(3).startswith('"')
    ):
        return None  # rhs is a column/expr, not a literal
    return {
        "=": P.equal, "==": P.equal,
        "!=": P.not_equal, "<>": P.not_equal,
        "<": P.less_than, "<=": P.less_or_equal,
        ">": P.greater_than, ">=": P.greater_or_equal,
    }[op](f, lit)


class SqlSession:
    """``engine.sql(...)`` — the reference's Spark SQL surface in Python."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        rollup_routing: bool = False,
    ):
        self.spark = spark
        self.catalog = catalog
        # opt-in continuous-aggregate routing (TimescaleDB-style): an
        # in-spec aggregate over a raw table is rewritten to its rollup
        # (operators/rollup.py). Opt-IN because a routed answer reflects
        # the rollup's refresh state — raw writes not yet folded are
        # invisible, the documented continuous-aggregate trade.
        self.rollup_routing = rollup_routing

    # --- statement router ---

    def sql(self, query: str):
        q = query.strip().rstrip(";").strip()
        head = q.split(None, 1)[0].upper() if q else ""
        if head == "CALL":
            return self._call(q)
        if head == "INSERT":
            return self._insert(q)
        if head == "DELETE":
            return self._delete(q)
        if head == "UPDATE":
            return self._update(q)
        if head == "MERGE":
            return self._merge(q)
        if head == "ALTER":
            return self._alter(q)
        if head == "CREATE":
            if re.match(r"(?is)CREATE\s+DATABASE\b", q):
                return self._create_db(q)
            if re.match(r"(?is)CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\b", q):
                return self._create_view(q)
            if re.match(r"(?is)CREATE\s+TABLE\b", q):
                return self._create(q)
        if head == "DROP":
            if re.match(r"(?is)DROP\s+TABLE\b", q):
                return self._drop(q)
            if re.match(r"(?is)DROP\s+VIEW\b", q):
                return self._drop_view(q)
            if re.match(r"(?is)DROP\s+DATABASE\b", q):
                return self._drop_db(q)
        if head == "SHOW":
            if re.match(r"(?is)SHOW\s+TABLES\b", q):
                return self._show_tables(q)
            if re.match(r"(?is)SHOW\s+DATABASES\b", q):
                return self._show_databases(q)
            if re.match(r"(?is)SHOW\s+VIEWS\b", q):
                return self._show_views(q)
            if re.match(r"(?is)SHOW\s+CREATE\s+TABLE\b", q):
                return self._show_create(q)
            if re.match(r"(?is)SHOW\s+PARTITIONS\b", q):
                return self._show_partitions(q)
            if re.match(r"(?is)SHOW\s+TBLPROPERTIES\b", q):
                return self._show_tblproperties(q)
        if head == "TRUNCATE":
            return self._truncate(q)
        if head == "ANALYZE":
            return self._analyze(q)
        if head in ("DESCRIBE", "DESC"):
            return self._describe(q)
        if self.rollup_routing and head == "SELECT":
            routed = self._route_rollup(q)
            if routed is not None:
                return self.spark.sql(routed)
        return self.spark.sql(self._rewrite(q))

    # --- reference rewriting (SELECT path) ---

    # --- ASOF JOIN grammar (DuckDB/kdb surface) -------------------------

    _ASOF_KW = r"(?!ASOF\b)(?!JOIN\b)(?!LEFT\b)(?!ON\b)"
    _ASOF_RE = re.compile(
        r"(?is)\bFROM\s+([\w.$]+)(?:\s+(?:AS\s+)?" + _ASOF_KW + r"(\w+))?"
        r"\s+ASOF\s+(LEFT\s+)?JOIN\s+([\w.$]+)(?:\s+(?:AS\s+)?(\w+))?"
        r"\s+ON\s+(.*?)(?=\s+(?:WHERE|GROUP|ORDER|HAVING|LIMIT|UNION)\b|\s*$)"
    )
    _ASOF_EQ = re.compile(r"(?is)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")
    _ASOF_INEQ = re.compile(
        r"(?is)^\s*(\w+)\.(\w+)\s*(>=|<=)\s*(\w+)\.(\w+)\s*$"
    )

    def _asof_sql(self, q: str, lits: list[str]) -> str | None:
        """DuckDB-style ``FROM l ASOF [LEFT] JOIN r ON l.k = r.k AND
        l.ts >= r.ts`` over engine tables, planned as the union-tag
        zero-join as_of_join (operators/temporal.py) instead of the
        inequality join a generic planner would produce. ``>=`` matches
        the latest prior-or-equal right row (backward), ``<=`` the
        earliest next (forward); plain ASOF JOIN keeps only matched
        left rows (DuckDB inner semantics), ASOF LEFT JOIN keeps all.
        Qualified references elsewhere in the statement are rewritten
        onto the join's output columns (right names colliding with left
        get ``_right``; the matched right timestamp is
        ``<time>_right``). Returns the rewritten SQL or None if no ASOF
        pattern (malformed ON conditions on a matched pattern raise —
        ASOF JOIN is not valid Spark SQL, so falling through could only
        produce a confusing AnalysisException)."""
        m = self._ASOF_RE.search(q)
        if m is None:
            return None
        l_id, l_alias, left_kw, r_id, r_alias, on = m.groups()
        if not (self._known(l_id) and self._known(r_id)):
            raise ValueError(
                f"ASOF JOIN requires engine tables, got {l_id!r} / {r_id!r}"
            )
        la = (l_alias or l_id.rpartition(".")[2]).lower()
        ra = (r_alias or r_id.rpartition(".")[2]).lower()
        eqs: list[tuple[str, str]] = []  # (left col, right col)
        ineq = None
        for conj in self._split_top_and(on):
            if em := self._ASOF_EQ.match(conj):
                a1, c1, a2, c2 = em.groups()
                if a1.lower() == la and a2.lower() == ra:
                    eqs.append((c1, c2))
                elif a1.lower() == ra and a2.lower() == la:
                    eqs.append((c2, c1))
                else:
                    raise ValueError(f"ASOF JOIN: unknown alias in {conj!r}")
            elif im := self._ASOF_INEQ.match(conj):
                if ineq is not None:
                    raise ValueError("ASOF JOIN: multiple inequalities")
                a1, c1, op, a2, c2 = im.groups()
                if a1.lower() == la and a2.lower() == ra:
                    ineq = (c1, c2, "backward" if op == ">=" else "forward")
                elif a1.lower() == ra and a2.lower() == la:
                    ineq = (c2, c1, "forward" if op == ">=" else "backward")
                else:
                    raise ValueError(f"ASOF JOIN: unknown alias in {conj!r}")
            else:
                raise ValueError(
                    f"ASOF JOIN ON supports alias.col = alias.col and one "
                    f"alias.ts >=/<= alias.ts conjunct, got {conj!r}"
                )
        if ineq is None:
            raise ValueError("ASOF JOIN needs a time inequality in ON")
        l_time, r_time, direction = ineq

        from flink_table_store_spark.operators.temporal import as_of_join

        left_df = self.catalog.get_table(l_id).to_df(self.spark)
        right_df = self.catalog.get_table(r_id).to_df(self.spark)
        # align right key/time names onto the left's (as_of_join keys
        # and time are name-matched across both frames)
        ren = {c2: c1 for c1, c2 in eqs if c1 != c2}
        if r_time != l_time:
            ren[r_time] = l_time
        for old, new in ren.items():
            if new in right_df.columns and new != old:
                raise ValueError(
                    f"ASOF JOIN: renaming right {old!r} -> {new!r} would "
                    f"collide with an existing right column"
                )
        for old, new in ren.items():
            right_df = right_df.withColumnRenamed(old, new)
        by = [c1 for c1, _c2 in eqs]
        joined = as_of_join(
            left_df, right_df, time_col=l_time, by=by, direction=direction
        )
        if not left_kw:
            # plain ASOF JOIN: inner semantics — the matched right
            # timestamp is non-NULL exactly when a match exists
            joined = joined.where(F.col(l_time + "_right").isNotNull())
        view = _view_name("asof!" + m.group(0))
        joined.createOrReplaceTempView(view)

        # rewrite qualified refs in the REST of the statement onto the
        # join output: left alias drops; right keys/time map to the
        # left names / <time>_right; right payload keeps its (possibly
        # suffixed) output name
        left_cols = set(left_df.columns)
        r_payload = {
            c: (c + "_right" if c in left_cols else c)
            for c in right_df.columns
            if c not in by and c != l_time
        }

        def qual_sub(mm: re.Match) -> str:
            alias, col = mm.group(1), mm.group(2)
            if alias.lower() == la:
                return col
            if alias.lower() == ra:
                if col == r_time:
                    return l_time + "_right"
                mapped = ren.get(col, col)
                if mapped in by:
                    return mapped
                return r_payload.get(col, col)
            return mm.group(0)

        q2 = q[:m.start()] + f"FROM {view}" + q[m.end():]
        return re.sub(r"\b(\w+)\.(\w+)\b", qual_sub, q2)

    _ROUTE_BLOCK = re.compile(
        r"(?i)\b(join|union|intersect|except|minus|distinct|over|"
        r"filter|qualify|window|lateral|with)\b"
    )
    _ROUTE_SHAPE = re.compile(
        r"(?is)^SELECT\s+(.+?)\s+FROM\s+([A-Za-z_][\w.]*)\s*(.*)$"
    )
    _ROUTE_TAIL = re.compile(
        r"(?is)^(?:WHERE\s+(.+?)\s+)?GROUP\s+BY\s+(.+?)"
        r"(?:\s+HAVING\s+(.+?))?"
        r"(\s+ORDER\s+BY\s+.+?)?(\s+LIMIT\s+\d+)?\s*$"
    )
    # aggregate-call occurrences inside HAVING / ORDER BY text
    _ROUTE_AGG_CALL = re.compile(
        r"(?i)\b(count|sum|min|max|avg)\s*\(\s*(\*|[A-Za-z_]\w*)\s*\)"
    )
    _ROUTE_COL = re.compile(r"(?is)^([A-Za-z_]\w*)(?:\s+AS\s+([A-Za-z_]\w*))?$")
    _ROUTE_AGG = re.compile(
        r"(?is)^(count|sum|min|max|avg)\s*\(\s*(\*|[A-Za-z_]\w*)\s*\)"
        r"(?:\s+AS\s+([A-Za-z_]\w*))?$"
    )
    _ROUTE_TRUNC = re.compile(
        r"(?is)^date_trunc\s*\(\s*(\x00\d+\x00)\s*,\s*([A-Za-z_]\w*)\s*\)"
        r"(?:\s+AS\s+([A-Za-z_]\w*))?$"
    )
    # WHERE may reference only rollup GROUP columns; these tokens are
    # the condition grammar, everything else must be a group column
    _ROUTE_WHERE_KW = {
        "and", "or", "not", "in", "between", "is", "null", "like",
        "true", "false", "rlike", "ilike",
    }
    _TRUNC_SECS = {"minute": 60, "hour": 3600, "day": 86400}
    # truncation units whose boundaries are all midnights: any bucket
    # width dividing a day aligns with them
    _TRUNC_DAY_ALIGNED = {"week", "month", "quarter", "year"}

    @staticmethod
    def _split_top_and(s: str) -> list[str]:
        """Split on AND at paren depth 0 (case-insensitive)."""
        out, depth, start, i, n = [], 0, 0, 0, len(s)
        while i < n:
            c = s[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and s[i:i + 3].upper() == "AND" and (
                (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
                and (i + 3 >= n or not (s[i + 3].isalnum() or s[i + 3] == "_"))
            ):
                out.append(s[start:i])
                i += 3
                start = i
                continue
            i += 1
        out.append(s[start:])
        return out

    @staticmethod
    def _aligned_epoch(lit: str, isecs: int) -> bool:
        """True if the timestamp literal sits exactly on a bucket
        boundary (UTC session timezone; buckets are epoch-aligned)."""
        import datetime as _d

        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                    "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
            try:
                dt = _d.datetime.strptime(lit, fmt)
                break
            except ValueError:
                continue
        else:
            return False
        epoch = (dt - _d.datetime(1970, 1, 1)).total_seconds()
        return epoch == int(epoch) and int(epoch) % isecs == 0

    @staticmethod
    def _interval_seconds(interval: str) -> int | None:
        m = re.match(
            r"(?i)^\s*(\d+)\s*(second|minute|hour|day)s?\s*$", interval
        )
        if not m:
            return None
        return int(m.group(1)) * {
            "second": 1, "minute": 60, "hour": 3600, "day": 86400,
        }[m.group(2).lower()]

    def _route_rollup(self, q: str) -> str | None:
        """Rewrite an in-spec single-table aggregate over a raw table to
        its continuous rollup (the read half of the continuous-aggregate
        pattern: TimescaleDB real-time aggregates, Druid rollup reads).
        Returns the rewritten SQL, or None to leave the query on the
        normal path — ROUTING IS SOUND-OR-SILENT: anything outside the
        provable envelope (joins, HAVING, DISTINCT, expressions, WHERE
        touching non-group columns, a time grain the bucket width
        doesn't align with, an aggregate with no stored metric) falls
        through untouched.

        In-spec means: SELECT of group columns / ``date_trunc('<unit>',
        time_col)`` / count-sum-min-max-avg over plain columns, FROM one
        raw engine table linked via ``rollup.tables``, optional WHERE
        over group columns only, GROUP BY required (a GLOBAL aggregate
        is out of spec: over an empty table it returns one row, while
        re-aggregating an empty rollup returns NULL sums — the one
        shape whose routed answer could differ). Aggregates map to
        re-aggregation of the rollup cells (count→sum of partial
        counts, sum→sum, min→min, max→max, avg→sum/count of the SAME
        source column's stored metrics), so any requested grain
        coarser-or-equal to the bucket and any group subset is exact.
        The routed answer reflects the rollup's refresh state — raw
        writes not yet folded are invisible (the continuous-aggregate
        contract; that is why routing is opt-in)."""
        mq, lits = _mask_literals(q)
        if self._ROUTE_BLOCK.search(mq) or mq.lower().count("select") != 1:
            return None
        m = self._ROUTE_SHAPE.match(mq.strip())
        if not m:
            return None
        sel_txt, ident, tail = m.group(1), m.group(2), m.group(3)
        if not self._known(ident):
            return None
        tm = self._ROUTE_TAIL.match(tail.strip())
        if not tm:
            return None
        where_txt, grp_txt, having_txt, order_txt, limit_txt = tm.groups()
        raw = self.catalog.get_table(ident)
        names = [
            r for r in raw.schema.options.get("rollup.tables", "").split(",")
            if r
        ]
        if not names:
            return None

        def _norm(s: str) -> str:
            return re.sub(r"\s+", "", s.lower())

        for rollup_name in names:
            try:
                rollup = self.catalog.get_table(rollup_name)
                opts = rollup.schema.options
                time_col = opts["rollup.time-col"]
                isecs = self._interval_seconds(opts["rollup.interval"])
                metrics = {
                    out: tuple(spec)
                    for out, spec in json.loads(
                        opts["rollup.metrics"]
                    ).items()
                }
            except Exception:
                continue
            if isecs is None:
                continue
            groups = set(rollup.schema.primary_keys) - {"bucket_start"}
            by_srcfn = {
                (spec[0], spec[1]): out for out, spec in metrics.items()
            }
            raw_types = {f.name: f.type.lower() for f in raw.schema.fields}
            int_t = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
            flt_t = {"float", "double"}

            def _norm_t(t: str | None) -> str | None:
                return {"long": "bigint", "integer": "int"}.get(t, t)

            def _mdtype(out: str) -> str:
                spec = metrics[out]
                return _norm_t(str(
                    spec[2] if len(spec) > 2
                    else ("bigint" if spec[1] == "count" else "double")
                ).lower())

            def _direct_sum_t(col_t: str | None) -> str | None:
                # what direct sum(col) types to; decimal re-aggregation
                # widens precision a second time, so it's out of spec
                if col_t in int_t:
                    return "bigint"
                if col_t in flt_t:
                    return "double"
                return None

            def _map_agg(fn: str, arg: str) -> str | None:
                # every branch also proves TYPE parity: the stored
                # metric dtype must re-aggregate to exactly the type
                # direct fn(col) would produce, else the routed schema
                # (or decimal precision) would silently differ
                if fn == "count":
                    out = by_srcfn.get(("*" if arg == "*" else arg, "count"))
                    if not out or _mdtype(out) not in int_t:
                        return None
                    # coalesce: a GROUP BY group always has >= 1 cell so
                    # sum(count_metric) is never NULL — but its TYPE is
                    # nullable, and direct count(*) is not; coalesce
                    # restores the non-nullable schema bit-equally
                    return f"coalesce(sum({out}), 0)"
                if fn == "sum":
                    out = by_srcfn.get((arg, "sum"))
                    if not out or _mdtype(out) != _direct_sum_t(
                        raw_types.get(arg)
                    ):
                        return None
                    return f"sum({out})"
                if fn in ("min", "max"):
                    out = by_srcfn.get((arg, fn))
                    if not out or _mdtype(out) != _norm_t(
                        raw_types.get(arg)
                    ):
                        return None
                    return f"{fn}({out})"
                s = by_srcfn.get((arg, "sum"))
                c = by_srcfn.get((arg, "count"))
                if (
                    not s or not c
                    or raw_types.get(arg) not in int_t | flt_t
                    or _mdtype(s) not in {"bigint", "double"}
                    or _mdtype(c) not in int_t
                ):
                    return None
                return f"(sum({s}) / sum({c}))"

            def _trunc_ok(unit: str) -> bool:
                if unit in self._TRUNC_SECS:
                    return self._TRUNC_SECS[unit] % isecs == 0
                return unit in self._TRUNC_DAY_ALIGNED and 86400 % isecs == 0

            # GROUP BY items: plain group columns or the aligned trunc
            grp_out, grp_norms, ok = [], set(), True
            for item in _split_depth0_parens(grp_txt):
                item = item.strip()
                if cm := re.match(r"(?is)^[A-Za-z_]\w*$", item):
                    if item not in groups:
                        ok = False
                        break
                    grp_out.append(item)
                    grp_norms.add(_norm(item))
                elif dm := self._ROUTE_TRUNC.match(item):
                    unit = _unmask_literals(dm.group(1), lits)[1:-1].lower()
                    if dm.group(2) != time_col or not _trunc_ok(unit):
                        ok = False
                        break
                    grp_out.append(f"date_trunc('{unit}', bucket_start)")
                    # canonical rebuilt form (not the raw text: the same
                    # literal masks to DIFFERENT indices in SELECT vs
                    # GROUP BY, and quote style may differ)
                    grp_norms.add(_norm(f"date_trunc('{unit}',{dm.group(2)})"))
                else:
                    ok = False
                    break
            if not ok:
                continue

            sel_out = []
            out_aliases: set[str] = set()
            for item in _split_depth0_parens(sel_txt):
                item = item.strip()
                if am := self._ROUTE_AGG.match(item):
                    fn, arg, alias = (
                        am.group(1).lower(), am.group(2), am.group(3),
                    )
                    mapped = _map_agg(fn, arg)
                    if mapped is None:
                        ok = False
                        break
                    # preserve Spark's auto-name when unaliased so the
                    # routed schema is bit-equal to the direct one
                    alias = alias or f"{fn}({'1' if arg == '*' else arg})"
                    out_aliases.add(alias.lower())
                    sel_out.append(f"{mapped} AS `{alias}`")
                elif cm := self._ROUTE_COL.match(item):
                    col, alias = cm.group(1), cm.group(2)
                    if col not in groups or _norm(col) not in grp_norms:
                        ok = False
                        break
                    out_aliases.add((alias or col).lower())
                    sel_out.append(f"{col} AS `{alias}`" if alias else col)
                elif dm := self._ROUTE_TRUNC.match(item):
                    unit = _unmask_literals(dm.group(1), lits)[1:-1].lower()
                    expr_norm = _norm(
                        f"date_trunc('{unit}',{dm.group(2)})"
                    )
                    if expr_norm not in grp_norms or not dm.group(3):
                        # unaliased trunc: Spark's auto-name for the
                        # rewritten expr would differ — out of spec
                        ok = False
                        break
                    out_aliases.add(dm.group(3).lower())
                    sel_out.append(
                        f"date_trunc('{unit}', bucket_start) AS "
                        f"`{dm.group(3)}`"
                    )
                else:
                    ok = False
                    break
            if not ok:
                continue

            def _map_agg_text(txt: str) -> str | None:
                """HAVING / ORDER BY text: replace every aggregate
                call with its re-aggregated form, validate that what
                remains references only group columns, select aliases
                and condition grammar, or give up (None)."""
                repl: list[str | None] = []

                def _sub(mm: re.Match) -> str:
                    mapped = _map_agg(mm.group(1).lower(), mm.group(2))
                    repl.append(mapped)
                    return f"\x01{len(repl) - 1}\x01"

                t = self._ROUTE_AGG_CALL.sub(_sub, txt)
                if any(r is None for r in repl):
                    return None
                allowed = self._ROUTE_WHERE_KW | {
                    "asc", "desc", "nulls", "first", "last",
                }
                for tok in set(re.findall(r"[A-Za-z_]\w*", t)):
                    if (tok.lower() not in allowed and tok not in groups
                            and tok.lower() not in out_aliases):
                        return None
                return re.sub(
                    r"\x01(\d+)\x01",
                    lambda m2: repl[int(m2.group(1))], t,
                )

            having_out = None
            if having_txt:
                having_out = _map_agg_text(having_txt)
                if having_out is None:
                    continue
            order_out = None
            if order_txt:
                body = re.match(
                    r"(?is)^\s*ORDER\s+BY\s+(.*)$", order_txt.strip()
                ).group(1)
                mapped_body = _map_agg_text(body)
                if mapped_body is None:
                    continue
                order_out = " ORDER BY " + mapped_body

            where_out = where_txt
            if where_txt:
                # each top-level conjunct must be either group-col-only
                # (internal OR fine) or a BUCKET-ALIGNED half-open time
                # bound: `time >= lit` / `time < lit` with the literal
                # exactly on a bucket boundary rewrites to the same
                # bound on bucket_start (every raw row of a bucket is
                # in-range iff the bucket is). `>`, `<=`, BETWEEN and
                # unaligned literals cannot be expressed bucket-exactly
                # and fall through.
                conjs, ok_w = [], True
                for conj in self._split_top_and(where_txt):
                    tp = re.match(
                        r"(?is)^\s*`?(\w+)`?\s*(>=|<)\s*(\x00\d+\x00)\s*$",
                        conj,
                    )
                    if tp and tp.group(1) == time_col:
                        lit = _unmask_literals(tp.group(3), lits)
                        if not (
                            len(lit) >= 2 and lit[0] in "'\""
                            and self._aligned_epoch(lit[1:-1], isecs)
                        ):
                            ok_w = False
                            break
                        conjs.append(
                            f"bucket_start {tp.group(2)} {tp.group(3)}"
                        )
                        continue
                    toks = set(re.findall(r"[A-Za-z_]\w*", conj))
                    if any(
                        t.lower() not in self._ROUTE_WHERE_KW
                        and t not in groups
                        for t in toks
                    ):
                        ok_w = False
                        break
                    conjs.append(conj.strip())
                if not ok_w:
                    continue
                where_out = " AND ".join(conjs)

            view = _view_name("rollup!" + rollup_name)
            rollup.to_df(self.spark).createOrReplaceTempView(view)
            new_q = f"SELECT {', '.join(sel_out)} FROM {view}"
            if where_txt:
                new_q += f" WHERE {where_out}"
            new_q += f" GROUP BY {', '.join(grp_out)}"
            if having_out:
                new_q += f" HAVING {having_out}"
            if order_out:
                new_q += order_out
            if limit_txt:
                new_q += limit_txt
            return _unmask_literals(new_q, lits)
        return None

    def _known(self, ident: str) -> bool:
        base = ident.partition("$")[0].partition("@")[0]
        if "." not in base:
            return False
        try:
            import os

            return os.path.isdir(self.catalog.table_path(base))
        except Exception:
            return False

    def _register(self, ident: str, travel: str, _depth: int = 0) -> str:
        """Register a temp view for an engine table (or catalog view)
        reference and return the temp-view name."""
        name = _view_name(ident + "|" + travel)
        base, _, sysname = ident.partition("$")
        if not sysname and self.catalog.is_view(base):
            if _depth > 10:
                raise RuntimeError(f"view reference cycle at {base}")
            body = self.catalog.get_view(base)["dialects"].get("spark")
            if body is None:
                raise RuntimeError(f"view {base} has no spark dialect")
            df = self.spark.sql(self._rewrite(body, _depth + 1))
            df.createOrReplaceTempView(name)
            return name
        kw: dict[str, Any] = {}
        if travel:
            m = re.match(
                r"(?i)\s*(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|\"[^\"]*\"|[\w.\-]+)",
                travel,
            )
            kind, val = m.group(1).upper(), _literal(m.group(2))
            if kind == "VERSION":
                if isinstance(val, int):
                    kw["snapshot_id"] = val
                elif isinstance(val, str) and re.fullmatch(r"watermark-\d+", val):
                    wmark = int(val.split("-")[1])
                    snap = self.catalog.get_table(base).snapshots.for_watermark(wmark)
                    kw["snapshot_id"] = snap.id
                else:
                    kw["tag"] = str(val)
            else:
                kw["timestamp_ms"] = _ts_millis(val)
        if sysname and sysname.startswith("branch_"):
            # `t$branch_<name>` reads the branch as a plain table —
            # time travel applies to THAT branch (chain-table.md:120)
            df = self.catalog.get_table(base).use_branch(
                sysname[len("branch_"):]
            ).to_df(self.spark, **kw)
        elif sysname:
            df = self.catalog.get_table(base).system_table(self.spark, sysname)
        else:
            t = self.catalog.get_table(base)
            if not kw and t.schema.options.get("metastore.tag-to-partition"):
                # Hive-parity relation (upsert-to-partitioned.md): plain
                # SELECTs see the tag-partitioned view (virtual column =
                # tag name, branch-pruned by a dt filter); travel reads
                # keep addressing the raw table
                df = t.tag_partition_view(self.spark)
            else:
                df = t.to_df(self.spark, **kw)
        df.createOrReplaceTempView(name)
        return name

    def _rewrite(self, q: str, _depth: int = 0) -> str:
        # ALL structure detection below (TVF calls, FROM/JOIN table
        # references, the auto-elision parse) runs over MASKED text so
        # a string literal containing 'FROM db.t' or a comment with a
        # stray quote can never be parsed as SQL structure; literal
        # contents are restored in one pass at the end.
        q, _lits = _mask_literals(q)

        def tvf_sub(m: re.Match) -> str:
            fn = m.group(1).lower()
            args = [
                _literal(_unmask_literals(a, _lits).strip())
                for a in m.group(2).split(",")
            ]
            t = self.catalog.get_table(str(args[0]))
            if fn == "paimon_bucketed_join":
                # zero-shuffle co-located join as a table reference:
                # SELECT ... FROM paimon_bucketed_join('db.a','db.b'[,...,'how'])
                # — the SQL-surface door to the storage-partitioned join
                # (the reference gets this implicitly via DSv2
                # KeyGroupedPartitioning, PaimonScan.scala:139). Three or
                # more table idents chain N-way (join_bucketed_chain). A
                # trailing literal sets `how`: inner/left/right/outer for
                # the two-table form; inner/left for a chain (a right/
                # outer hop would spray NULL base keys across buckets),
                # applied to EVERY hop.
                from flink_table_store_spark.operators.bucketed_join import (
                    join_bucketed,
                    join_bucketed_chain,
                )

                rest = [str(a) for a in args[1:]]
                how = "inner"
                if rest and rest[-1].lower() in ("inner", "left", "right", "outer"):
                    how = rest.pop().lower()
                if len(rest) == 1:
                    df = join_bucketed(
                        self.spark, t, self.catalog.get_table(rest[0]), how=how
                    )
                else:
                    if how not in ("inner", "left"):
                        raise ValueError(
                            f"paimon_bucketed_join: how={how!r} is only valid "
                            "for the two-table form; chains accept inner/left"
                        )
                    df = join_bucketed_chain(
                        self.spark,
                        [t] + [self.catalog.get_table(r) for r in rest],
                        hows=[how] * len(rest),
                    )
            elif fn in (
                "paimon_as_of_join", "paimon_sessionize",
                "paimon_range_join", "paimon_funnel",
            ) and len(args) < {
                "paimon_as_of_join": 4,
                "paimon_sessionize": 3,
                "paimon_range_join": 6,
                "paimon_funnel": 2,
            }[fn]:
                raise ValueError(
                    f"{fn}: too few arguments — see the TVF docstring "
                    "for the positional signature"
                )
            elif fn == "paimon_as_of_join":
                # temporal enrichment as a table reference:
                # SELECT ... FROM paimon_as_of_join('db.l','db.r',
                #   'time_col','by_csv'[,'backward'|'forward'
                #   [,tolerance_seconds]])
                # Routes SQL users onto the union-tag ZERO-join plan
                # (operators/temporal.py) instead of the correlated
                # subquery they'd otherwise write, which Catalyst plans
                # as a per-row theta join. '' by_csv = un-keyed.
                from flink_table_store_spark.operators.temporal import (
                    as_of_join,
                )

                right_t = self.catalog.get_table(str(args[1]))
                by = [c for c in str(args[3]).split(",") if c.strip()]
                direction = str(args[4]) if len(args) > 4 else "backward"
                tol = float(args[5]) if len(args) > 5 else None
                df = as_of_join(
                    t.to_df(self.spark),
                    right_t.to_df(self.spark),
                    time_col=str(args[2]),
                    by=[c.strip() for c in by],
                    direction=direction,
                    tolerance_seconds=tol,
                )
            elif fn == "paimon_sessionize":
                # SELECT ... FROM paimon_sessionize('db.events',
                #   'time_col', gap_seconds[, 'keys_csv'])
                # — the lag-then-cumsum single-shuffle plan with the
                # NULL-timestamp routing already parity-tested in the
                # operator (streaming/stateful.py).
                from flink_table_store_spark.streaming.stateful import (
                    sessionize,
                )

                keys = (
                    [c.strip() for c in str(args[3]).split(",") if c.strip()]
                    if len(args) > 3
                    else None
                )
                df = sessionize(
                    t.to_df(self.spark),
                    time_col=str(args[1]),
                    gap_seconds=int(args[2]),
                    keys=keys,
                )
            elif fn == "paimon_range_join":
                # SELECT ... FROM paimon_range_join('db.l','db.r',
                #   'lo','hi','val', bin_width[, 'extra_keys_csv'])
                # — the fixed-width-bin equi-key plan; a plain SQL
                # BETWEEN join would plan as BroadcastNestedLoop/theta.
                from flink_table_store_spark.operators.temporal import (
                    range_join_binned,
                )

                extra = (
                    [c.strip() for c in str(args[6]).split(",") if c.strip()]
                    if len(args) > 6
                    else None
                )
                df = range_join_binned(
                    t.to_df(self.spark),
                    self.catalog.get_table(str(args[1])).to_df(self.spark),
                    lo_col=str(args[2]),
                    hi_col=str(args[3]),
                    val_col=str(args[4]),
                    bin_width=float(args[5]),
                    extra_keys=extra,
                )
            elif fn == "paimon_funnel":
                # SELECT ... FROM paimon_funnel('db.events','steps_csv'
                #   [,'step_col'[,'time_col'[,'user_col'
                #   [,within_seconds]]]])
                # — ordered earliest-match funnel as a table reference
                # (one row per step-1 user, step_i_ts columns).
                from flink_table_store_spark.operators.temporal import (
                    funnel,
                )

                steps = [s.strip() for s in str(args[1]).split(",") if s.strip()]
                df = funnel(
                    t.to_df(self.spark),
                    steps,
                    step_col=str(args[2]) if len(args) > 2 else "event_type",
                    time_col=str(args[3]) if len(args) > 3 else "ts",
                    user_col=str(args[4]) if len(args) > 4 else "user_id",
                    within_seconds=(
                        float(args[5]) if len(args) > 5 else None
                    ),
                )
            elif fn == "paimon_retention":
                # SELECT ... FROM paimon_retention('db.events'
                #   [,'time_col'[,'user_col'[,'period']]])
                # — the cohort-retention triangle (cohort,
                # periods_since, n_users).
                from flink_table_store_spark.operators.temporal import (
                    retention_cohorts,
                )

                df = retention_cohorts(
                    t.to_df(self.spark),
                    time_col=str(args[1]) if len(args) > 1 else "ts",
                    user_col=str(args[2]) if len(args) > 2 else "user_id",
                    period=str(args[3]) if len(args) > 3 else "week",
                )
            elif fn == "paimon_incremental_query":
                df = t.incremental_read(self.spark, int(args[1]), int(args[2]))
            elif fn == "paimon_incremental_between_timestamp":
                df = t.incremental_read_between_timestamps(
                    self.spark, _ts_millis(args[1]), _ts_millis(args[2])
                )
            else:
                df = t.incremental_read_to_tag(self.spark, str(args[1]))
            # view name from the UNMASKED call text: two TVF calls in
            # one query differing only in literal args must get
            # DIFFERENT views (masked text would collide)
            name = _view_name(_unmask_literals(m.group(0), _lits))
            df.createOrReplaceTempView(name)
            return name

        q = _TVF.sub(tvf_sub, q)
        for _ in range(3):  # support a few ASOF joins per statement
            asof = self._asof_sql(q, _lits)
            if asof is None:
                break
            q = asof
        auto = self._auto_bucketed_join(q, _lits)
        if auto is not None:
            q = auto

        taken_aliases: set[str] = set()

        def ref_sub(m: re.Match) -> str:
            kw, ident, travel = m.group(1), m.group(2), m.group(3)
            raw = ident[1:-1] if ident.startswith("`") else ident
            if raw.lower() in _KEYWORDS or not self._known(raw):
                return m.group(0)
            view = self._register(
                raw, _unmask_literals(travel, _lits).strip(), _depth
            )
            # re-alias the temp view as the table's last name so
            # bare-table-name qualifiers (SELECT par_f.fk FROM db.par_f)
            # keep resolving — unless the query supplies its own alias
            # right after the reference, or the name is already used
            nxt = re.match(
                r"\s+(?:AS\s+)?([A-Za-z_]\w*|`[^`]+`)", m.string[m.end():]
            )
            has_alias = nxt is not None and (
                nxt.group(1).startswith("`")
                or nxt.group(1).upper() not in _SQL_CLAUSE_KW
            )
            last = raw.partition("$")[0].partition("@")[0].rpartition(".")[2]
            if has_alias or not last or last.lower() in taken_aliases:
                return f"{kw} {view}"
            taken_aliases.add(last.lower())
            return f"{kw} {view} AS {last}"

        return _unmask_literals(_REF.sub(ref_sub, q), _lits)

    def _auto_bucketed_join(self, q: str, lits: list[str]) -> str | None:
        """Catalyst-automatic bucketed-join elision at the SQL surface:
        a plain ``FROM a JOIN b ON a.k = b.k`` between CO-BUCKETED
        engine tables silently routes through ``join_bucketed`` (zero
        Exchange) instead of paying the shuffle, and a chain of such
        JOINs routes through ``join_bucketed_chain`` — the reference
        gets this implicitly from DSv2 KeyGroupedPartitioning
        (PaimonScan.scala:139-141, sql/BucketedTableQueryTest.scala).
        Strictly scoped: one FROM whose every JOIN is a parsed hop, no
        travel/system/view refs, each ON exactly the base-vs-new-table
        bucket-key equalities (an earlier INNER side's key may stand in
        for the base key), no cross-side column-name clashes, no
        ``alias.*`` expansion, and no reference to key columns a
        non-inner join would NULL on unmatched rows. Anything else
        returns None — the ordinary (shuffle) path is the fallback,
        never an error.

        ``q`` arrives MASKED (see ``_rewrite``): string literals and
        comments are ``\\x00<i>\\x00`` placeholders indexing ``lits``,
        so every structural regex here is literal-safe by construction;
        the returned rewrite stays masked (the caller unmasks once)."""
        if len(re.findall(r"(?i)\bFROM\b", q)) != 1:
            return None
        mb = _FROM_BASE.search(q)
        if not mb:
            return None
        idents, aliases = [mb.group(1)], [mb.group(2)]
        hows, conds = [], []
        pos = mb.end()
        while mh := _JOIN_HOP.match(q, pos):
            jl = mh.group(1).lower()
            hows.append(
                "left" if jl.startswith("left")
                else "right" if jl.startswith("right")
                else "outer" if jl.startswith("full")
                else "inner"
            )
            idents.append(mh.group(2))
            aliases.append(mh.group(3))
            conds.append(mh.group(4))
            pos = mh.end()
        n_hops = len(hows)
        # every JOIN in the query must be one of OUR hops (a leftover
        # JOIN means subqueries or shapes the parse didn't cover)
        if n_hops == 0 or len(re.findall(r"(?i)\bJOIN\b", q)) != n_hops:
            return None
        if n_hops > 1 and any(h not in ("inner", "left") for h in hows):
            return None  # chain hops support inner/left only
        for ident in idents:
            if "$" in ident or "@" in ident or not self._known(ident):
                return None
            if self.catalog.is_view(ident):
                return None
        aliases = [a or t.rpartition(".")[2] for a, t in zip(aliases, idents)]
        if len({a.lower() for a in aliases}) != len(aliases):
            return None
        from flink_table_store_spark.operators.bucketed_join import (
            join_bucketed,
            join_bucketed_chain,
        )
        from flink_table_store_spark.write import bucket_keys

        tables = [self.catalog.get_table(t) for t in idents]
        schemas = [t.schema for t in tables]
        if schemas[0].num_buckets() <= 0 or len(
            {s.num_buckets() for s in schemas}
        ) != 1:
            return None
        keys = [bucket_keys(s) for s in schemas]
        base_keys = keys[0]
        if not base_keys or any(len(k) != len(base_keys) for k in keys):
            return None
        # identifier resolution is case-insensitive, like Spark's
        fieldmaps = [
            {f.lower(): f for f in s.field_names()} for s in schemas
        ]

        def side(ref: str) -> tuple[int, str] | None:
            """Resolve alias-qualified ref to (table index, schema-cased
            column)."""
            ref = ref.strip().strip("`")
            if "." not in ref:
                return None  # unqualified — resolved separately
            qual, _, col = ref.rpartition(".")
            if not re.fullmatch(r"\w+", col) or not re.fullmatch(r"[\w.]+", qual):
                return None
            for i, (a, t) in enumerate(zip(aliases, idents)):
                if qual.lower() in (a.lower(), t.lower()):
                    actual = fieldmaps[i].get(col.lower())
                    return None if actual is None else (i, actual)
            return None

        # each hop's ON must be exactly the equalities pairing the BASE
        # bucket keys with the new table's bucket keys. An equality may
        # reference an earlier INNER side's key instead of the base (the
        # chain has already established base.key == that key); a LEFT
        # side's key can be NULL, so that reference keeps the shuffle path
        for hop, cond in enumerate(conds, start=1):
            pairs: set[tuple[str, str]] = set()
            for piece in _split_top_and(cond):
                pm = re.match(r"\s*(`?[\w.]+`?)\s*=\s*(`?[\w.]+`?)\s*$", piece)
                if not pm:
                    return None
                sx, sy = side(pm.group(1)), side(pm.group(2))
                if sx is None or sy is None:
                    return None
                if sx[0] == hop:
                    sx, sy = sy, sx
                if sy[0] != hop or sx[0] >= hop:
                    return None
                if sx[0] > 0:
                    # prior-side key: map to the base key it equals
                    if hows[sx[0] - 1] != "inner" or sx[1] not in keys[sx[0]]:
                        return None
                    sx = (0, base_keys[keys[sx[0]].index(sx[1])])
                pairs.add((sx[1], sy[1]))
            if pairs != set(zip(base_keys, keys[hop])):
                return None
        # Output-column layout, mirroring join_bucketed/_chain's rename
        # bookkeeping: a side's key column is KEPT in the output when its
        # name is free (so b.k resolves naturally and SELECT * is
        # faithful), DROPPED on a name collision; any non-key name clash
        # can't be rewritten faithfully — leave those to the ordinary
        # path. All name accounting is case-insensitive.
        taken = {c.lower() for c in schemas[0].field_names()}
        side_cols: list[list[str] | None] = [None]
        dropped: list[list[str]] = [[]]  # per side, dropped key cols
        for s, k in zip(schemas[1:], keys[1:]):
            drops = []
            for c in s.field_names():
                if c in k:
                    if c.lower() in taken:
                        drops.append(c)
                    else:
                        taken.add(c.lower())
                    continue
                if c.lower() in taken:
                    return None
                taken.add(c.lower())
            side_cols.append([c for c in s.field_names() if c not in drops])
            dropped.append(drops)
        any_dropped = any(dropped)
        quals = {a.lower() for a in aliases} | {t.lower() for t in idents}
        qual_pat = "|".join(re.escape(x) for x in quals)
        if re.search(r"(?i)(?:" + qual_pat + r")\.\*", q):
            return None
        # bare SELECT * is faithful only when every side key survived.
        # Literals/comments are placeholders in the masked text; a run
        # of them between SELECT (or a comma) and * — e.g. a /*+ hint */
        # — must not hide the star. (A placeholder run can also precede
        # a MULTIPLICATION star — ``SELECT 'x', a * b`` — which
        # over-detects has_star; that only DISABLES a push, never
        # corrupts one.)
        has_star = re.search(
            r"(?i)(?:\bselect(?:\s+distinct)?|,)\s*(?:\x00\d+\x00\s*)*\*", q
        ) is not None
        if any_dropped and has_star:
            return None
        # DROPPED keys: after an inner hop they equal the base key, so
        # references are REWRITTEN (only name-preserving rewrites — the
        # dropped key must share the base key's name, which is the
        # common collision); anything else keeps the shuffle path
        rest = q[: mb.start()] + q[pos:]

        def _refs_cols(i: int, kcols: list[str]) -> bool:
            pat = (
                r"(?i)(?:" + re.escape(aliases[i]) + "|" + re.escape(idents[i])
                + r")\.`?(?:" + "|".join(re.escape(k) for k in kcols) + r")`?\b"
            )
            return re.search(pat, rest) is not None

        renames = []
        for i in range(1, n_hops + 1):
            if not dropped[i]:
                continue
            renamable, stuck = [], []
            for rk in dropped[i]:
                lk = base_keys[keys[i].index(rk)]
                if hows[i - 1] == "inner" and rk.lower() == lk.lower():
                    renamable.append((lk, rk))
                else:
                    stuck.append(rk)
            if stuck and _refs_cols(i, stuck):
                return None
            renames += [
                (
                    re.compile(
                        r"(?i)\b(?:" + re.escape(aliases[i]) + "|"
                        + re.escape(idents[i]) + r")\."
                        r"`?" + re.escape(rk) + r"`?\b"
                    ),
                    lk,
                )
                for lk, rk in renamable
            ]
        # WHERE pushdown (IO only — the WHERE clause STAYS in the
        # rewritten query): single-side conjuncts prune that side's
        # files with the normal scan's partition/stats rules. Safe only
        # for sides never NULL-extended by a join (a pruned row must be
        # one the retained WHERE would drop anyway; NULL-extension could
        # instead ADD rows, e.g. under IS NULL predicates).
        filters: list = [None] * (n_hops + 1)
        wm = re.match(
            r"(?is)^\s*WHERE\s+(.*?)(?=\s+(?:GROUP|ORDER|HAVING|LIMIT|UNION)\b|\s*$)",
            q[pos:],
        )
        if wm:
            def _pushable(i: int) -> bool:
                if i == 0:
                    return n_hops > 1 or hows[0] in ("inner", "left")
                return hows[i - 1] == "inner" and (n_hops > 1 or hows[0] == "inner")

            for piece in _split_top_and(wm.group(1)):
                sides_hit = set()
                ok = True
                # qualifier must start with a letter — don't mistake a
                # float literal's 1.5 for a qualified reference
                for qm in re.finditer(r"`?[A-Za-z_][\w.]*`?\.`?\w+`?", piece):
                    sd = side(qm.group(0))
                    if sd is None:
                        ok = False
                        break
                    sides_hit.add(sd[0])
                if not ok or len(sides_hit) != 1:
                    continue
                i = sides_hit.pop()
                if not _pushable(i):
                    continue
                # literal VALUES matter to the predicate — unmask the
                # conjunct before parsing (qualifier stripping is
                # itself literal-protected)
                pred = parse_condition(
                    _strip_qualifiers(_unmask_literals(piece, lits), quals)
                )
                flds = pred.fields() if pred is not None else None
                if flds is None or not flds <= set(schemas[i].field_names()):
                    continue
                filters[i] = pred if filters[i] is None else P.and_(filters[i], pred)
        # Column pruning into the bucket tasks: unless the query pulls
        # SELECT *, restrict each side to the columns the query's text
        # actually references (token ∩ field names — over-inclusion is
        # safe; under-inclusion impossible for \w-named columns: every
        # reference contains the bare column token, and tables with any
        # non-\w column name skip pruning entirely). Join keys always
        # stay readable; the view then reads only the needed columns.
        prunable = all(
            re.fullmatch(r"\w+", c) for s in schemas for c in s.field_names()
        )
        if not has_star and prunable:
            # `rest` is masked: literal contents contribute no tokens.
            # Comment tokens ARE included (from the stash) — a /*+
            # REPARTITION(col) */ hint survives unmasking and Catalyst
            # reads it, so a column it names must stay unpruned;
            # over-inclusion is always safe here.
            comment_text = " ".join(
                c for c in lits if c.startswith(("--", "/*"))
            )
            tokens = {
                t.lower()
                for t in re.findall(r"[A-Za-z_]\w*", rest + " " + comment_text)
            }
            base_k_low = {k.lower() for k in base_keys}
            left_cols_sel = [
                c
                for c in schemas[0].field_names()
                if c.lower() in tokens or c.lower() in base_k_low
            ]
            for i in range(1, n_hops + 1):
                k_low = {k.lower() for k in keys[i]}
                side_cols[i] = [
                    c
                    for c in side_cols[i]
                    if c.lower() in tokens or c.lower() in k_low
                ]
        else:
            left_cols_sel = None
        # aggregations-after-join: GROUP BY ⊇ the base bucket keys means
        # every group lives wholly in one bucket, so the aggregation
        # finalizes INSIDE the bucket tasks and the whole query plans
        # with zero Exchange (the other half of the reference's
        # KeyGroupedPartitioning elision)
        pushed = None
        if n_hops == 1 and hows[0] in ("inner", "left"):
            pushed = self._parse_agg_pushdown(
                q[: mb.start()], q[pos:], side, base_keys, keys, hows, schemas
            )
        try:
            if pushed is not None:
                group_cols, agg_map, sel_exprs, tail, having = pushed
                df = join_bucketed(
                    self.spark, tables[0], tables[1], how=hows[0],
                    left_cols=left_cols_sel, right_cols=side_cols[1],
                    group_by=group_cols, agg=agg_map,
                )
            elif n_hops == 1:
                df = join_bucketed(
                    self.spark, tables[0], tables[1], how=hows[0],
                    left_cols=left_cols_sel, right_cols=side_cols[1],
                    filters=(filters[0], filters[1]),
                )
            else:
                df = join_bucketed_chain(
                    self.spark, tables, hows=hows,
                    cols=[left_cols_sel] + side_cols[1:], filters=filters,
                )
        except ValueError:
            return None  # engine/agg-function combination not elidable
        name = _view_name(
            "autobj|" + "|".join(idents) + "|" + "|".join(hows)
            + "|" + ",".join(left_cols_sel or [])
            + "|" + ";".join(",".join(c or []) for c in side_cols[1:])
        )
        df.createOrReplaceTempView(name)
        if pushed is not None:
            # HAVING over finalized in-task aggregates is a plain WHERE
            # on the view (aggregate calls were rewritten to aliases)
            where = f" WHERE {having}" if having else ""
            new_q = f"SELECT {', '.join(sel_exprs)} FROM {name}{where}{tail}"
        else:
            new_q = q[: mb.start()] + f"FROM {name}" + q[pos:]
        return _strip_qualifiers(new_q, quals, renames)

    _AGG_CALL = re.compile(
        r"(?is)\b(count|sum|min|max|avg|mean)\s*\(\s*(\*|1|`?[\w.]+`?)\s*\)"
    )
    _HAVING_KW = {
        "and", "or", "not", "in", "between", "like", "is", "null",
        "true", "false",
    }

    def _parse_agg_pushdown(self, prefix, suffix, side, base_keys, keys, hows, schemas):
        """Recognize ``SELECT <group cols + aggs> ... GROUP BY <cols ⊇
        base keys> [HAVING <agg/alias/group-col expr>] [ORDER BY simple]
        [LIMIT n]`` with no WHERE/DISTINCT; return (group_by, agg,
        select exprs, tail, having) for ``join_bucketed``'s in-task
        aggregation, or None to keep the join-then-Exchange plan (still
        elided, just not agg-pushed). HAVING is sound because the
        in-task aggregates are FINAL — it rewrites to a plain filter
        over the view (aggregate calls replace with their aliases,
        adding hidden aggregates when the SELECT lacks them)."""
        pm = re.match(r"(?is)^\s*SELECT\s+(?!DISTINCT\b)(.*?)\s*$", prefix)
        # prefix/suffix arrive MASKED from _auto_bucketed_join — a
        # literal containing ' ORDER BY ...' (or an aggregate-call-
        # shaped text) cannot be split into the tail or rewritten by
        # the HAVING substitutions; placeholders ride through into the
        # returned pieces and the CALLER's final unmask restores them
        sm = re.match(
            r"(?is)^\s*GROUP\s+BY\s+(.+?)"
            r"(?:\s+HAVING\s+(.+?))?"
            r"(\s+ORDER\s+BY\s+[^()]+?)?(\s+LIMIT\s+\d+)?\s*$",
            suffix,
        )
        if not pm or not sm:
            return None
        _INT_T = ("tinyint", "smallint", "int", "integer", "bigint", "long")
        _NUM_T = _INT_T + ("float", "double")

        def resolve(ref: str) -> tuple[str, str] | None:
            """ref -> (view column, spark type)."""
            sd = side(ref)
            if sd is None:
                return None
            i, col = sd
            typ = schemas[i].field(col).type.lower()
            if i > 0 and col in keys[i]:
                # a side key reference on an inner hop equals the base
                # key; grouping/aggregating by the base key is identical
                # (and also covers the dropped-key case)
                if hows[i - 1] != "inner":
                    return None
                return base_keys[keys[i].index(col)], typ
            return col, typ

        group_cols: list[str] = []
        for piece in sm.group(1).split(","):
            rc = resolve(piece)
            if rc is None:
                return None
            if rc[0] not in group_cols:
                group_cols.append(rc[0])
        if not set(base_keys) <= set(group_cols):
            return None
        def agg_spec(func_raw: str, src: str) -> tuple[str, str] | None:
            """(func, source view column) for a pushable aggregate call,
            or None when the call can't finalize in-task."""
            func = {"avg": "mean"}.get(func_raw.lower(), func_raw.lower())
            if func == "count" and src in ("*", "1"):
                return func, ""  # in-task row count
            if src in ("*", "1"):
                return None
            rc = resolve(src)
            if rc is None:
                return None
            src_col, src_t = rc
            base_t = src_t.split("(")[0]
            # count(col) = in-task non-null count, any type
            if func == "sum" and base_t not in _NUM_T + ("decimal",):
                # decimal folds exactly (object-dtype Decimal in the
                # task); other non-numeric sums differ from ANSI casts
                return None
            if func == "mean" and base_t not in _NUM_T:
                return None
            if func in ("min", "max") and base_t not in _NUM_T + (
                "string", "varchar", "char", "date", "timestamp",
                "timestamp_ntz", "boolean", "decimal",
            ):
                return None
            return func, src_col

        agg_map: dict[str, tuple[str, str]] = {}
        sel_exprs: list[str] = []
        for item in _split_depth0_parens(pm.group(1)):
            item = item.strip()
            am = re.match(
                r"(?is)^(count|sum|min|max|avg|mean)\s*\(\s*"
                r"(\*|1|`?[\w.]+`?)\s*\)\s+AS\s+`?(\w+)`?$",
                item,
            )
            if am:
                spec = agg_spec(am.group(1), am.group(2))
                if spec is None:
                    return None
                alias = am.group(3)
                if alias in agg_map or alias in group_cols:
                    return None
                agg_map[alias] = spec
                sel_exprs.append(alias)
                continue
            cm = re.match(r"(?is)^(`?([\w.]+)`?)(?:\s+AS\s+`?(\w+)`?)?$", item)
            if not cm:
                return None
            rc = resolve(cm.group(1))
            if rc is None or rc[0] not in group_cols:
                return None
            c = rc[0]
            out_name = cm.group(3) or cm.group(2).rpartition(".")[2]
            sel_exprs.append(c if out_name == c else f"{c} AS {out_name}")
        if not agg_map:
            return None  # plain grouped projection — not worth the push
        having = None
        if sm.group(2):
            # rewrite over the MASKED text (literal contents cannot be
            # mistaken for aggregate calls or identifiers)
            having = self._rewrite_having(
                sm.group(2), agg_spec, agg_map, group_cols, resolve
            )
            if having is None:
                return None  # unparseable HAVING: keep the shuffle plan
        tail = (sm.group(3) or "") + (sm.group(4) or "")
        return group_cols, agg_map, sel_exprs, tail, having

    def _rewrite_having(self, hx, agg_spec, agg_map, group_cols, resolve):
        """HAVING expr → a filter over the pushed view: aggregate calls
        become their SELECT aliases (hidden ``__h<n>`` aggregates are
        added when absent); every remaining identifier must be a group
        column, an aggregate alias, or a literal/boolean keyword — else
        None (fall back to the Spark HAVING over the shuffle plan)."""
        if re.search(r"(?i)\bselect\b", hx):
            return None  # subqueries: out of scope
        bad = False

        def repl(m) -> str:
            nonlocal bad
            spec = agg_spec(m.group(1), m.group(2))
            if spec is None:
                bad = True
                return m.group(0)
            for a, s in agg_map.items():
                if s == spec:
                    return a
            n = len(agg_map)
            while f"__h{n}" in agg_map:  # a user alias may be named __hN
                n += 1
            alias = f"__h{n}"
            agg_map[alias] = spec
            return alias

        parts = _QUOTED.split(hx)
        out = []
        for p in parts:
            if p[:1] in ("'", '"'):
                out.append(p)
                continue
            p = self._AGG_CALL.sub(repl, p)
            for tok in re.findall(r"[A-Za-z_][\w.]*", p):
                if tok.lower() in self._HAVING_KW or tok in agg_map:
                    continue
                rc = resolve(tok)
                if rc is None or rc[0] not in group_cols:
                    return None
                if rc[0] != tok:
                    p = re.sub(rf"\b{re.escape(tok)}\b", rc[0], p)
            out.append(p)
        return None if bad else "".join(out)

    # --- CREATE / DROP / SHOW / DESCRIBE DDL --------------------------------

    def _create(self, q: str):
        """CREATE TABLE [IF NOT EXISTS] db.t (col type, ...[, PRIMARY
        KEY (a, b)]) [PARTITIONED BY (c, ...)] [TBLPROPERTIES
        ('k'='v', ...)] — the reference's Spark DDL shape."""
        hm = re.match(r"(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(", q)
        if not hm:
            return self._ctas(q)
        if_not_exists, ident = hm.group(1), hm.group(2)
        # balanced-paren scan for the column list (types and PRIMARY KEY
        # contain parens/commas of their own)
        start = hm.end()
        depth, i = 1, start
        while i < len(q) and depth:
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parentheses in CREATE TABLE: {q}")
        cols_s, rest = q[start : i - 1], q[i:]
        part_s, props_s, _leftover = _parse_clause_tail(rest)
        cols, pks = [], []
        for piece in _split_depth0_parens(cols_s):
            piece = piece.strip()
            if km := re.match(r"(?is)PRIMARY\s+KEY\s*\(([^)]*)\)", piece):
                pks = [c.strip().strip("`") for c in km.group(1).split(",")]
                continue
            name, _, typ = piece.partition(" ")
            if not typ.strip():
                raise ValueError(f"column needs 'name type': {piece!r}")
            cols.append(f"{name.strip('`')} {typ.strip()}")
        options = _parse_props(props_s)
        # primary keys also via TBLPROPERTIES ('primary-key'='a,b') —
        # the reference's Spark DDL property form (same as the CTAS
        # path). Popped unconditionally so the option never persists as
        # a stale table property; a CONFLICTING spec is an error, not a
        # silent pick
        prop_pks = [
            c.strip().strip("`")
            for c in options.pop("primary-key", "").split(",")
            if c.strip()
        ]
        if pks and prop_pks and pks != prop_pks:
            raise ValueError(
                f"PRIMARY KEY clause {pks} conflicts with "
                f"TBLPROPERTIES primary-key {prop_pks}"
            )
        pks = pks or prop_pks
        parts = [c.strip().strip("`") for c in part_s.split(",")] if part_s else None
        return self.catalog.create_table(
            ident,
            ", ".join(cols),
            partition_keys=parts,
            primary_keys=pks or None,
            options=options,
            ignore_if_exists=bool(if_not_exists),
        )

    def _drop(self, q: str):
        m = re.match(r"(?is)DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse DROP TABLE: {q}")
        self.catalog.drop_table(m.group(2), ignore_if_not_exists=bool(m.group(1)))
        return None

    def _show_tables(self, q: str):
        m = re.match(
            r"(?is)SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+([\w]+))?"
            r"(?:\s+LIKE\s+'([^']*)')?\s*$",
            q,
        )
        if not m:
            raise ValueError(f"cannot parse SHOW TABLES: {q}")
        dbs = [m.group(1)] if m.group(1) else self.catalog.list_databases()
        rows = [(db, t) for db in dbs for t in self.catalog.list_tables(db)]
        if m.group(2) is not None:
            pat = sql_like_pattern(m.group(2), re.IGNORECASE)
            rows = [(db, t) for db, t in rows if pat.match(t)]
        return self.spark.createDataFrame(rows or [], "database string, tableName string")

    def _describe(self, q: str):
        m = re.match(
            r"(?is)DESC(?:RIBE)?\s+(?:(EXTENDED|FORMATTED)\s+)?(?:TABLE\s+)?([\w.]+)\s*$",
            q,
        )
        if not m:
            raise ValueError(f"cannot parse DESCRIBE: {q}")
        t = self.catalog.get_table(m.group(2))
        s = t.schema
        rows = [(f.name, f.type, f.nullable) for f in s.fields]
        if m.group(1):
            rows += [("", "", None)]
            if s.partition_keys:
                rows.append(("# Partitioning", ", ".join(s.partition_keys), None))
            if s.primary_keys:
                rows.append(("# Primary Key", ", ".join(s.primary_keys), None))
            rows += [(f"# {k}", str(v), None) for k, v in sorted(s.options.items())]
        return self.spark.createDataFrame(rows, "col_name string, data_type string, nullable boolean")

    def _show_tblproperties(self, q: str):
        m = re.match(
            r"(?is)SHOW\s+TBLPROPERTIES\s+([\w.]+)(?:\s*\(\s*'([^']*)'\s*\))?\s*$", q
        )
        if not m:
            raise ValueError(f"cannot parse SHOW TBLPROPERTIES: {q}")
        opts = self.catalog.get_table(m.group(1)).schema.options
        if m.group(2) is not None:
            rows = [(m.group(2), opts.get(m.group(2)))]
        else:
            rows = sorted(opts.items())
        return self.spark.createDataFrame(rows or [], "key string, value string")

    def _show_partitions(self, q: str):
        m = re.match(r"(?is)SHOW\s+PARTITIONS\s+([\w.]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse SHOW PARTITIONS: {q}")
        t = self.catalog.get_table(m.group(1))
        df = t.system_table(self.spark, "partitions")
        # Spark's SHOW PARTITIONS shape: one 'partition' string column
        keys = t.schema.partition_keys
        if not keys:
            raise ValueError(f"{m.group(1)} is not partitioned")
        # the $partitions 'partition' column is a JSON string
        expr = F.concat_ws(
            "/",
            *[
                F.concat(
                    F.lit(f"{k}="), F.get_json_object(F.col("partition"), f"$.{k}")
                )
                for k in keys
            ],
        )
        return df.select(expr.alias("partition")).distinct().orderBy("partition")

    def _ctas(self, q: str):
        """CREATE TABLE [IF NOT EXISTS] db.t [PARTITIONED BY (...)]
        [TBLPROPERTIES (...)] AS SELECT ... — schema comes from the
        query; primary keys via TBLPROPERTIES('primary-key'='a,b'), the
        reference's Spark CTAS convention (paimon-spark
        SparkCatalog.createTable + DDLTestBase CTAS cases)."""
        hm = re.match(r"(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*(.*)$", q)
        if not hm:
            raise ValueError(f"cannot parse CREATE TABLE: {q}")
        if_not_exists, ident, tail = hm.groups()
        # split at the first AS SELECT OUTSIDE string literals and
        # comments (a quoted property value may contain 'as select')
        spans = [m.span() for m in _PROTECTED.finditer(tail)]
        for m in re.finditer(r"(?is)\bAS\s+(SELECT\b)", tail):
            if not any(s <= m.start() < e for s, e in spans):
                middle, select = tail[: m.start()], tail[m.start(1) :]
                break
        else:
            raise ValueError(f"cannot parse CREATE TABLE: {q}")
        part_s, props_s, leftover = _parse_clause_tail(middle)
        if leftover:
            raise ValueError(f"unsupported CREATE TABLE clause: {leftover!r}")
        options = _parse_props(props_s)
        pks = [
            c.strip()
            for c in options.pop("primary-key", "").split(",")
            if c.strip()
        ]
        # CTAS IF NOT EXISTS on ANY existing table is a no-op (never a
        # write — the existing table's schema, not the query's, governs)
        try:
            existing = self.catalog.get_table(ident)
        except Exception:
            existing = None
        if existing is not None:
            if if_not_exists:
                return existing
            raise RuntimeError(f"table {ident} already exists")
        df = self.spark.sql(self._rewrite(select))
        t = self.catalog.create_table(
            ident,
            df.schema,
            partition_keys=(
                [c.strip().strip("`") for c in part_s.split(",")] if part_s else None
            ),
            primary_keys=pks or None,
            options=options,
        )
        t.write(df)
        return t.refresh()

    def _create_db(self, q: str):
        m = re.match(r"(?is)CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?([\w]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse CREATE DATABASE: {q}")
        self.catalog.create_database(m.group(2), ignore_if_exists=bool(m.group(1)))
        return None

    def _drop_db(self, q: str):
        m = re.match(
            r"(?is)DROP\s+DATABASE\s+(IF\s+EXISTS\s+)?([\w]+)\s*(CASCADE)?\s*$", q
        )
        if not m:
            raise ValueError(f"cannot parse DROP DATABASE: {q}")
        self.catalog.drop_database(
            m.group(2),
            ignore_if_not_exists=bool(m.group(1)),
            cascade=bool(m.group(3)),
        )
        return None

    def _create_view(self, q: str):
        m = re.match(
            r"(?is)CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?"
            r"([\w.]+)\s+AS\s+(.*)$",
            q,
        )
        if not m:
            raise ValueError(f"cannot parse CREATE VIEW: {q}")
        if m.group(2) and self.catalog.is_view(m.group(3)):
            return None  # IF NOT EXISTS preserves the existing definition
        self.catalog.create_view(
            m.group(3),
            m.group(4).strip(),
            ignore_if_exists=bool(m.group(1)),
        )
        return None

    def _drop_view(self, q: str):
        m = re.match(r"(?is)DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse DROP VIEW: {q}")
        self.catalog.drop_view(m.group(2), ignore_if_not_exists=bool(m.group(1)))
        return None

    def _show_databases(self, q: str):
        m = re.match(r"(?is)SHOW\s+DATABASES(?:\s+LIKE\s+'([^']*)')?\s*$", q)
        if not m:
            raise ValueError(f"cannot parse SHOW DATABASES: {q}")
        dbs = self.catalog.list_databases()
        if m.group(1) is not None:
            pat = sql_like_pattern(m.group(1), re.IGNORECASE)
            dbs = [d for d in dbs if pat.match(d)]
        return self.spark.createDataFrame([(d,) for d in dbs] or [], "namespace string")

    def _show_views(self, q: str):
        m = re.match(r"(?is)SHOW\s+VIEWS(?:\s+(?:IN|FROM)\s+([\w]+))?\s*$", q)
        if not m:
            raise ValueError(f"cannot parse SHOW VIEWS: {q}")
        dbs = [m.group(1)] if m.group(1) else self.catalog.list_databases()
        rows = [(db, v) for db in dbs for v in self.catalog.list_views(db)]
        return self.spark.createDataFrame(rows or [], "namespace string, viewName string")

    def _show_create(self, q: str):
        m = re.match(r"(?is)SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse SHOW CREATE TABLE: {q}")
        s = self.catalog.get_table(m.group(1)).schema
        cols = [
            f"  `{f.name}` {f.type}" + ("" if f.nullable else " NOT NULL")
            for f in s.fields
        ]
        if s.primary_keys:
            cols.append("  PRIMARY KEY (" + ", ".join(s.primary_keys) + ")")
        ddl = f"CREATE TABLE {m.group(1)} (\n" + ",\n".join(cols) + "\n)"
        if s.partition_keys:
            ddl += " PARTITIONED BY (" + ", ".join(s.partition_keys) + ")"
        if s.options:
            props = ", ".join(f"'{k}'='{v}'" for k, v in sorted(s.options.items()))
            ddl += f" TBLPROPERTIES ({props})"
        return self.spark.createDataFrame([(ddl,)], "createtab_stmt string")

    def _analyze(self, q: str):
        """ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b | FOR
        ALL COLUMNS] — persists row count + per-column ndv/nulls/min/
        max/avg_len (PaimonAnalyzeTableColumnCommand)."""
        m = re.match(
            r"(?is)ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS"
            r"(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s+(.*?)))?\s*$",
            q,
        )
        if not m:
            raise ValueError(f"cannot parse ANALYZE TABLE: {q}")
        cols = None
        if m.group(3):
            cols = [c.strip().strip("`") for c in m.group(3).split(",")]
        self.catalog.get_table(m.group(1)).analyze(self.spark, columns=cols)
        return None

    def _truncate(self, q: str):
        m = re.match(r"(?is)TRUNCATE\s+TABLE\s+([\w.]+)\s*$", q)
        if not m:
            raise ValueError(f"cannot parse TRUNCATE TABLE: {q}")
        self.catalog.get_table(m.group(1)).purge_files()
        return None

    # --- ALTER TABLE DDL -> schema evolution (SchemaChange.java ops) ---

    def _alter(self, q: str):
        """ALTER TABLE <t> ADD COLUMN[S] a type[, ...] | DROP COLUMN[S]
        a[, ...] | RENAME COLUMN a TO b | ALTER COLUMN a TYPE t |
        SET/UNSET TBLPROPERTIES (...). Column names may be dotted
        struct-leaf paths at any depth (nested field ids)."""
        m = re.match(r"(?is)ALTER\s+TABLE\s+([\w.]+)\s+(.*)$", q)
        if not m:
            raise ValueError(f"cannot parse ALTER statement: {q}")
        ident, body = m.group(1), m.group(2).strip()
        t = self.catalog.get_table(ident)
        changes: list[dict[str, Any]] = []
        if am := re.match(r"(?is)ADD\s+COLUMNS?\s+(.*)$", body):
            # _split_depth0_parens (not a naive split): parameterized
            # types like decimal(10,2) carry commas and parens
            for piece in _split_depth0_parens(_strip_wrap_parens(am.group(1))):
                name, _, typ = piece.strip().partition(" ")
                if not name or not typ.strip():
                    raise ValueError(f"ADD COLUMN needs 'name type': {piece!r}")
                changes.append(
                    {"action": "add_column", "name": name.strip("`"), "type": typ.strip()}
                )
        elif dm := re.match(r"(?is)DROP\s+COLUMNS?\s+(.*)$", body):
            for piece in _strip_wrap_parens(dm.group(1)).split(","):
                changes.append({"action": "drop_column", "name": piece.strip().strip("`")})
        elif tm := re.match(r"(?is)RENAME\s+TO\s+([\w.]+)\s*$", body):
            dst = tm.group(1)
            if "." not in dst:
                dst = (ident.rpartition(".")[0] or "default") + "." + dst
            self.catalog.rename_table(ident, dst)
            return None
        elif rm := re.match(
            r"(?is)RENAME\s+COLUMN\s+`?([\w.]+)`?\s+TO\s+`?(\w+)`?\s*$", body
        ):
            changes.append(
                {"action": "rename_column", "name": rm.group(1), "new_name": rm.group(2)}
            )
        elif dmD := re.match(
            r"(?is)(?:ALTER|CHANGE)\s+COLUMN\s+`?([\w.]+)`?\s+SET\s+DEFAULT\s+(.+)$",
            body,
        ):
            changes.append(
                {
                    "action": "update_column_default",
                    "name": dmD.group(1),
                    "value": dmD.group(2).strip(),
                }
            )
        elif re.match(r"(?is)(?:ALTER|CHANGE)\s+COLUMN\s+`?[\w.]+`?\s+DROP\s+DEFAULT\s*$", body):
            name = re.match(
                r"(?is)(?:ALTER|CHANGE)\s+COLUMN\s+`?([\w.]+)`?", body
            ).group(1)
            changes.append(
                {"action": "update_column_default", "name": name, "value": None}
            )
        elif cm := re.match(
            r"(?is)(?:ALTER|CHANGE)\s+COLUMN\s+`?([\w.]+)`?\s+TYPE\s+(.+)$", body
        ):
            changes.append(
                {"action": "update_column_type", "name": cm.group(1), "type": cm.group(2).strip()}
            )
        elif sm := re.match(r"(?is)SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", body):
            # masked split: quoted values may contain ',' '=' ')'
            mp, plits = _mask_literals(sm.group(1))
            for piece in _split_commas(mp):
                k, _, v = piece.partition("=")
                changes.append(
                    {
                        "action": "set_option",
                        "key": str(_literal(_unmask_literals(k, plits).strip())),
                        "value": _literal(_unmask_literals(v, plits).strip()),
                    }
                )
        elif um := re.match(r"(?is)UNSET\s+TBLPROPERTIES\s*\((.*)\)\s*$", body):
            for piece in um.group(1).split(","):
                changes.append({"action": "remove_option", "key": str(_literal(piece))})
        else:
            raise ValueError(f"unsupported ALTER TABLE clause: {body}")
        t.evolve_schema(changes)
        return None

    # --- CALL sys.<procedure>(...) ---

    # positional parameter order for procedures the reference's docs
    # invoke positionally (CALL sys.create_branch('db.t', 'b') —
    # chain-table.md:74-76, manage-branches.md, manage-tags.md);
    # everything else: first positional = table, rest must be named
    _CALL_POSITIONAL: dict[str, list[str]] = {
        "create_branch": ["table", "branch", "snapshot_id"],
        "delete_branch": ["table", "branch"],
        "fast_forward": ["table", "branch"],
        "create_tag": ["table", "tag", "snapshot_id"],
        "delete_tag": ["table", "tag"],
        "rename_tag": ["table", "tag", "target_tag"],
        "replace_tag": ["table", "tag", "snapshot_id"],
        "chain_compact": ["table", "max_partitions"],
        "query_service": ["table", "parallelism"],
        "mark_partition_done": ["table", "partitions"],
    }

    def _call(self, q: str):
        from flink_table_store_spark.procedures import call

        mq, lits = _mask_literals(q)
        m = re.match(r"(?i)CALL\s+(?:sys\.)?(\w+)\s*\((.*)\)\s*$", mq, re.S)
        if not m:
            raise ValueError(f"cannot parse CALL statement: {q}")
        name, argstr = m.group(1), m.group(2).strip()
        args: dict[str, Any] = {}
        if argstr:
            for i, piece in enumerate(_split_commas(argstr)):
                if "=>" in piece:
                    k, v = piece.split("=>", 1)
                    args[k.strip()] = _literal(_unmask_literals(v, lits).strip())
                else:
                    pos = self._CALL_POSITIONAL.get(name.lower(), ["table"])
                    if i >= len(pos):
                        raise ValueError(
                            f"positional CALL arg beyond {pos} for "
                            f"{name}: {piece}"
                        )
                    args[pos[i]] = _literal(_unmask_literals(piece, lits).strip())
        return call(self.spark, self.catalog, name, **args)

    # --- DML ---

    def _insert(self, q: str):
        # masked parse: a quoted static-partition value may contain
        # ')' or ',' without closing the PARTITION spec
        mq, lits = _mask_literals(q)
        m = re.match(
            r"(?i)INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?([\w.$@]+)"
            r"(?:\s+PARTITION\s*\(([^)]*)\))?\s+(.*)$",
            mq,
            re.S,
        )
        if not m:
            raise ValueError(f"cannot parse INSERT: {q}")
        mode, ident, part_spec, body = m.groups()
        t = self.catalog.get_table(ident)
        df = self.spark.sql(self._rewrite(_unmask_literals(body, lits).strip()))
        names = t.schema.field_names()
        static: dict[str, Any] = {}
        if part_spec:
            for piece in part_spec.split(","):
                k, v = piece.split("=", 1)
                static[k.strip()] = _literal(_unmask_literals(v, lits).strip())
            for k, v in static.items():
                df = df.withColumn(k, F.lit(v))
            # positional mapping for the remaining columns
            remaining = [c for c in names if c not in static]
            df = df.select(
                *[F.col(c) for c in static],
                *[F.col(old).alias(new) for old, new in zip(
                    [c for c in df.columns if c not in static], remaining)],
            )
        else:
            df = df.toDF(*names) if df.columns != names else df
        df = df.select(*names)
        overwrite = mode.upper() == "OVERWRITE"
        filt = None
        if overwrite and static:
            partial = set(static) != set(t.schema.partition_keys)
            if partial and t.schema.options.get(
                "dynamic-partition-overwrite"
            ) != "false":
                # partial static spec under dynamic overwrite: the
                # static values are constants in the frame, so the
                # dynamic path replaces exactly the (static, seen)
                # partitions — a static-subtree filter would wipe
                # sibling dynamic values the batch never touched
                filt = None
            else:
                filt = P.and_(
                    *[P.equal(k, v) for k, v in static.items()]
                ) if len(static) > 1 else P.equal(*next(iter(static.items())))
        return t.write(df, overwrite=overwrite, overwrite_partition_filter=filt)

    def _delete(self, q: str):
        mq, lits = _mask_literals(q)
        m = re.match(r"(?i)DELETE\s+FROM\s+([\w.$@]+)(?:\s+WHERE\s+(.*))?$", mq, re.S)
        if not m:
            raise ValueError(f"cannot parse DELETE: {q}")
        ident, cond = m.groups()
        t = self.catalog.get_table(ident)
        pred = (
            parse_condition(_unmask_literals(cond, lits))
            if cond
            else P.raw(F.lit(True))
        )
        return t.delete(self.spark, pred)

    def _update(self, q: str):
        # masked parse: a SET value literal containing ' where ' (or a
        # comma) must not split the clause
        mq, lits = _mask_literals(q)
        m = re.match(
            r"(?i)UPDATE\s+([\w.$@]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", mq, re.S
        )
        if not m:
            raise ValueError(f"cannot parse UPDATE: {q}")
        ident, setstr, cond = m.groups()
        t = self.catalog.get_table(ident)
        assignments: dict[str, Any] = {}
        for piece in _split_commas(setstr):
            k, v = piece.split("=", 1)
            assignments[k.strip().strip("`")] = F.expr(
                _unmask_literals(v, lits).strip()
            )
        pred = (
            parse_condition(_unmask_literals(cond, lits))
            if cond
            else P.raw(F.lit(True))
        )
        return t.update(self.spark, pred, assignments)

    def _merge(self, q: str):
        """MERGE INTO target USING source ON t.k = s.k WHEN ... —
        the common equi-join shape of MergeIntoPaimonTable.scala."""
        # masked parse: a source-subquery or SET-value literal
        # containing ' WHEN ' / ')' must not split the clauses, and the
        # ON split must not fire inside a column name like BRAND
        mq, lits = _mask_literals(q)
        m = re.match(
            r"(?i)MERGE\s+INTO\s+([\w.$@]+)(?:\s+(?:AS\s+)?(\w+))?"
            r"\s+USING\s+(\([^)]*\)|[\w.$@]+)(?:\s+(?:AS\s+)?(\w+))?"
            r"\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            mq,
            re.S,
        )
        if not m:
            raise ValueError(f"cannot parse MERGE INTO: {q}")
        tgt, tgt_a, src, src_a, on, clauses = m.groups()
        t = self.catalog.get_table(tgt)
        if src.startswith("("):
            sdf = self.spark.sql(
                self._rewrite(_unmask_literals(src[1:-1].strip(), lits))
            )
        elif self._known(src):
            sdf = self.catalog.get_table(src).to_df(self.spark)
        else:
            sdf = self.spark.table(src)
        on_cols = []
        for piece in _split_top_and(on):
            mm = re.match(r"\s*[\w`]+\.`?(\w+)`?\s*=\s*[\w`]+\.`?(\w+)`?\s*$", piece)
            if not mm or mm.group(1) != mm.group(2):
                raise ValueError(
                    "MERGE INTO supports equi-join ON t.col = s.col conditions"
                )
            on_cols.append(mm.group(1))
        upd: dict[str, Any] | str | None = None
        delete = False
        insert = False
        if re.search(r"(?i)WHEN\s+MATCHED\s+THEN\s+DELETE", clauses):
            delete = True
        mu = re.search(
            r"(?i)WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(\*|.+?)(?=\s+WHEN\s+|$)",
            clauses,
            re.S,
        )
        if mu:
            if mu.group(1).strip() == "*":
                upd = "*"
            else:
                upd = {}
                for piece in _split_commas(mu.group(1)):
                    k, v = piece.split("=", 1)
                    k = k.strip().strip("`")
                    k = k.split(".")[-1]
                    expr = v.strip()
                    # alias rewrites on the MASKED expr (an alias name
                    # inside a string literal stays), then unmask
                    if src_a:
                        expr = re.sub(rf"\b{src_a}\.", "s.", expr)
                    if tgt_a:
                        expr = re.sub(rf"\b{tgt_a}\.", "t.", expr)
                    upd[k] = F.expr(_unmask_literals(expr, lits))
        if re.search(r"(?i)WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT", clauses):
            insert = True
        return t.merge_into(
            self.spark,
            sdf,
            on=on_cols,
            when_matched_update=upd,
            when_matched_delete=delete,
            when_not_matched_insert=insert,
        )

"""uap-core-format user-agent database: loader, evaluator, compilers.

The reference resolves UA families by calling ``user_agents.parse``
per row (etl:109-112), which evaluates the public uap-core regex
database: an ordered list of ``{regex, family_replacement}`` entries
where the FIRST matching regex wins and the replacement may reference
capture groups as ``$1``..``$9`` (group 1 is the family when no
replacement is given). That algorithm is tiny and fully public —
this module implements it three ways over the vendored database at
``data/ua_regexes.yaml``:

- :func:`parse_browser_family` / :func:`parse_os_family` — the exact
  uap-core evaluation in pure Python (``re.search`` per entry, first
  match wins, ``$n`` substitution). This is the parity path the
  engine's pandas UDF executes when the ``user_agents`` wrapper is
  not installed, so P12's exact-semantics path runs in any
  environment.
- :func:`compile_when_ladder` — the same ordered database compiled
  into a single Spark ``when``-chain of ``rlike`` tests (whole-stage
  codegen, zero Python — the 100 TB scale path). Entries whose
  replacement references capture groups compile to
  ``regexp_extract`` concatenations, so the ladder covers the FULL
  uap-core replacement semantics, not just literal families.
- :func:`duckdb_case_sql` — the same database rendered as a DuckDB
  ``CASE``/``regexp_matches`` ladder (``regexp_extract`` for capture
  replacements), so an oracle can replay the classification
  cross-engine.

The three compilations agree by construction: first match in
database order wins in each, ``$n`` substitutes that entry's capture
groups (an unmatched optional group substitutes as ``''`` in all
three engines), and a missing replacement means group 1. All
vendored regexes are RE2-safe (no backreferences or lookaround), so
Java regex (rlike/regexp_extract), Python ``re`` and DuckDB RE2
match identically; the corpus test pins all three against the same
UA fixture.

Drop-in full-parity path: point ``SPARK_ELB_UA_DB`` at an unmodified
upstream uap-core ``regexes.yaml`` (parsed with PyYAML — the full
file uses flow styles the dependency-free mini-parser does not) and
every compilation evaluates the complete public database, matching a
``user_agents``-equipped reference run family-for-family. The
vendored default stays the re-derived subset so the engine has zero
install-time downloads.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

DB_PATH = Path(__file__).resolve().parent.parent / "data" / "ua_regexes.yaml"
DB_ENV_VAR = "SPARK_ELB_UA_DB"

_DOLLAR_GROUP = re.compile(r"\$(\d)")


@dataclass(frozen=True)
class UAEntry:
    regex: str
    replacement: str | None  # None -> uap-core's default: capture group 1
    flags: str = ""  # uap-core regex_flag ('i' = case-insensitive)

    @property
    def pattern(self) -> str:
        """The regex with uap-core's regex_flag folded in as an inline
        flag — the one spelling Java regex, Python re and RE2 all
        honor identically when it prefixes the pattern."""
        return f"(?{self.flags}){self.regex}" if self.flags else self.regex


def _parse_uap_yaml(text: str) -> dict[str, list[dict[str, str]]]:
    """Parse the vendored database without a YAML dependency.

    The file is deliberately restricted to the tiny uap-core subset —
    top-level section keys, ``- regex: '...'`` items, and
    single-quoted ``*_replacement`` fields ('' escapes a quote) — so
    the scale-path ladder compiles with zero third-party imports.
    PyYAML, when installed, parses the same file identically
    (pinned by tests/test_ua_corpus.py)."""

    def unquote(v: str) -> str:
        v = v.strip()
        if not (v.startswith("'") and v.endswith("'") and len(v) >= 2):
            raise ValueError(f"uap db: expected single-quoted value, got {v!r}")
        return v[1:-1].replace("''", "'")

    sections: dict[str, list[dict[str, str]]] = {}
    current: list[dict[str, str]] | None = None
    for lineno, raw_line in enumerate(text.splitlines(), 1):
        line = raw_line.split("#", 1)[0] if raw_line.lstrip().startswith("#") else raw_line
        if not line.strip():
            continue
        stripped = line.strip()
        if not line[0].isspace() and stripped.endswith(":"):
            current = sections.setdefault(stripped[:-1], [])
        elif stripped.startswith("- "):
            if current is None:
                raise ValueError(f"uap db line {lineno}: item before any section")
            key, _, val = stripped[2:].partition(":")
            current.append({key.strip(): unquote(val)})
        elif ":" in stripped:
            if not current or not current[-1]:
                raise ValueError(f"uap db line {lineno}: field before any item")
            key, _, val = stripped.partition(":")
            current[-1][key.strip()] = unquote(val)
        else:
            raise ValueError(f"uap db line {lineno}: unparseable: {raw_line!r}")
    return sections


@lru_cache(maxsize=None)
def _load_db() -> tuple[tuple[UAEntry, ...], tuple[UAEntry, ...]]:
    override = os.environ.get(DB_ENV_VAR)
    if override:
        # an UPSTREAM uap-core regexes.yaml: full YAML (flow styles,
        # double quotes), so parse with PyYAML rather than the
        # restricted mini-parser the vendored file is written for
        import yaml

        with open(override) as f:
            raw = yaml.safe_load(f)
    else:
        with open(DB_PATH) as f:
            raw = _parse_uap_yaml(f.read())
    browsers = tuple(
        UAEntry(e["regex"], e.get("family_replacement"), e.get("regex_flag", ""))
        for e in raw.get("user_agent_parsers", [])
    )
    oses = tuple(
        UAEntry(e["regex"], e.get("os_replacement"), e.get("regex_flag", ""))
        for e in raw.get("os_parsers", [])
    )
    return browsers, oses


def browser_parsers() -> tuple[UAEntry, ...]:
    return _load_db()[0]


def os_parsers() -> tuple[UAEntry, ...]:
    return _load_db()[1]


@lru_cache(maxsize=None)
def _compiled(pattern: str) -> re.Pattern:
    return re.compile(pattern)


def evaluate(ua: str, parsers: tuple[UAEntry, ...], default: str = "Other") -> str:
    """The uap-core resolution algorithm: first ``re.search`` match in
    database order wins; the replacement's ``$n`` tokens substitute the
    match's capture groups (group 1 alone when no replacement). An
    unmatched optional group substitutes as '' — the same convention
    Spark's and DuckDB's ``regexp_extract`` use, which is what lets
    the three compilations agree on $n entries."""
    for entry in parsers:
        m = _compiled(entry.pattern).search(ua)
        if m is None:
            continue
        if entry.replacement is None:
            return (m.group(1) or "") if m.groups() else default
        return _DOLLAR_GROUP.sub(
            lambda g: m.group(int(g.group(1))) or "", entry.replacement
        )
    return default


def parse_browser_family(ua: str | None) -> str:
    if ua is None or ua in ("", "-"):
        return "Unknown"  # reference sentinel mapping, etl:110
    return evaluate(ua, browser_parsers())


def parse_os_family(ua: str | None) -> str:
    if ua is None or ua in ("", "-"):
        return "Unknown"
    return evaluate(ua, os_parsers())


def _segments(entry: UAEntry) -> list[tuple[str, str | int]]:
    """Split an entry's replacement into ('lit', text) / ('grp', n)
    segments — the common compilation unit for the Spark and DuckDB
    renderers. A missing replacement is uap-core's default: group 1.
    Validates group references against the compiled regex so a bad
    entry fails at compile time, not per row at runtime."""
    n_groups = _compiled(entry.pattern).groups
    if entry.replacement is None:
        if n_groups < 1:
            raise ValueError(
                f"entry {entry.regex!r}: no replacement and no capture group"
            )
        return [("grp", 1)]
    segs: list[tuple[str, str | int]] = []
    pos = 0
    for m in _DOLLAR_GROUP.finditer(entry.replacement):
        if m.start() > pos:
            segs.append(("lit", entry.replacement[pos : m.start()]))
        n = int(m.group(1))
        if n < 1 or n > n_groups:
            raise ValueError(
                f"entry {entry.regex!r}: replacement references group {n} "
                f"but the regex has {n_groups}"
            )
        segs.append(("grp", n))
        pos = m.end()
    if pos < len(entry.replacement):
        segs.append(("lit", entry.replacement[pos:]))
    return segs or [("lit", "")]


def _spark_sql_quote(s: str) -> str:
    """A Spark-SQL single-quoted string literal. The default parser
    processes backslash escapes inside literals (unlike DuckDB), so
    regex backslashes must be doubled."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def spark_case_sql(
    ua_expr: str,
    parsers: tuple[UAEntry, ...],
    blank_family: str = "Unknown",
    default: str = "Other",
) -> str:
    """Render the ordered database as ONE Spark-SQL CASE expression
    string over ``ua_expr`` (a SQL sub-expression, e.g. a backtick-
    quoted column name). Rationale: a database this size (~300
    entries) built via chained ``F.when`` calls costs one py4j
    round-trip per arm (~1 s of driver time PER QUERY before
    anything executes); a single ``F.expr`` hands the whole ladder
    to the JVM parser in one call. The compiled plan is identical.
    """
    arms = [
        f"WHEN {ua_expr} IS NULL OR {ua_expr} = '' OR {ua_expr} = '-' "
        f"THEN {_spark_sql_quote(blank_family)}"
    ]
    for entry in parsers:
        segs = _segments(entry)
        if len(segs) == 1 and segs[0][0] == "lit":
            value = _spark_sql_quote(segs[0][1])
        else:
            parts = [
                _spark_sql_quote(v)
                if kind == "lit"
                else (
                    f"regexp_extract({ua_expr}, "
                    f"{_spark_sql_quote(entry.pattern)}, {v})"
                )
                for kind, v in segs
            ]
            value = parts[0] if len(parts) == 1 else f"concat({', '.join(parts)})"
        arms.append(
            f"WHEN {ua_expr} RLIKE {_spark_sql_quote(entry.pattern)} THEN {value}"
        )
    joined = " ".join(arms)
    return f"CASE {joined} ELSE {_spark_sql_quote(default)} END"


def _assert_default_string_literals() -> None:
    """Fail loudly if the session parses string literals in legacy
    mode. :func:`_spark_sql_quote` doubles backslashes assuming the
    default parser (``spark.sql.parser.escapedStringLiterals=false``);
    under the legacy conf every regex in the rendered CASE would keep
    its doubled backslashes and the whole UA ladder would silently
    match nothing — every agent classified Other/generic-tail with no
    error. Better to refuse than to misclassify."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return
    conf = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    if str(conf).lower() == "true":
        raise RuntimeError(
            "spark.sql.parser.escapedStringLiterals=true: the rendered "
            "UA CASE ladder assumes the default literal parser; with "
            "the legacy conf its escaped regexes would silently match "
            "nothing. Unset the conf or pass a Column to "
            "compile_when_ladder to use the F.when construction path."
        )


def compile_when_ladder(
    ua: Column | str,
    parsers: tuple[UAEntry, ...],
    blank_family: str = "Unknown",
    default: str = "Other",
) -> Column:
    """Compile the ordered database into one codegen'd CASE ladder.

    Literal replacements become literal arms; capture-group
    replacements become ``concat(lit…, regexp_extract(ua, regex, n),
    …)`` — pure JVM column expressions either way, so the full
    uap-core replacement semantics (including the generic long-tail
    entries that NAME unknown agents from their product token) stay
    on the zero-Python scale path.

    A string ``ua`` (column name) takes the fast construction path:
    the whole ladder renders as one SQL CASE via
    :func:`spark_case_sql` and crosses py4j once. A Column falls
    back to the chained-``when`` construction (hundreds of py4j
    calls — fine for tests, avoid in hot query-build paths)."""
    if isinstance(ua, str):
        _assert_default_string_literals()
        quoted = "`" + ua.replace("`", "``") + "`"
        return F.expr(spark_case_sql(quoted, parsers, blank_family, default))
    c = ua
    chain = F.when(
        c.isNull() | (c == "") | (c == "-"), F.lit(blank_family)
    )
    for entry in parsers:
        segs = _segments(entry)
        if len(segs) == 1 and segs[0][0] == "lit":
            value = F.lit(segs[0][1])
        else:
            parts = [
                F.lit(v) if kind == "lit" else F.regexp_extract(c, entry.pattern, v)
                for kind, v in segs
            ]
            value = parts[0] if len(parts) == 1 else F.concat(*parts)
        chain = chain.when(c.rlike(entry.pattern), value)
    return chain.otherwise(F.lit(default))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def duckdb_case_sql(
    ua_expr: str,
    parsers: tuple[UAEntry, ...],
    blank_family: str = "Unknown",
    default: str = "Other",
) -> str:
    """Render the ordered database as a DuckDB CASE ladder over
    ``ua_expr`` — the oracle-side replay of the classification.
    Capture-group replacements render as ``regexp_extract(ua, regex,
    n)`` concatenations, mirroring :func:`compile_when_ladder`."""
    arms = [
        f"WHEN {ua_expr} IS NULL OR {ua_expr} = '' OR {ua_expr} = '-' "
        f"THEN {_sql_quote(blank_family)}"
    ]
    for entry in parsers:
        segs = _segments(entry)
        if len(segs) == 1 and segs[0][0] == "lit":
            value = _sql_quote(segs[0][1])
        else:
            parts = [
                _sql_quote(v)
                if kind == "lit"
                else f"regexp_extract({ua_expr}, {_sql_quote(entry.pattern)}, {v})"
                for kind, v in segs
            ]
            value = " || ".join(parts)
        arms.append(
            f"WHEN regexp_matches({ua_expr}, {_sql_quote(entry.pattern)}) "
            f"THEN {value}"
        )
    joined = "\n      ".join(arms)
    return f"CASE {joined}\n      ELSE {_sql_quote(default)} END"

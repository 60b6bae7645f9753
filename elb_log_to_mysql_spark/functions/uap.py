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
  codegen, zero Python — the 100 TB scale path).
- :func:`duckdb_case_sql` — the same database rendered as a DuckDB
  ``CASE``/``regexp_matches`` ladder, so an oracle can replay the
  classification cross-engine.

The three compilations agree by construction only when every entry's
replacement is a literal (no ``$n``); the vendored database keeps
that invariant (asserted by the compilers) and the corpus test pins
all three against the same ~100-UA fixture. All vendored regexes are
RE2-safe, so Java regex (rlike), Python ``re`` and DuckDB RE2 match
identically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

DB_PATH = Path(__file__).resolve().parent.parent / "data" / "ua_regexes.yaml"

_DOLLAR_GROUP = re.compile(r"\$(\d)")


@dataclass(frozen=True)
class UAEntry:
    regex: str
    replacement: str | None  # None -> uap-core's default: capture group 1


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
    with open(DB_PATH) as f:
        raw = _parse_uap_yaml(f.read())
    browsers = tuple(
        UAEntry(e["regex"], e.get("family_replacement"))
        for e in raw.get("user_agent_parsers", [])
    )
    oses = tuple(
        UAEntry(e["regex"], e.get("os_replacement"))
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
    match's capture groups (group 1 alone when no replacement)."""
    for entry in parsers:
        m = _compiled(entry.regex).search(ua)
        if m is None:
            continue
        if entry.replacement is None:
            return m.group(1) if m.groups() else default
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


def _require_literal(parsers: tuple[UAEntry, ...]) -> None:
    bad = [e.regex for e in parsers if e.replacement is None or "$" in e.replacement]
    if bad:
        raise ValueError(
            "ladder/CASE compilation needs literal replacements; "
            f"entries with $n or missing replacement: {bad}"
        )


def compile_when_ladder(
    ua: Column | str,
    parsers: tuple[UAEntry, ...],
    blank_family: str = "Unknown",
    default: str = "Other",
) -> Column:
    """Compile the ordered database into one codegen'd when-chain."""
    _require_literal(parsers)
    c = F.col(ua) if isinstance(ua, str) else ua
    chain = F.when(
        c.isNull() | (c == "") | (c == "-"), F.lit(blank_family)
    )
    for entry in parsers:
        chain = chain.when(c.rlike(entry.regex), F.lit(entry.replacement))
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
    ``ua_expr`` — the oracle-side replay of the classification."""
    _require_literal(parsers)
    arms = [
        f"WHEN {ua_expr} IS NULL OR {ua_expr} = '' OR {ua_expr} = '-' "
        f"THEN {_sql_quote(blank_family)}"
    ]
    for entry in parsers:
        arms.append(
            f"WHEN regexp_matches({ua_expr}, {_sql_quote(entry.regex)}) "
            f"THEN {_sql_quote(entry.replacement)}"
        )
    joined = "\n      ".join(arms)
    return f"CASE {joined}\n      ELSE {_sql_quote(default)} END"

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


@lru_cache(maxsize=None)
def _load_db() -> tuple[tuple[UAEntry, ...], tuple[UAEntry, ...]]:
    import yaml

    with open(DB_PATH) as f:
        raw = yaml.safe_load(f)
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

"""User-agent classification (reference P12, etl:109-112).

The reference calls ``user_agents.parse(ua).browser.family`` /
``.os.family`` per row. There is no Spark builtin for this, so two
implementations are provided:

- :func:`ua_families_udf` — exact-parity Arrow-batched pandas UDF
  wrapping the ``user_agents`` library, used when the library is
  importable on the executors.
- :func:`ua_browser_family_expr` / :func:`ua_os_family_expr` — pure
  column-expression regex ladders covering the dominant families.
  These stay inside whole-stage codegen (no Python at all) and are the
  default/scale path: at 100 TB a vectorized JVM expression beats even
  an Arrow UDF, and family coverage for major browsers/OSes is what
  downstream aggregation actually consumes.

The ``"-"``/empty sentinel maps to ``Unknown`` in both paths (etl:110).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # optional exact-parity path; not installed in this sandbox
    import user_agents as _user_agents  # type: ignore
except ImportError:  # pragma: no cover
    _user_agents = None

HAVE_USER_AGENTS = _user_agents is not None


def _is_blank(c: Column) -> Column:
    return c.isNull() | (c == "") | (c == "-")


def ua_browser_family_expr(ua: Column | str) -> Column:
    """Browser family via an ordered regex ladder (most-specific first).

    Order matters three ways, mirroring how the uap-core regex
    database resolves families:

    - bots/HTTP clients first — a Googlebot UA *contains* "Chrome/"
      (Google crawls with a Chromium build), so crawler tokens must win
      before browser tokens;
    - rebadged-Chromium browsers (Edge, Opera, Yandex, UC, Vivaldi,
      Samsung) before "Chrome/";
    - "Chrome" before "Safari" (every Chrome UA carries "Safari").

    Family-name contract: the named families below use uap-core's
    spelling (so rows match a reference run for those agents); the
    long tail of rare agents collapses to "Other", which uap-core
    would sometimes name — intentionally coarser, documented here and
    tested in tests/test_alb_parse.py.
    """
    c = F.col(ua) if isinstance(ua, str) else ua
    return (
        F.when(_is_blank(c), F.lit("Unknown"))
        # --- crawlers / fetchers (before browsers: bot UAs embed Chrome) ---
        .when(c.rlike(r"Googlebot"), F.lit("Googlebot"))
        .when(c.rlike(r"bingbot"), F.lit("bingbot"))
        .when(c.rlike(r"Baiduspider"), F.lit("Baiduspider"))
        .when(c.rlike(r"YandexBot"), F.lit("YandexBot"))
        .when(c.rlike(r"Slurp"), F.lit("Yahoo! Slurp"))
        .when(c.rlike(r"DuckDuckBot"), F.lit("DuckDuckBot"))
        .when(c.rlike(r"AhrefsBot"), F.lit("AhrefsBot"))
        .when(c.rlike(r"SemrushBot"), F.lit("SemrushBot"))
        # --- programmatic HTTP clients ---
        .when(c.rlike(r"Apache-HttpClient"), F.lit("Apache-HttpClient"))
        .when(c.rlike(r"^curl/"), F.lit("curl"))
        .when(c.rlike(r"^Wget/"), F.lit("Wget"))
        .when(c.rlike(r"python-requests"), F.lit("Python Requests"))
        .when(c.rlike(r"Python-urllib"), F.lit("Python-urllib"))
        .when(c.rlike(r"Go-http-client"), F.lit("Go-http-client"))
        .when(c.rlike(r"^okhttp"), F.lit("okhttp"))
        .when(c.rlike(r"^Java/"), F.lit("Java"))
        # --- rebadged-Chromium browsers before Chrome ---
        # uap-core splits Edge by platform: EdgA (Android) / EdgiOS
        # are "Edge Mobile", Edg/Edge (desktop incl. legacy 18) "Edge"
        .when(c.rlike(r"Edg(A|iOS)/"), F.lit("Edge Mobile"))
        .when(c.rlike(r"Edge?/"), F.lit("Edge"))
        .when(c.rlike(r"Opera Mini"), F.lit("Opera Mini"))
        .when(c.rlike(r"Opera Mobi"), F.lit("Opera Mobile"))
        .when(c.rlike(r"OPR/|Opera"), F.lit("Opera"))
        .when(c.rlike(r"YaBrowser/"), F.lit("Yandex Browser"))
        .when(c.rlike(r"UCBrowser/|UCWEB"), F.lit("UC Browser"))
        .when(c.rlike(r"Vivaldi/"), F.lit("Vivaldi"))
        .when(c.rlike(r"SamsungBrowser/"), F.lit("Samsung Internet"))
        .when(c.rlike(r"HeadlessChrome/"), F.lit("HeadlessChrome"))
        .when(c.rlike(r"(CriOS)/"), F.lit("Chrome Mobile iOS"))
        .when(c.rlike(r"Chrome/.*Mobile"), F.lit("Chrome Mobile"))
        # uap-core names Ubuntu/other Chromium builds "Chromium", not
        # "Chrome" — the Chromium token wins even though Chrome/ is
        # also present in those UAs
        .when(c.rlike(r"Chromium/"), F.lit("Chromium"))
        .when(c.rlike(r"Chrome/"), F.lit("Chrome"))
        .when(c.rlike(r"FxiOS/"), F.lit("Firefox iOS"))
        # uap-core: Gecko Firefox on Android (phone or tablet token)
        # is "Firefox Mobile"; desktop stays "Firefox"
        .when(c.rlike(r"Android.*Firefox/"), F.lit("Firefox Mobile"))
        .when(c.rlike(r"Firefox/"), F.lit("Firefox"))
        # Android stock (AOSP) browser: WebKit + Version/ + Safari on
        # Android with no Chrome token — uap-core family "Android"
        .when(c.rlike(r"Android.*Version/.*Safari"), F.lit("Android"))
        .when(c.rlike(r"Version/.*Mobile.*Safari"), F.lit("Mobile Safari"))
        .when(c.rlike(r"Version/.*Safari"), F.lit("Safari"))
        .when(c.rlike(r"MSIE |Trident/"), F.lit("IE"))
        .otherwise(F.lit("Other"))
    )


def ua_os_family_expr(ua: Column | str) -> Column:
    c = F.col(ua) if isinstance(ua, str) else ua
    return (
        F.when(_is_blank(c), F.lit("Unknown"))
        .when(c.rlike(r"Windows Phone"), F.lit("Windows Phone"))
        .when(c.rlike(r"Windows NT|Win64|WOW64"), F.lit("Windows"))
        .when(c.rlike(r"iPhone|iPad|iPod|iOS"), F.lit("iOS"))
        .when(c.rlike(r"Android"), F.lit("Android"))
        .when(c.rlike(r"Mac OS X|Macintosh"), F.lit("Mac OS X"))
        .when(c.rlike(r"CrOS"), F.lit("Chrome OS"))
        .when(c.rlike(r"Ubuntu"), F.lit("Ubuntu"))
        .when(c.rlike(r"FreeBSD"), F.lit("FreeBSD"))
        .when(c.rlike(r"Linux|X11"), F.lit("Linux"))
        .otherwise(F.lit("Other"))
    )


def ua_families_udf():
    """Exact-parity Arrow-batched UDF (requires ``user_agents``).

    Returns a pandas UDF producing ``struct<browser:string,os:string>``.
    Raises ImportError when the library is unavailable — callers should
    fall back to the expression ladder.
    """
    if not HAVE_USER_AGENTS:
        raise ImportError("user_agents not installed; use ua_*_expr fallbacks")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<browser:string,os:string>")
    def _parse(ua: pd.Series) -> pd.DataFrame:
        def one(v):
            if v is None or v in ("", "-"):
                return ("Unknown", "Unknown")
            parsed = _user_agents.parse(v)
            return (parsed.browser.family, parsed.os.family)

        pairs = ua.map(one)
        return pd.DataFrame(
            {"browser": pairs.map(lambda t: t[0]), "os": pairs.map(lambda t: t[1])}
        )

    return _parse

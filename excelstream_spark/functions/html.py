"""HTML -> text extraction as pure JVM column expressions — the stage
between WARC ingest (sources/warc.py) and the C4 cleaning rules
(operators/quality.py) in a web-corpus build: crawled pages arrive as
HTML and every downstream text operator (quality, dedup, langid,
tokenizer) wants the rendered text.

The extractor is a DETERMINISTIC regex chain, defined ONCE as data
(``HTML_REGEX_STEPS`` / ``HTML_ENTITY_STEPS``) and consumed by BOTH
engines — ``extract_text`` renders it as Spark ``regexp_replace`` /
``replace`` Columns, ``extract_text_sql`` renders the IDENTICAL
pattern strings as DuckDB SQL — so the catalog oracle replays the
exact chain rather than approximating it.  Pattern syntax is kept to
the Java-regex ∩ RE2 intersection: inline ``(?is)`` flags, non-greedy
quantifiers, non-capturing groups, explicit ``[ \\t\\r\\n]`` classes
(NEVER ``\\s`` — Java's includes U+000B, RE2's does not).

The chain (order is load-bearing):

1. drop ``<script>…</script>`` and ``<style>…</style>`` WITH their
   contents (case-insensitive, dotall — script bodies must never leak
   into training text);
2. drop ``<!-- comments -->`` with contents;
3. drop INLINE formatting tags (a/b/i/em/strong/span/code/…) with NO
   replacement, so ``mid<b>dle</b>word`` extracts as ``middleword``;
4. every remaining tag -> one space (block structure becomes word
   breaks);
5. decode the fixed entity set, ``&amp;`` LAST so double-escaped
   text stays escaped one level (``&amp;lt;`` -> ``&lt;``, the
   standard unescape ordering);
6. collapse ``[ \\t\\r\\n]+`` runs to one space and trim.

Documented contract limits (the regex-extractor trade, stated rather
than hidden): attribute values containing a literal ``>`` split the
tag early, and only the fixed entity set decodes (numeric references
beyond ``&#39;`` pass through).  Real-world boilerplate removal
(readability scoring, DOM heuristics) is a layer ABOVE this operator;
this is the deterministic, SQL-replayable core every engine needs
first.

100 TB shape: the whole chain is scan-stage whole-stage-codegen JVM
work — zero shuffles, zero Python, applied in the same stage as the
WARC payload decode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) regexp steps, applied in order.  Pattern
#: strings are handed VERBATIM to both Java regex and RE2.
HTML_REGEX_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b[^>]*>.*?</script[^>]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[^>]*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (
        r"(?i)</?(?:abbr|strong|small|span|mark|code|em|sup|sub|a|b|i|u)"
        r"(?:[ \t\r\n][^>]*)?>",
        "",
    ),
    (r"<[^>]*>", " "),
)

#: plain substring replacements (entity decode).  ``&amp;`` MUST stay
#: last: decoding it first would turn ``&amp;lt;`` into ``&lt;`` before
#: the ``&lt;`` step, collapsing two escape levels into one.
HTML_ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

HTML_WS_PATTERN = r"[ \t\r\n]+"


def extract_text(col: Column | str) -> Column:
    """The extraction chain as one JVM column expression (see module
    docstring for the steps and their order)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_REGEX_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for ent, repl in HTML_ENTITY_STEPS:
        c = F.replace(c, F.lit(ent), F.lit(repl))
    return F.trim(F.regexp_replace(c, HTML_WS_PATTERN, " "))


def _sq(s: str) -> str:
    return s.replace("'", "''")


def extract_text_sql(expr: str) -> str:
    """The IDENTICAL chain rendered as DuckDB SQL around ``expr`` —
    same pattern strings, same order, so the oracle replays the
    extractor rather than approximating it."""
    s = expr
    for pat, repl in HTML_REGEX_STEPS:
        s = f"regexp_replace({s}, '{_sq(pat)}', '{_sq(repl)}', 'g')"
    for ent, repl in HTML_ENTITY_STEPS:
        s = f"replace({s}, '{_sq(ent)}', '{_sq(repl)}')"
    return f"trim(regexp_replace({s}, '{_sq(HTML_WS_PATTERN)}', ' ', 'g'))"


def extract_text_df(df, html_col: str = "html", out_col: str = "text"):
    """DataFrame form: adds ``out_col`` with the extracted text."""
    return df.withColumn(out_col, extract_text(html_col))

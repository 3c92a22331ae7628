"""HTML -> text extraction (functions/html.py): per-case semantic
falsifiers on crafted pages, engine-parity over the shared chain, and
the plan shape (scan-stage JVM work, zero exchanges).

The catalog row's hash gate (html_extract_text) proves the WHOLE chain
matches DuckDB over the fixture; these tests pin WHY each step exists,
so a future edit that weakens one step fails a named test instead of a
bulk hash."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from excelstream_spark.functions.html import (
    HTML_ENTITY_STEPS,
    extract_text,
    extract_text_sql,
)


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_text("html").alias("t")).collect()[0]["t"]


def test_script_and_style_bodies_never_leak(spark):
    got = _extract_one(
        spark,
        '<style>p {color:red} STYLELEAK</style><p>keep</p>'
        '<script>var x = "<p>SCRIPTLEAK</p>";</script>',
    )
    assert got == "keep"


def test_uppercase_and_attributed_script_tags(spark):
    got = _extract_one(
        spark,
        '<SCRIPT TYPE="text/javascript">SCRIPTLEAK</SCRIPT>a'
        '<script\ndefer>SCRIPTLEAK</script >b',
    )
    assert got == "a b"


def test_comment_contents_dropped(spark):
    assert _extract_one(spark, "x<!-- COMMENTLEAK <p>y</p> -->z") == "x z"


def test_inline_tags_join_words(spark):
    """An extractor that turns EVERY tag into a space would emit
    'mid dle word' — the inline-drop step is what makes 'middleword'."""
    got = _extract_one(spark, "<p>mid<b>dle</b>word <em>it</em>s</p>")
    assert got == "middleword its"


def test_block_tags_become_word_breaks(spark):
    got = _extract_one(spark, "<h1>Head</h1><p>body</p><div>tail</div>")
    assert got == "Head body tail"


def test_entity_decode_and_double_escape_order(spark):
    """&amp; must decode LAST: '&amp;lt;keep&gt;' is the author writing
    a literal '&lt;keep&gt;' — one escape level comes off, not two."""
    got = _extract_one(
        spark,
        "A&nbsp;B &lt;raw&gt; &quot;q&quot; &#39;s&#39; &amp;lt;keep&amp;gt;",
    )
    assert got == 'A B <raw> "q" \'s\' &lt;keep&gt;'


def test_whitespace_collapse_and_trim(spark):
    assert _extract_one(spark, "  a\t\tb\r\nc  ") == "a b c"


def test_null_html_stays_null(spark):
    df = spark.createDataFrame([(None,)], "html string")
    assert df.select(extract_text("html").alias("t")).collect()[0]["t"] is None


def test_known_limit_gt_in_attribute_documented(spark):
    """The documented regex-extractor limit: a literal '>' inside an
    attribute value splits the tag early.  Pinned so the contract stays
    stated — if a future chain fixes it, update the docstring AND this
    test together."""
    got = _extract_one(spark, '<p title="a>b">x</p>')
    assert got == 'b">x'


def test_engine_parity_on_adversarial_rows(spark):
    """The load-bearing cross-engine check: the SAME pattern strings
    run through Java regex (Spark) and RE2 (DuckDB) must agree on
    hostile inputs — nested-looking tags, fake closers inside strings,
    every entity, uppercase tags, CR/LF runs."""
    rows = [
        "plain text with no markup at all",
        '<script>var s = "</scr" + "ipt>";</script>after',
        "<style>@media x { .c { } } </style>mid<style>s</style>",
        "<!--c1--><b>j</b><!--c2-->oin",
        "A&nbsp;B&amp;C&lt;D&gt;E&quot;F&#39;G &amp;amp; &amp;lt;",
        "<DIV CLASS='X'>up</DIV><SPAN>per</SPAN>",
        "line1\r\nline2\rline3\nline4\t\tend",
        "<a href='q'>anchor</a><abbr title='t'>ab</abbr>br",
        "un<closed <p>tag</p>",
    ]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(rows)], "i long, html string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", extract_text("html").alias("t")).collect()
    }
    con = duckdb.connect()
    for i, r in enumerate(rows):
        lit = r.replace("'", "''")
        exp = con.execute(
            f"SELECT {extract_text_sql(f'''CAST('{lit}' AS VARCHAR)''')}"
        ).fetchone()[0]
        assert got[i] == exp, f"row {i}: spark={got[i]!r} duckdb={exp!r}"


def test_amp_is_last_entity_step():
    assert HTML_ENTITY_STEPS[-1][0] == "&amp;"


def test_zero_exchange_scan_plan(spark):
    """The chain must stay scan-stage JVM work: no Exchange, no Python
    eval in the executed plan."""
    df = spark.range(8).select(
        F.concat(F.lit("<p>x"), F.col("id").cast("string"), F.lit("</p>"))
        .alias("html")
    )
    out = df.select(extract_text("html").alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan

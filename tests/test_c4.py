"""C4 line-level cleaning rules (Raffel et al. 2020 §2.2) — DuckDB
oracle parity on crafted edge-case documents plus hand-computed
expectations.  The fixture-level parity of the catalog entry (with the
deterministic line augmentation) is covered by the full-catalog sweep
in test_catalog_oracle.py."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from excelstream_spark.functions import text as TXT
from excelstream_spark.operators import quality as QL
from excelstream_spark.plans import oracles as ORC

from .conftest import assert_matches_oracle

#: One document per rule, plus the whitespace/NULL edges:
CRAFTED = [
    # 0: clean multi-sentence page — passes everything
    "This is a perfectly ordinary first sentence right here.\n"
    "Here is another reasonable sentence with enough words.\n"
    "And one more closing sentence to clear the floor.",
    # 1: terminal-punctuation rule: middle line unpunctuated -> dropped
    "This line ends with a period and enough words.\n"
    "this line has no terminal punctuation at all\n"
    "A question mark terminates this line does it not?\n"
    'The last line ends with an end quotation mark."',
    # 2: min-words rule: short lines dropped -> sentence floor fails
    "Short.\nTiny!\nOk?\nOne good long sentence with many words here.",
    # 3: javascript line dropped; page otherwise fine
    "Please enable javascript to view this excellent page.\n"
    "The first real sentence of the page goes here.\n"
    "The second real sentence of the page goes here.\n"
    "The third real sentence of the page goes here.",
    # 4: policy phrases dropped (privacy policy / use of cookies)
    "Read our privacy policy before continuing to browse today.\n"
    "This site makes use of cookies for advertising reasons.\n"
    "Sentence one of the genuine page content lands here.\n"
    "Sentence two of the genuine page content lands here.\n"
    "Sentence three of the genuine page content lands here.",
    # 5: lorem ipsum page drop (even though its lines qualify)
    "Lorem ipsum dolor sit amet consectetur adipiscing elit today.\n"
    "A second qualifying sentence keeps the line count high.\n"
    "A third qualifying sentence keeps the line count high.",
    # 6: curly-brace page drop
    "A page with code like function() { return 1; } embedded.\n"
    "A second qualifying sentence keeps the line count high.\n"
    "A third qualifying sentence keeps the line count high.",
    # 7: CRLF line endings — \r tolerated before the terminal check
    "The first windows sentence ends with a period.\r\n"
    "The second windows sentence ends with a period.\r\n"
    "The third windows sentence ends with a period.",
    # 8: multi-sentence single line (sentence proxy counts marks)
    "First sentence here today. Second sentence here now. Third one.",
    # 9: empty text
    "",
    # 10: NULL text
    None,
    # 11: whitespace-only
    "   \n  \n ",
    # 12: quote-only-terminated lines (advice #2's exact case): no
    # '.'/'!'/'?' anywhere — retained by the end-mark rule, and the
    # sentence proxy must count them or the page floor fails silently
    'He said "this is the first quoted sentence right here"\n'
    'She said "this is the second quoted sentence right here"\n'
    'They said "this is the third quoted sentence right here"',
    # 13: "javascript" is a WORD-level rule (advice #4): a larger word
    # containing it must NOT trigger the drop; a bare-token line must
    "Enthusiasts enjoy javascripting about frameworks every single day.\n"
    "The word javascript appears bare in this sentence today.\n"
    "Another ordinary qualifying sentence lands right about here.\n"
    "A final ordinary qualifying sentence closes the page out.",
]


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("c4")
    tbl = pa.table({
        "doc_id": pa.array(range(len(CRAFTED)), pa.int64()),
        "text": pa.array(CRAFTED, pa.string()),
    })
    pq.write_table(tbl, str(tmp / "documents.parquet"))
    docs = spark.read.parquet(str(tmp / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp}/documents.parquet')"
    )
    yield docs, con
    con.close()


def _flags(docs):
    out = QL.c4_quality_flags(docs.select("doc_id", "text"))
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        "c4_text",
        F.col("n_sentences").cast("long").alias("n_sentences"),
        "has_lorem_ipsum",
        "has_curly_brace",
        "c4_pass",
    )


def test_c4_oracle_parity_crafted(crafted):
    docs, con = crafted
    assert_matches_oracle(_flags(docs), con, ORC.c4_oracle())


def test_c4_hand_computed(crafted):
    docs, con = crafted
    rows = {r["doc_id"]: r for r in _flags(docs).collect()}
    # 0: all 3 lines kept, 3 sentences, passes
    assert rows[0]["n_kept_lines"] == 3
    assert rows[0]["n_sentences"] == 3
    assert rows[0]["c4_pass"] is True
    # 1: unpunctuated middle line dropped; '?' and '"' both terminal.
    # r8: the sentence proxy includes the end quote (advice #2 — a
    # quote-only-terminated line must count as a sentence), so the
    # '."' ending counts both marks: 1 + 1 + 2 = 4
    assert rows[1]["n_kept_lines"] == 3
    assert rows[1]["n_sentences"] == 4
    assert rows[1]["c4_pass"] is True
    # 2: three short lines dropped despite punctuation -> floor fails
    assert rows[2]["n_kept_lines"] == 1
    assert rows[2]["c4_pass"] is False
    # 3: javascript line dropped, 3 real sentences survive
    assert rows[3]["n_kept_lines"] == 3
    assert "javascript" not in rows[3]["c4_text"]
    assert rows[3]["c4_pass"] is True
    # 4: both policy lines dropped, 3 real sentences survive
    assert rows[4]["n_kept_lines"] == 3
    assert "privacy" not in rows[4]["c4_text"]
    assert rows[4]["c4_pass"] is True
    # 5/6: page drops trigger even with qualifying lines
    assert rows[5]["has_lorem_ipsum"] is True and rows[5]["c4_pass"] is False
    assert rows[6]["has_curly_brace"] is True and rows[6]["c4_pass"] is False
    # 7: CRLF — trailing \r tolerated by the \s*$ anchor
    assert rows[7]["n_kept_lines"] == 3
    assert rows[7]["c4_pass"] is True
    # 8: one line, three terminal marks = three sentences
    assert rows[8]["n_kept_lines"] == 1
    assert rows[8]["n_sentences"] == 3
    assert rows[8]["c4_pass"] is True
    # 9-11: degenerate docs fail closed, c4_text is '' (never NULL)
    for i in (9, 10, 11):
        assert rows[i]["n_kept_lines"] == 0
        assert rows[i]["c4_text"] == ""
        assert rows[i]["c4_pass"] is False
    # 12: quote-only-terminated lines — retained AND counted as
    # sentences (each line has open+close quote = 2 marks); under the
    # r7 proxy this page was retained with n_sentences == 0 and failed
    # the floor despite satisfying the published invariant
    assert rows[12]["n_kept_lines"] == 3
    assert rows[12]["n_sentences"] == 6
    assert rows[12]["c4_pass"] is True
    # 13: token-level javascript — "javascripting" survives, the bare
    # word drops its line; 3 sentences remain and the page passes
    assert rows[13]["n_kept_lines"] == 3
    assert "javascripting" in rows[13]["c4_text"]
    assert "javascript appears bare" not in rows[13]["c4_text"]
    assert rows[13]["c4_pass"] is True


def test_c4_clean_rewrites_and_filters(crafted):
    docs, _ = crafted
    out = QL.c4_clean(docs.select("doc_id", "text"))
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(kept) == {0, 1, 3, 4, 7, 8, 12, 13}
    assert kept[3] == (
        "The first real sentence of the page goes here.\n"
        "The second real sentence of the page goes here.\n"
        "The third real sentence of the page goes here."
    )
    # schema unchanged
    assert out.columns == ["doc_id", "text"]


def test_c4_badwords_page_drop(crafted):
    docs, _ = crafted
    flagged = QL.c4_quality_flags(
        docs.select("doc_id", "text"), badwords=("windows",)
    )
    rows = {r["doc_id"]: r["c4_pass"] for r in flagged.collect()}
    # doc 7 contains the blocked token; doc 0 does not
    assert rows[7] is False
    assert rows[0] is True


def test_c4_zero_shuffle_plan(crafted):
    """The audit operator is scan-stage work: no Exchange, no Python
    eval in the physical plan (the Gopher-gate discipline)."""
    docs, _ = crafted
    plan = _flags(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_nfc_normalize_composes_and_dedups(spark):
    """NFC normalization is the fingerprint-correctness op: composed
    and decomposed spellings of the same text get the SAME md5 only
    after normalization."""
    from excelstream_spark.functions.text import fingerprint, nfc_normalize_df

    composed = "café au lait"
    decomposed = "café au lait"
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)],
        "doc_id bigint, text string",
    )
    out = nfc_normalize_df(df).withColumn(
        "fp_raw", fingerprint(F.col("text"))
    ).withColumn("fp_nfc", fingerprint(F.col("text_nfc")))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["fp_raw"] != rows[2]["fp_raw"]       # under-dedup
    assert rows[1]["fp_nfc"] == rows[2]["fp_nfc"]       # fixed by NFC
    assert rows[3]["text_nfc"] is None                  # NULL stays NULL
    assert len(rows[2]["text_nfc"]) == len(composed)

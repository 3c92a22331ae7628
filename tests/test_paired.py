"""Cross-modal PAIRED dedup (operators/paired.py, r12 verdict #4):
the LAION-rule decision matrix over (image key, caption) pairs — all
four quadrants pinned on crafted frames, the keep closure, the
hot-image quarantine, and the image-only / caption-only falsifiers."""

from __future__ import annotations

from pyspark.sql import functions as F

from excelstream_spark.operators.paired import (
    paired_crossmodal_matrix,
    paired_dedup_keep,
)

#: two long, token-disjoint captions (>= 3 tokens each so both carry
#: shingles) — near-dup pairs append one token, unrelated pairs share
#: no shingle
_CAP_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_CAP_B = "uno dos tres cuatro cinco seis siete ocho nueve diez"


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, img_k bigint, caption string"
    )


def _matrix(spark, rows, **kw):
    df = paired_crossmodal_matrix(_pairs(spark, rows), **kw)
    return {
        (r["doc_a"], r["doc_b"]): (
            r["same_image"], r["cap_inter"], r["cap_union"],
            r["cap_match"], r["is_dup"],
        )
        for r in df.collect()
    }


def test_paired_all_four_quadrants(spark):
    """The decision matrix on a crafted frame that realizes every
    quadrant:

    * (1,2) same image + same caption        -> DUP (the only drop);
    * (1,3) same image + unrelated caption   -> KEEP (re-captioned —
      an image-only dedup would wrongly flag this pair);
    * (1,4) different image + same caption   -> KEEP (re-imaged — a
      caption-only dedup would wrongly flag this pair);
    * (4,5) different image + unrelated caption -> NOT A CANDIDATE
      (absent from the matrix entirely)."""
    m = _matrix(
        spark,
        [
            (1, 10, _CAP_A),
            (2, 10, _CAP_A),            # dup of 1
            (3, 10, _CAP_B),            # recaptioned image 10
            (4, 20, _CAP_A),            # same caption, different image
            (5, 30, _CAP_B + " extra"), # unrelated to 4 on both sides
        ],
    )
    assert m[(1, 2)][0] is True and m[(1, 2)][3] is True and m[(1, 2)][4] is True
    assert m[(1, 3)][0] is True and m[(1, 3)][3] is False and m[(1, 3)][4] is False
    assert m[(1, 4)][0] is False and m[(1, 4)][3] is True and m[(1, 4)][4] is False
    assert (4, 5) not in m
    # the falsifiers: an image-only dedup flags every same_image row,
    # a caption-only dedup every cap_match row — both would call a
    # KEEP quadrant a duplicate, which the is_dup column refuses
    assert any(si and not cm for si, _, _, cm, _ in m.values())
    assert any(cm and not si for si, _, _, cm, _ in m.values())


def test_paired_empty_captions_are_not_evidence(spark):
    """Two pairs sharing an image but with EMPTY captions are image
    candidates whose caption union is 0 — no caption evidence, so not
    a duplicate (the langid no-grams convention)."""
    m = _matrix(spark, [(1, 10, ""), (2, 10, "")])
    assert m[(1, 2)] == (True, 0, 0, False, False)


def test_paired_near_dup_caption_threshold(spark):
    """Caption matching is jaccard >= num/den on distinct shingles,
    integer-exact: appending one token to a 10-token caption keeps
    jaccard ~ 8/9 >= 1/2 (dup), while a half-overlapping caption can
    be pushed below a 4/5 threshold (kept at the stricter rational)."""
    rows = [
        (1, 10, _CAP_A),
        (2, 10, _CAP_A + " tail"),
    ]
    loose = _matrix(spark, rows)  # 1/2
    strict = _matrix(spark, rows, threshold_num=99, threshold_den=100)
    assert loose[(1, 2)][4] is True
    assert strict[(1, 2)][3] is False and strict[(1, 2)][4] is False


def test_paired_keep_closure(spark):
    """paired_dedup_keep drops exactly the non-min members of is_dup
    components: the dup twin goes, the re-captioned and re-imaged
    twins survive."""
    rows = [
        (1, 10, _CAP_A),
        (2, 10, _CAP_A),            # dup of 1 -> dropped
        (3, 10, _CAP_B),            # recap -> survives
        (4, 20, _CAP_A),            # reimg -> survives
    ]
    pairs = _pairs(spark, rows)
    matrix = paired_crossmodal_matrix(pairs)
    kept = sorted(
        r["doc_id"] for r in paired_dedup_keep(pairs, matrix).collect()
    )
    assert kept == [1, 3, 4]


def test_paired_hot_image_quarantine(spark):
    """max_image_df drops oversized image-fingerprint buckets from
    CANDIDATE GENERATION (the max_shingle_df shape): with a 3-member
    image class and bound 2, the class's pairs vanish from the matrix
    unless the caption side independently nominates them."""
    rows = [
        (1, 10, _CAP_A),
        (2, 10, _CAP_B),
        (3, 10, "omega psi chi phi upsilon tau sigma rho pi omicron"),
    ]
    full = _matrix(spark, rows)
    assert set(full) == {(1, 2), (1, 3), (2, 3)}
    pruned = _matrix(spark, rows, max_image_df=2)
    assert pruned == {}


def test_paired_matrix_plan_has_no_cartesian(spark):
    """The candidate stages are equality joins (fingerprint / shingle
    inverted index) — no CartesianProduct / BroadcastNestedLoopJoin
    anywhere in the executed plan."""
    rows = [(i, i % 3, _CAP_A + f" t{i}") for i in range(12)]
    plan = (
        paired_crossmodal_matrix(_pairs(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

"""Video family (operators/video.py): real APNG encode/decode
round-trips, per-frame perceptual fingerprints vs the DuckDB
arithmetic replay, frame-set containment dedup semantics + oracle, and
the zero-shuffle scan plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelstream_spark.operators.video import (
    apng_frame_arrays,
    dedup_video_containment,
    encode_apng,
    synthesize_video_payloads,
    video_frame_fingerprints,
)
from excelstream_spark.tables import load_table

from .conftest import SF_DIR, assert_matches_oracle


def _frames(seed: int, n: int, w: int = 16, h: int = 16):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(0, 256, size=h * w).astype(np.uint8).tobytes()
        for _ in range(n)
    ]


def test_apng_roundtrip_bit_exact():
    frames = _frames(3, 4)
    payload = encode_apng(16, 16, frames)
    out = apng_frame_arrays(payload)
    assert len(out) == 4
    for want, got in zip(frames, out):
        assert got.shape == (16, 16, 1)
        assert got.reshape(-1).tobytes() == want


def test_plain_png_decodes_as_one_frame_clip():
    from excelstream_spark.operators.multimodal import encode_png

    px = bytes(range(16)) * 16
    out = apng_frame_arrays(encode_png(16, 16, px))
    assert len(out) == 1
    assert out[0].reshape(-1).tobytes() == px


def test_apng_rejects_subregion_and_blend():
    """The baseline decoder supports exactly what the encoder emits:
    full-frame source-overwrite frames.  A sub-region or blended fcTL
    must raise, never return silently wrong pixels."""
    import struct
    import zlib as _z

    from excelstream_spark.operators.video import _FCTL_FMT, _chunk
    from excelstream_spark.operators.multimodal import _PNG_MAGIC

    w = h = 4
    px = bytes(range(16))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y * w : (y + 1) * w] for y in range(h))
    for fx, blend in ((1, 0), (0, 1)):
        fctl = struct.pack(_FCTL_FMT, 0, w, h, fx, 0, 1, 10, 0, blend)
        bad = (
            _PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"acTL", struct.pack(">II", 1, 0))
            + _chunk(b"fcTL", fctl)
            + _chunk(b"IDAT", _z.compress(raw))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="full-frame"):
            apng_frame_arrays(bad)


def test_video_frame_fingerprints_vs_duckdb_oracle(spark, duck):
    """The hash gate: per-frame aHash/dHash of the synthesized APNG
    fixture equal the DuckDB arithmetic replay bit-for-bit — decode
    (chunk walk, inflate, unfilter) + the integer hash construction
    proven end-to-end for multi-frame payloads."""
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    assert_matches_oracle(fps, duck, ORC.video_frame_fp_oracle())


def test_video_containment_semantics_crafted(spark):
    """Re-encode -> containment 1 (pairs); clip embedded in a longer
    compilation -> containment 1 on the shorter side (pairs); one
    shared frame out of three -> 1/3 (no pair at 0.8)."""
    base = _frames(11, 3)
    other = _frames(12, 2)
    rows = [
        (1, encode_apng(16, 16, base)),               # original
        (2, encode_apng(16, 16, list(base))),         # re-encode
        (3, encode_apng(16, 16, base[:2])),           # subset clip
        (4, encode_apng(16, 16, [base[0]] + other)),  # 1/3 shared
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id bigint, payload binary"
    )
    fps = video_frame_fingerprints(df)
    got = {
        (r["vid_a"], r["vid_b"]): r["containment"]
        for r in dedup_video_containment(fps, threshold=0.8).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert all(abs(v - 1.0) < 1e-12 for v in got.values())


def test_video_containment_skew_bounds(spark):
    """Degenerate frames (black/white cards) and over-``max_fp_df``
    boilerplate frames (shared intros) are pruned BEFORE set sizes are
    counted, so they neither pair videos nor distort the ratio."""
    intro = _frames(21, 1)[0]
    black = bytes(256)
    rows = []
    for vid in range(1, 8):
        frames = [intro, black] + _frames(100 + vid, 2)
        rows.append((vid, bytearray(encode_apng(16, 16, frames))))
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    fps = video_frame_fingerprints(df)
    # every video shares intro + black; unique tails -> no pairs once
    # the degenerate (black) and hot (intro, df=7 > 5) frames prune
    out = dedup_video_containment(fps, threshold=0.5, max_fp_df=5)
    assert out.count() == 0
    # without the DF cap the shared intro pairs everything at 1/3 --
    # visible, not silent (and the black card still never counts)
    loose = dedup_video_containment(fps, threshold=0.3, max_fp_df=None)
    assert loose.count() == 21  # all 7-choose-2 pairs


def test_video_containment_vs_duckdb_oracle(spark, duck):
    """Full containment replay over the synthesized fixture: distinct
    frame-fp sets (degenerate popcounts quarantined), inverted-index
    intersection, sizes over the surviving space, ratio filter."""
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    out = dedup_video_containment(fps, threshold=0.8, max_fp_df=None)
    assert_matches_oracle(
        out,
        duck,
        f"""
        WITH vf AS ({ORC.video_frame_fp_oracle()}),
        s AS (SELECT DISTINCT doc_id AS vid, fp_a AS fp FROM vf
              WHERE bit_count(fp_a) NOT IN (0, 64)),
        sz AS (SELECT vid, count(*) AS n FROM s GROUP BY vid),
        p AS (SELECT a.vid AS vid_a, b.vid AS vid_b,
                     CAST(count(*) AS BIGINT) AS inter
              FROM s a JOIN s b ON a.fp = b.fp AND a.vid < b.vid
              GROUP BY 1, 2)
        SELECT p.vid_a, p.vid_b, p.inter, na.n AS na, nb.n AS nb,
               p.inter * 1.0 / least(na.n, nb.n) AS containment
        FROM p
        JOIN sz na ON na.vid = p.vid_a
        JOIN sz nb ON nb.vid = p.vid_b
        WHERE p.inter * 1.0 / least(na.n, nb.n) >= 0.8
        """,
    )


def test_video_fingerprint_plan_is_scan_only(spark):
    """Decode + hash is scan work: the PAYLOAD bytes never shuffle.
    The only exchange allowed in the executed plan is the id-only
    round-robin fan-out BEFORE synthesis (r13 optimization: a
    1-partition upstream scan would otherwise serialize the Python
    encode+decode on one core) — it moves doc_id rows, never payloads
    or fingerprints."""
    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    fps = video_frame_fingerprints(synthesize_video_payloads(docs))
    fps.write.format("noop").mode("overwrite").save()
    plan = fps._jdf.queryExecution().executedPlan().toString()
    # Per-LINE assertions (r13 ADVICE #3: the old plan.split("+-")
    # merged ':-'-prefixed nodes into the preceding chunk, so an
    # Exchange could be skipped or a neighbor's text false-positive).
    # The bytes an exchange moves are its CHILD's output, so the line
    # after each Exchange line (the feeding node — a Project/Scan,
    # whose dump names its output columns) must carry no payload/fp
    # column; a ReusedExchange is a leaf whose own line names its
    # output, so it is checked directly.
    lines = plan.splitlines()
    n_exchanges = 0
    for i, line in enumerate(lines):
        if "Exchange" not in line:
            continue
        n_exchanges += 1
        assert "RoundRobinPartitioning" in line.replace(
            "roundrobinpartitioning", "RoundRobinPartitioning"
        ), line
        probe = line if "ReusedExchange" in line else (
            lines[i + 1] if i + 1 < len(lines) else ""
        )
        assert "payload" not in probe and "fp_a" not in probe, probe
    assert n_exchanges >= 1  # the id-only fan-out must be present
    assert plan.count("MapInPandas") >= 1


def test_corrupt_video_payloads_drop(spark):
    rows = [
        (1, bytearray(b"\x89PNG\r\n\x1a\x08garbage")),
        (2, bytearray(b"not a png at all")),
        (3, None),
        (4, bytearray(encode_apng(4, 4, [bytes(range(16))]))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = video_frame_fingerprints(df).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_sample_frames_real_over_apng(spark):
    """r10: the generic feature extractor reads the acTL frame count,
    so multimodal.sample_frames over an APNG clip explodes GENUINE
    frame indices (previously every PNG reported n_frames 1 and video
    sampling was plumbing-only)."""
    from excelstream_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    clip = encode_apng(8, 8, _frames(31, 5, 8, 8))
    df = spark.createDataFrame(
        [(1, bytearray(clip), {"content_type": "video/apng", "byte_len": len(clip)})],
        "doc_id bigint, payload binary, "
        "meta struct<content_type: string, byte_len: int>",
    )
    feats = extract_features(df).collect()
    assert feats[0]["n_frames"] == 5
    assert feats[0]["decoder"] == "apng-stdlib"
    sampled = sample_frames(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2, 4]


def test_diverse_fixture_linear_duplicate_structure(spark):
    """The scale-ladder fixture (synthesize_diverse_video_payloads):
    every clip content-unique except the planted within-copy twins
    (base%10 == 0 pairs with base+1), duplicate classes of size exactly
    2, cross-copy clips never collide — so containment pair count is
    linear in the corpus factor (the property the drift rung relies
    on; the ORACLE fixture deliberately saturates instead)."""
    from excelstream_spark.operators.video import (
        synthesize_diverse_video_payloads,
    )

    base = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    two_copies = base.unionAll(
        base.select((F.col("doc_id") + F.lit(100_000_000)).alias("doc_id"))
    )
    fps = video_frame_fingerprints(
        synthesize_diverse_video_payloads(two_copies)
    )
    pairs = dedup_video_containment(fps, threshold=0.8).collect()
    # per copy: bases 0,10,20,30 twin with 1,11,21,31 -> 4 pairs; two
    # copies -> 8 pairs, no cross-copy pair (copy is in the pixel seed)
    got = {(r["vid_a"], r["vid_b"]) for r in pairs}
    want = {
        (b + off, b + 1 + off)
        for b in (0, 10, 20, 30)
        for off in (0, 100_000_000)
    }
    assert got == want
    assert all(abs(r["containment"] - 1.0) < 1e-12 for r in pairs)


def _clip_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id bigint, payload binary"
    )


def test_video_increment_matches_batch_cross_pairs(spark):
    """Serving parity: with no corpus-hot fingerprints, the stored-
    artifact increment gate returns EXACTLY the batch operator's
    (new, corpus) cross pairs — same intersections, same sizes, same
    ratios (the incremental family's stream-vs-batch convention)."""
    from excelstream_spark.operators.video import (
        video_fp_sets,
        video_fp_sizes,
        video_increment_containment,
    )

    corpus_rows = [
        (1, encode_apng(16, 16, _frames(1, 4))),
        (2, encode_apng(16, 16, _frames(2, 3))),
        (3, encode_apng(16, 16, _frames(3, 5))),
    ]
    # 101: re-encode of corpus clip 1 (pairs at 1.0); 102: corpus clip
    # 2's frames embedded in a longer cut (pairs at 1.0 on 2's side);
    # 103: brand new (no pair)
    inc_rows = [
        (101, encode_apng(16, 16, _frames(1, 4))),
        (102, encode_apng(16, 16, _frames(2, 3) + _frames(99, 2))),
        (103, encode_apng(16, 16, _frames(42, 3))),
    ]
    corpus_fps = video_frame_fingerprints(_clip_df(spark, corpus_rows))
    inc_fps = video_frame_fingerprints(_clip_df(spark, inc_rows))
    sets = video_fp_sets(corpus_fps)
    got = {
        (r["new_vid"], r["corpus_vid"]): (
            r["inter"], r["n_new"], r["n_corpus"], r["containment"],
        )
        for r in video_increment_containment(
            inc_fps, sets, video_fp_sizes(sets), threshold=0.8
        ).collect()
    }
    batch = {
        (r["vid_b"], r["vid_a"]): (
            r["inter"], r["nb"], r["na"], r["containment"],
        )
        for r in dedup_video_containment(
            video_frame_fingerprints(
                _clip_df(spark, corpus_rows + inc_rows)
            ),
            threshold=0.8,
        ).collect()
        if r["vid_b"] >= 100 and r["vid_a"] < 100  # cross pairs only
    }
    assert got == batch
    assert set(got) == {(101, 1), (102, 2)}
    assert got[(101, 1)][3] == 1.0 and got[(102, 2)][3] == 1.0


def test_video_increment_corpus_hot_prune_is_build_time(spark):
    """Corpus-hot fingerprints (boilerplate intros) are pruned when the
    artifact is BUILT — an increment clip made of nothing but corpus
    boilerplate can then never pair, and the corpus sizes the serving
    join reads were counted over the pruned space."""
    from excelstream_spark.operators.video import (
        video_fp_sets,
        video_fp_sizes,
        video_increment_containment,
    )

    intro = _frames(7, 1)[0]
    corpus_rows = [
        (v, encode_apng(16, 16, [intro] + _frames(100 + v, 2)))
        for v in range(1, 6)
    ]
    corpus_fps = video_frame_fingerprints(_clip_df(spark, corpus_rows))
    sets = video_fp_sets(corpus_fps, max_fp_df=4)  # intro df=5 > 4
    sizes = video_fp_sizes(sets)
    assert {r["n"] for r in sizes.collect()} == {2}  # intro not counted
    inc = _clip_df(spark, [(200, encode_apng(16, 16, [intro, intro]))])
    out = video_increment_containment(
        video_frame_fingerprints(inc), sets, sizes, threshold=0.3
    )
    assert out.count() == 0


def test_video_increment_shuffles_only_the_increment(spark, tmp_path):
    """With the artifact saved bucketed on fp, the serving join's
    corpus side reads pre-partitioned — no Exchange between the sets
    table's FileScan and the containment join (the incremental.py
    plan contract)."""
    import uuid

    from excelstream_spark.operators.video import (
        save_video_fp_artifact,
        video_fp_sets,
        video_increment_containment,
    )

    base = f"vfp_{uuid.uuid4().hex[:8]}"
    corpus_rows = [
        (v, encode_apng(16, 16, _frames(v, 3))) for v in range(1, 9)
    ]
    sets = video_fp_sets(
        video_frame_fingerprints(_clip_df(spark, corpus_rows))
    )
    try:
        save_video_fp_artifact(sets, base, buckets=4)
        inc_rows = [(201, encode_apng(16, 16, _frames(1, 3)))]
        out = video_increment_containment(
            video_frame_fingerprints(_clip_df(spark, inc_rows)),
            spark.table(f"{base}_sets"),
            spark.table(f"{base}_sizes"),
            threshold=0.8,
        )
        assert {
            (r["new_vid"], r["corpus_vid"]) for r in out.collect()
        } == {(201, 1)}
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the corpus side reads its bucketed layout and its fp key is
        # never re-shuffled anywhere in the plan (only the increment's
        # rows move; every Exchange in the plan keys on vid aggregates)
        sets_scan = [
            ln for ln in plan.splitlines() if f"{base}_sets" in ln
        ]
        assert sets_scan and all(
            "Bucketed: true" in ln for ln in sets_scan
        ), plan[:2000]
        assert "Exchange hashpartitioning(fp" not in plan, plan[:2000]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}_sets")
        spark.sql(f"DROP TABLE IF EXISTS {base}_sizes")


def test_video_gate_matches_increment_join(spark):
    """The stateless broadcast gate and the bucketed-artifact join form
    are the SAME decision: for every arriving clip the gate's
    (best_vid, best_containment, is_dup) equals what the increment
    join's pair set implies."""
    from excelstream_spark.operators.video import (
        video_dedup_gate,
        video_fp_sets,
        video_fp_sizes,
        video_increment_containment,
    )

    corpus_rows = [
        (1, encode_apng(16, 16, _frames(1, 4))),
        (2, encode_apng(16, 16, _frames(2, 3))),
        (3, encode_apng(16, 16, _frames(3, 5))),
    ]
    inc_rows = [
        (101, encode_apng(16, 16, _frames(1, 4))),       # re-encode of 1
        (102, encode_apng(16, 16, _frames(2, 3) + _frames(99, 2))),
        (103, encode_apng(16, 16, _frames(42, 3))),      # new
    ]
    sets = video_fp_sets(
        video_frame_fingerprints(_clip_df(spark, corpus_rows))
    )
    sizes = video_fp_sizes(sets)
    set_rows = [(r["fp"], r["vid"]) for r in sets.collect()]
    size_rows = [(r["vid"], r["n"]) for r in sizes.collect()]
    gate = {
        r["doc_id"]: (r["best_vid"], r["best_containment"], r["is_dup"])
        for r in video_dedup_gate(
            _clip_df(spark, inc_rows), set_rows, size_rows, threshold=0.8
        ).collect()
    }
    joined = {
        r["new_vid"]: (r["corpus_vid"], r["containment"])
        for r in video_increment_containment(
            video_frame_fingerprints(_clip_df(spark, inc_rows)),
            sets,
            sizes,
            threshold=0.8,
        ).collect()
    }
    assert gate[101] == (joined[101][0], joined[101][1], True)
    assert gate[102] == (joined[102][0], joined[102][1], True)
    assert gate[103][2] is False and 103 not in joined


def test_streaming_video_gate_batch_parity_and_idempotence(spark):
    """The video gate under Structured Streaming, proven the stateless-
    gate family's standard way: exact-redelivery replay (2 deliveries),
    per-clip decisions bit-identical across deliveries, surviving set
    equal to the batch gate's."""
    import uuid

    from excelstream_spark.operators.video import (
        synthesize_diverse_video_payloads,
        video_dedup_gate,
        video_fp_sets,
        video_fp_sizes,
    )
    from excelstream_spark.streaming.pipelines import (
        replayed_docs_stream,
        run_available_now,
    )
    from excelstream_spark.tables import table_path

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    # standing corpus = even ids, artifact built once in batch.  The
    # DIVERSE fixture (not the oracle one): the oracle fixture's clip
    # space has cardinality <= 768, so every odd clip collides with
    # some even clip and the "survivors exist" half of the assertion
    # would be vacuous; the diverse fixture's only cross-parity match
    # is the planted base%10==0 <-> +1 twin (10<->11, 30<->31, ...)
    sets = video_fp_sets(
        video_frame_fingerprints(
            synthesize_diverse_video_payloads(
                docs.where(F.col("doc_id") % 2 == 0)
            )
        )
    )
    set_rows = [(r["fp"], r["vid"]) for r in sets.collect()]
    size_rows = [
        (r["vid"], r["n"]) for r in video_fp_sizes(sets).collect()
    ]
    batch = {
        r["doc_id"]: (r["best_vid"], r["best_containment"], r["is_dup"])
        for r in video_dedup_gate(
            synthesize_diverse_video_payloads(docs), set_rows, size_rows
        ).collect()
    }
    assert any(v[2] for v in batch.values())       # even ids self-match
    assert not all(v[2] for v in batch.values())   # some odd ids survive

    stream = replayed_docs_stream(spark, table_path(SF_DIR, "documents"))
    gated = video_dedup_gate(
        synthesize_diverse_video_payloads(
            stream.where(F.col("doc_id").isNotNull()).select("doc_id")
        ),
        set_rows,
        size_rows,
    )
    result = run_available_now(
        gated, f"vdg_{uuid.uuid4().hex[:8]}", output_mode="append"
    )
    rows = result.collect()
    per_doc: dict[int, set] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(
            (r["best_vid"], r["best_containment"], r["is_dup"])
        )
    assert all(len(v) == 1 for v in per_doc.values())  # idempotent
    assert {d: next(iter(v)) for d, v in per_doc.items()} == batch


def test_video_gate_rejects_mismatched_artifact(spark):
    """r10 advice #1: a corpus vid present in the fp index but missing
    from the sizes artifact fails FAST at gate setup with a diagnosable
    message, instead of a KeyError inside the Arrow worker mid-job."""
    from excelstream_spark.operators.video import video_dedup_gate

    with pytest.raises(ValueError, match="corpus_sizes is missing"):
        video_dedup_gate(
            _clip_df(spark, [(9, encode_apng(8, 8, _frames(9, 2, 8, 8)))]),
            corpus_sets=[(12345, 1), (23456, 2)],
            corpus_sizes=[(1, 4)],  # vid 2 has no build-time size
        )


def test_video_gate_verified_rejects_stale_seq_artifact(spark):
    """r11 advice #1: a vid PRESENT in the shingle index whose stored
    sn UNDERCOUNTS its shingles would inflate seq_containment past 1.0
    and falsely verify — unlike an absent vid (coalesce-to-zero,
    conservative).  The gate fails fast at setup, for a missing sizes
    row AND for a present-but-undercounting one; a strictly larger
    stored sn (deflating, conservative) is allowed."""
    from excelstream_spark.operators.video import video_dedup_gate_verified

    clips = _clip_df(spark, [(9, encode_apng(8, 8, _frames(9, 2, 8, 8)))])
    fp_sets = [(12345, 1)]
    fp_sizes = [(1, 1)]
    # vid 1 has 3 shingles in the index but the sizes artifact says 2
    with pytest.raises(ValueError, match="undercounts"):
        video_dedup_gate_verified(
            clips, fp_sets, fp_sizes,
            corpus_seq=[(11, 1), (22, 1), (33, 1)],
            corpus_seq_sizes=[(1, 2)],
        )
    # vid 1 present in the index with NO sizes row at all
    with pytest.raises(ValueError, match="undercounts"):
        video_dedup_gate_verified(
            clips, fp_sets, fp_sizes,
            corpus_seq=[(11, 1)],
            corpus_seq_sizes=[],
        )
    # a LARGER stored sn only deflates the ratio — allowed at setup
    video_dedup_gate_verified(
        clips, fp_sets, fp_sizes,
        corpus_seq=[(11, 1), (22, 1)],
        corpus_seq_sizes=[(1, 5)],
    )


def test_video_sequence_separates_reorder_from_reencode(spark):
    """r10 verdict #4 (order-aware video dedup): the set-containment
    close scores a scene-REORDERED re-edit identically to a re-encode;
    the sequence-shingle verify stage separates them.  Candidate
    semantics unchanged: every set-containment pair survives with a
    seq_containment column."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )

    fr = _frames(7, 4)  # A B C D
    rows = [
        (1, encode_apng(16, 16, fr)),                  # original
        (2, encode_apng(16, 16, fr)),                  # re-encode
        (3, encode_apng(16, 16, list(reversed(fr)))),  # reordered re-edit
        (4, encode_apng(16, 16, fr[1:])),              # uncut subset B C D
    ]
    out = {
        (r["vid_a"], r["vid_b"]): r
        for r in dedup_video_containment_verified(
            video_frame_fingerprints(_clip_df(spark, rows)),
            threshold=0.8,
            seq_threshold=0.8,
            n=2,
        ).collect()
    }
    # all three pairs are set-containment candidates (same frame sets)
    assert set(out) >= {(1, 2), (1, 3), (1, 4)}
    re_enc, re_edit, subset = out[(1, 2)], out[(1, 3)], out[(1, 4)]
    assert re_enc["containment"] == 1.0 and re_enc["seq_verified"]
    assert re_enc["seq_containment"] == 1.0
    # the reorder shares every frame HASH but no ordered bigram
    assert re_edit["containment"] == 1.0
    assert re_edit["seq_containment"] == 0.0
    assert not re_edit["seq_verified"]
    # an uncut subset keeps its shingle run intact on its own side
    assert subset["containment"] == 1.0 and subset["seq_verified"]


def test_video_sequence_short_clip_has_no_order_evidence(spark):
    """A clip shorter than n frames yields zero shingles: its candidate
    pairs keep seq_containment 0.0 (defined, not a null division) and
    do not verify."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )

    fr = _frames(11, 2)
    rows = [
        (1, encode_apng(16, 16, fr)),
        (2, encode_apng(16, 16, fr)),  # exact twin, but only 2 frames
    ]
    out = dedup_video_containment_verified(
        video_frame_fingerprints(_clip_df(spark, rows)),
        threshold=0.8,
        n=3,  # > clip length -> no shingles on either side
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["containment"] == 1.0
    assert r["seq_containment"] == 0.0 and not r["seq_verified"]


def test_video_sequence_vs_duckdb_oracle(spark, duck):
    """The standalone order-aware close replays in SQL over the
    synthesized fixture: shingle strings, 60-bit md5 shingle hashes,
    the hot-shingle prune, sizes and the ratio filter."""
    from excelstream_spark.operators.video import dedup_video_sequence
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    out = dedup_video_sequence(
        video_frame_fingerprints(synthesize_video_payloads(docs)),
        threshold=0.5,
        n=2,
    )
    assert_matches_oracle(
        out, duck, ORC.video_sequence_oracle(threshold=0.5, n=2)
    )


def test_video_sequence_verified_vs_duckdb_oracle(spark, duck):
    """The composed candidates+verify operator replays in SQL: the
    candidate stage verbatim (video_containment_oracle as a sub-CTE)
    plus the order-aware verify columns."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
    )
    from excelstream_spark.plans import oracles as ORC

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    out = dedup_video_containment_verified(
        video_frame_fingerprints(synthesize_video_payloads(docs)),
        threshold=0.8,
        seq_threshold=0.8,
        n=2,
    )
    assert_matches_oracle(
        out, duck, ORC.video_sequence_verified_oracle()
    )


def test_video_increment_verified_matches_batch_verified(spark):
    """The serving composition (stored fp artifact candidates + stored
    shingle artifact order-verify) equals the batch verified operator's
    cross pairs when the build-time df caps don't trip — the
    video_increment_containment parity contract extended to the
    order-aware columns."""
    from excelstream_spark.operators.video import (
        dedup_video_containment_verified,
        video_fp_sets,
        video_fp_sizes,
        video_increment_verified,
        video_seq_sizes,
        video_sequence_shingles,
    )

    corpus_rows = [
        (1, encode_apng(16, 16, _frames(1, 4))),
        (2, encode_apng(16, 16, _frames(2, 3))),
        (3, encode_apng(16, 16, _frames(3, 5))),
    ]
    inc_rows = [
        (101, encode_apng(16, 16, _frames(1, 4))),                 # re-encode of 1
        (102, encode_apng(16, 16, list(reversed(_frames(2, 3))))), # reorder of 2
        (103, encode_apng(16, 16, _frames(3, 5)[1:])),             # subset of 3
    ]
    corpus_fps = video_frame_fingerprints(_clip_df(spark, corpus_rows))
    inc_fps = video_frame_fingerprints(_clip_df(spark, inc_rows))
    sets = video_fp_sets(corpus_fps)
    sh = video_sequence_shingles(corpus_fps, n=2)
    served = {
        (r["new_vid"], r["corpus_vid"]): (
            r["containment"], r["seq_inter"], r["seq_containment"],
            r["seq_verified"],
        )
        for r in video_increment_verified(
            inc_fps, sets, video_fp_sizes(sets), sh, video_seq_sizes(sh),
            threshold=0.8, seq_threshold=0.8, n=2,
        ).collect()
    }
    both = video_frame_fingerprints(
        _clip_df(spark, corpus_rows + inc_rows)
    )
    batch = {
        (r["vid_b"], r["vid_a"]): (
            r["containment"], r["seq_inter"], r["seq_containment"],
            r["seq_verified"],
        )
        for r in dedup_video_containment_verified(
            both, threshold=0.8, seq_threshold=0.8, n=2
        ).collect()
        if r["vid_a"] <= 3 < r["vid_b"]  # cross pairs only
    }
    assert served == batch
    # semantics spot-check: re-encode verifies, reorder does not
    assert served[(101, 1)][3] is True
    assert served[(102, 2)][2] == 0.0 and served[(102, 2)][3] is False
    assert served[(103, 3)][3] is True


def test_video_gate_verified_matches_increment_join(spark):
    """The stateless order-verifying gate decides exactly what the
    serving join decides for the winning corpus vid — including the
    in-worker md5 shingle hash matching the engine's _h60 column
    expression bit-for-bit (the decision is a pure function of
    payload + broadcast artifacts)."""
    from excelstream_spark.operators.video import (
        video_dedup_gate_verified,
        video_fp_sets,
        video_fp_sizes,
        video_increment_verified,
        video_seq_sizes,
        video_sequence_shingles,
    )

    corpus_rows = [
        (1, encode_apng(16, 16, _frames(1, 4))),
        (2, encode_apng(16, 16, _frames(2, 3))),
    ]
    inc_rows = [
        (101, encode_apng(16, 16, _frames(1, 4))),                 # re-encode
        (102, encode_apng(16, 16, list(reversed(_frames(2, 3))))), # reorder
        (103, encode_apng(16, 16, _frames(42, 3))),                # new
    ]
    corpus_fps = video_frame_fingerprints(_clip_df(spark, corpus_rows))
    sets = video_fp_sets(corpus_fps)
    sh = video_sequence_shingles(corpus_fps, n=2)
    set_rows = [(r["fp"], r["vid"]) for r in sets.collect()]
    size_rows = [(r["vid"], r["n"]) for r in video_fp_sizes(sets).collect()]
    sh_rows = [(r["sh"], r["vid"]) for r in sh.collect()]
    sh_size_rows = [
        (r["vid"], r["sn"]) for r in video_seq_sizes(sh).collect()
    ]
    gate = {
        r["doc_id"]: (
            r["best_vid"], r["best_containment"], r["is_dup"],
            r["seq_containment"], r["seq_verified"],
        )
        for r in video_dedup_gate_verified(
            _clip_df(spark, inc_rows), set_rows, size_rows,
            sh_rows, sh_size_rows, threshold=0.8, seq_threshold=0.8, n=2,
        ).collect()
    }
    joined = {
        r["new_vid"]: (
            r["corpus_vid"], r["containment"], r["seq_containment"],
            r["seq_verified"],
        )
        for r in video_increment_verified(
            video_frame_fingerprints(_clip_df(spark, inc_rows)),
            sets, video_fp_sizes(sets), sh, video_seq_sizes(sh),
            threshold=0.8, seq_threshold=0.8, n=2,
        ).collect()
    }
    for vid in (101, 102):
        jv = joined[vid]
        assert gate[vid] == (jv[0], jv[1], True, jv[2], jv[3])
    assert gate[101][4] is True   # re-encode order-verifies
    assert gate[102][4] is False  # reorder fails the order verify
    assert gate[103][2] is False and 103 not in joined


def test_video_seq_artifact_shuffles_only_the_increment(spark, tmp_path):
    """The shingle artifact honors the same plan contract as the fp
    artifact: saved bucketed on sh, the verify join's corpus side reads
    pre-partitioned and the sh key is never re-shuffled — only the
    increment's rows move."""
    import uuid

    from excelstream_spark.operators.video import (
        save_video_fp_artifact,
        save_video_seq_artifact,
        video_fp_sets,
        video_increment_verified,
        video_sequence_shingles,
    )

    base = f"vsq_{uuid.uuid4().hex[:8]}"
    corpus_rows = [
        (v, encode_apng(16, 16, _frames(v, 3))) for v in range(1, 9)
    ]
    corpus_fps = video_frame_fingerprints(_clip_df(spark, corpus_rows))
    sets = video_fp_sets(corpus_fps)
    sh = video_sequence_shingles(corpus_fps, n=2)
    try:
        save_video_fp_artifact(sets, base, buckets=4)
        save_video_seq_artifact(sh, base, buckets=4)
        inc_rows = [(201, encode_apng(16, 16, _frames(1, 3)))]
        out = video_increment_verified(
            video_frame_fingerprints(_clip_df(spark, inc_rows)),
            spark.table(f"{base}_sets"),
            spark.table(f"{base}_sizes"),
            spark.table(f"{base}_sh"),
            spark.table(f"{base}_sh_sizes"),
            threshold=0.8,
        )
        rows = out.collect()
        assert {(r["new_vid"], r["corpus_vid"]) for r in rows} == {(201, 1)}
        assert rows[0]["seq_verified"] is True  # identical clip
        plan = out._jdf.queryExecution().executedPlan().toString()
        for t in (f"{base}_sets", f"{base}_sh"):
            # match the table's own FileScan only ("_sh[" does not hit
            # the unbucketed "_sh_sizes" scan lines)
            scans = [ln for ln in plan.splitlines() if f"{t}[" in ln]
            assert scans and all(
                "Bucketed: true" in ln for ln in scans
            ), plan[:2000]
        assert "Exchange hashpartitioning(fp" not in plan, plan[:2000]
        assert "Exchange hashpartitioning(sh" not in plan, plan[:2000]
    finally:
        for t in ("_sets", "_sizes", "_sh", "_sh_sizes"):
            spark.sql(f"DROP TABLE IF EXISTS {base}{t}")


def test_streaming_video_gate_verified_batch_parity_and_idempotence(spark):
    """The ORDER-verifying gate under Structured Streaming (the
    stateless-gate family's standard proof): exact-redelivery replay,
    per-clip decisions — including the seq_containment verify columns —
    bit-identical across deliveries and equal to the batch gate's."""
    import uuid

    from excelstream_spark.operators.video import (
        synthesize_diverse_video_payloads,
        video_dedup_gate_verified,
        video_fp_sets,
        video_fp_sizes,
        video_seq_sizes,
        video_sequence_shingles,
    )
    from excelstream_spark.streaming.pipelines import (
        replayed_docs_stream,
        run_available_now,
    )
    from excelstream_spark.tables import table_path

    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("doc_id").isNotNull()
    )
    corpus_fps = video_frame_fingerprints(
        synthesize_diverse_video_payloads(
            docs.where(F.col("doc_id") % 2 == 0)
        )
    )
    sets = video_fp_sets(corpus_fps)
    sh = video_sequence_shingles(corpus_fps, n=2)
    set_rows = [(r["fp"], r["vid"]) for r in sets.collect()]
    size_rows = [
        (r["vid"], r["n"]) for r in video_fp_sizes(sets).collect()
    ]
    sh_rows = [(r["sh"], r["vid"]) for r in sh.collect()]
    sh_size_rows = [
        (r["vid"], r["sn"]) for r in video_seq_sizes(sh).collect()
    ]

    def decisions(df):
        return {
            r["doc_id"]: (
                r["best_vid"], r["best_containment"], r["is_dup"],
                r["seq_containment"], r["seq_verified"],
            )
            for r in df
        }

    batch = decisions(
        video_dedup_gate_verified(
            synthesize_diverse_video_payloads(docs),
            set_rows, size_rows, sh_rows, sh_size_rows, n=2,
        ).collect()
    )
    # the planted twins are SUBSETS in the same order: they must both
    # set-match and order-verify
    dups = {d: v for d, v in batch.items() if v[2]}
    assert dups and all(v[4] for v in dups.values())

    stream = replayed_docs_stream(spark, table_path(SF_DIR, "documents"))
    gated = video_dedup_gate_verified(
        synthesize_diverse_video_payloads(
            stream.where(F.col("doc_id").isNotNull()).select("doc_id")
        ),
        set_rows, size_rows, sh_rows, sh_size_rows, n=2,
    )
    rows = run_available_now(
        gated, f"vgv_{uuid.uuid4().hex[:8]}", output_mode="append"
    ).collect()
    per_doc: dict[int, set] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(
            (
                r["best_vid"], r["best_containment"], r["is_dup"],
                r["seq_containment"], r["seq_verified"],
            )
        )
    assert all(len(v) == 1 for v in per_doc.values())  # idempotent
    assert {d: next(iter(v)) for d, v in per_doc.items()} == batch

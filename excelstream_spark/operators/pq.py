"""Product quantization (PQ) ANN — the compression rung below int8.

Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest
Neighbor Search", TPAMI): split each d-dim vector into ``m``
subvectors, learn a ``k``-centroid codebook per subspace, store each
vector as ``m`` small codes.  With the defaults here (d=64, m=8,
k=256 — the paper's classic 8-bit configuration) a vector is 8
BYTES — 32x smaller than float32, 8x smaller than
`operators/quantize.py`'s int8+scale rung (whose module docstring
names PQ as the next rung of the ladder; this module is that rung) —
and scoring never reconstructs the corpus: the query precomputes one
inner-product lookup table per subspace (asymmetric distance
computation, ADC) and each corpus row costs ``m`` table lookups + a
sum.

Division of labor (the clustering.py trichotomy applied to PQ):

- TRAINING (:func:`pq_train`) is sample-based and driver-side — the
  FAISS convention (codebooks train on ~10^5-10^6 sampled vectors
  regardless of corpus size; a 100 TB corpus does not need — and
  cannot use — more training data for 16 centroids of an 8-dim
  subspace).  The sample is the ``sample_n`` smallest
  ``md5(cast(id))`` rows (the repo's deterministic-draw convention,
  curation/sampling), so the codebook is a reproducible function of
  the corpus.  Lloyd runs in float64 numpy; the CODEBOOK, not the
  trainer, is the contract.
- ENCODING (:func:`pq_encode`) is distributed, scan-shaped and
  ENGINE-EXACT given the codebook: per-dimension squared differences
  accumulate LEFT-TO-RIGHT in float64 (bit-identical IEEE ops in the
  same order on every engine), and the argmin breaks ties by
  ascending code index — so the emitted codes replay bit-for-bit in
  DuckDB from the codebook literals (:func:`pq_codes_oracle_sql`;
  pinned in tests/test_pq.py).  One Arrow-batched ``mapInPandas``,
  zero shuffle — the artifact-build pass.
- SCORING (:func:`topk_pq`) is the quantize.topk_quantized shape:
  queries broadcast as per-subspace LUTs, the code column streams
  through one Arrow pass (``m`` gathers + a sum per row — no
  reconstruction), per-batch top-k pruning keeps the shuffle at
  O(partitions x queries x k), then one window closes the global
  top-k.  Scores are approximate cosine (query x reconstructed
  corpus); recall@k against the exact brute force is pinned in tests,
  and callers needing exact results re-rank the top-k' candidates —
  the IVF/int8 contract.

100 TB design: the 8-byte code column is the ONLY corpus data the
scorer touches (a 10^11-vector corpus is 800 GB of codes vs 26 TB of
float32 — the difference between a scan and a cluster-wide spill);
encode is embarrassingly parallel scan work; the codebook (m*k*dsub
floats, ~4 KB) broadcasts inside the LUT closure.  The composition
with the IVF cell structure (`similarity.py`) is implemented here
too: :func:`ivf_pq_index` builds the (id, cid, code) artifact and
:func:`ivf_pq_topk` probes it — PQ compresses WITHIN cells, IVF
prunes ACROSS them (the standard billion-scale IVF-PQ stack); with
every cell probed the output equals plain :func:`topk_pq` exactly
(pinned), so the probe is a pure pruning layer.

The reference engine (KSD-CO/excelstream) has no vector surface; this
extends the similarity family (`SURVEY.md` §6, quantize.py's ladder).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from excelstream_spark.partitioning import fan_out

#: defaults sized for the 64-dim fixture embeddings: 8 subspaces of 8
#: dims, 256 codes each (one full byte per code — the classic 8-bit
#: PQ) -> 8-byte codes.  Any k <= 256 fits the byte layout; the
#: DuckDB-replay pytest trains a k=16 codebook to keep the exhaustive
#: oracle SQL compact (the cross-engine arithmetic contract is
#: k-independent).
DEFAULT_M = 8
DEFAULT_K = 256

#: Driver-traffic ceiling for the query side of the ADC/IVF serving
#: paths (r10 verdict #6).  These paths move nq (the collected query
#: frame, which also sizes the per-query LUT broadcast into every
#: scorer task) plus nq x n_probe (the probe assignment) rows through
#: the driver BY DESIGN — the "broadcast the small query side"
#: convention.  That is kilobytes at the intended serving scale
#: (nq ~ 10^2-10^3) and silently multi-MB at a 10^5-query batch, so
#: the bound is stated and VALIDATED like bloom sizing instead of
#: living only in a docstring: exceeding it raises with the fix
#: (split the query batch, or pass ``max_driver_rows`` deliberately).
MAX_DRIVER_QUERY_ROWS = 100_000


def _bounded_query_collect(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int = 1,
    max_driver_rows: int | None = None,
):
    """toPandas() of the query side under the stated driver bound:
    at most ``bound + 1`` rows are ever pulled (the +1 detects
    overflow without a separate count job), and ``nq * n_probe`` must
    also clear the bound since the probe collect scales with it."""
    bound = (
        MAX_DRIVER_QUERY_ROWS
        if max_driver_rows is None
        else int(max_driver_rows)
    )
    qpdf = queries.select(id_col, vec_col).limit(bound + 1).toPandas()
    nq = len(qpdf)
    probe_rows = nq * max(int(n_probe), 1)
    if nq > bound or probe_rows > bound:
        size = f"over {bound}" if nq > bound else str(nq)
        raise ValueError(
            f"pq: query batch of {size} rows x n_probe={n_probe} "
            f"exceeds the driver-traffic bound of {bound} rows "
            "(the query frame and its probe assignment are collected "
            "and broadcast by design) — split the query batch, or "
            "pass max_driver_rows explicitly to accept the transfer"
        )
    return qpdf


@dataclass(frozen=True)
class PQCodebook:
    """Trained product-quantization codebook: ``centroids[s][c]`` is
    the float64 centroid ``c`` of subspace ``s`` (shape (m, k_s, dsub),
    ragged in k only if the sample had fewer distinct subvectors)."""

    dim: int
    m: int
    centroids: tuple  # tuple[s] of np.ndarray (k_s, dsub), float64

    @property
    def dsub(self) -> int:
        return self.dim // self.m


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
    n_iter: int = 4,
    sample_n: int = 4096,
) -> PQCodebook:
    """Train per-subspace codebooks on a deterministic sample.

    Sample = the ``sample_n`` rows with the smallest
    ``md5(cast(id AS string))`` (ties by id) — reproducible and
    content-independent, the seeded-draw convention.  Per subspace:
    init = the first ``k`` DISTINCT subvectors in sample order, then
    ``n_iter`` Lloyd steps in float64 (assign by squared L2, ties to
    the lowest centroid index; update = member mean; an empty cluster
    keeps its previous centroid so k never silently shrinks
    mid-iteration).  Driver-side on <= sample_n rows — the
    broadcast-the-model shape (the codebook is ~4 KB)."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty sample (no non-null vectors)")
    if k > 256:
        # codes are stored one byte per subspace; a 257th centroid
        # would silently wrap (code 300 -> byte 44) and corrupt every
        # artifact built from the codebook
        raise ValueError(f"pq_train: k={k} exceeds the byte layout (max 256)")
    V = np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)
    dim = V.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cbs = []
    for s in range(m):
        X = V[:, s * dsub : (s + 1) * dsub]
        # first k distinct subvectors in sample order
        seen: dict[bytes, int] = {}
        init = []
        for row in X:
            key = row.tobytes()
            if key not in seen:
                seen[key] = 1
                init.append(row)
                if len(init) == k:
                    break
        C = np.asarray(init, dtype=np.float64)
        for _ in range(n_iter):
            # (n, k) squared distances; argmin ties -> lowest index
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            asg = D.argmin(axis=1)
            for c in range(C.shape[0]):
                members = X[asg == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        cbs.append(C)
    return PQCodebook(dim=dim, m=m, centroids=tuple(cbs))


def _encode_matrix(V64: np.ndarray, cb: PQCodebook) -> np.ndarray:
    """(n, m) uint8 codes with the ENGINE-EXACT distance construction:
    per-dim squared differences accumulate left-to-right in float64
    (the same IEEE op sequence the SQL replay's left-associated ``+``
    chain performs), argmin ties to the lowest code index (numpy
    argmin is first-occurrence — the same rule as the oracle's
    ``row_number() OVER (ORDER BY dist, code)``)."""
    n = V64.shape[0]
    codes = np.empty((n, cb.m), dtype=np.uint8)
    dsub = cb.dsub
    # over=ignore: a squared term may overflow to inf — the intended
    # IEEE behavior, identical in the SQL replay (hypothesis-pinned)
    with np.errstate(over="ignore"):
        for s in range(cb.m):
            C = cb.centroids[s]
            if C.shape[0] > 256:
                raise ValueError(
                    f"subspace {s} has {C.shape[0]} centroids — the "
                    "uint8 code layout holds at most 256"
                )
            D = np.zeros((n, C.shape[0]), dtype=np.float64)
            for j in range(dsub):
                t = V64[:, s * dsub + j, None] - C[None, :, j]
                D += t * t
            codes[:, s] = D.argmin(axis=1).astype(np.uint8)
    return codes


def pq_encode(
    df: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, code: binary) — the stored PQ artifact, ``m`` bytes per
    vector (code byte ``s`` = the subspace-``s`` centroid index).
    Rows with NULL or wrong-length vectors are dropped (an artifact
    row asserts "this vector encodes to these codes" — the image_ahash
    convention).  One Arrow-batched ``mapInPandas``, zero shuffle;
    bit-replayable in DuckDB via :func:`pq_codes_oracle_sql`."""
    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("code", BinaryType()),
        ]
    )
    dim = codebook.dim

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_ids, vecs = [], []
            for i, v in zip(pdf["_id"], pdf["_v"]):
                if v is not None and len(v) == dim:
                    keep_ids.append(i)
                    vecs.append(np.asarray(v, dtype=np.float64))
            if not keep_ids:
                continue
            codes = _encode_matrix(np.stack(vecs), codebook)
            yield pd.DataFrame(
                {"id": keep_ids, "code": [row.tobytes() for row in codes]}
            )

    prepared = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    return prepared.mapInPandas(enc, out_schema)


def pq_codes_long(encoded: DataFrame) -> DataFrame:
    """(id, sub, code) — the binary code column unpacked JVM-side (the
    dequantize_expr hex convention: a binary->string cast would apply
    UTF-8 and corrupt bytes >= 0x80).  The oracle-comparison form, and
    the proof that the binary packing itself round-trips."""
    hexed = F.hex(F.col("code"))
    n = F.octet_length(F.col("code"))
    entries = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.conv(hexed.substr(s * 2 + 1, F.lit(2)), 16, 10)
            .cast("int")
            .alias("c"),
        ),
    )
    return encoded.select(
        "id", F.explode(entries).alias("e")
    ).select("id", F.col("e.sub").alias("sub"), F.col("e.c").alias("code"))


def pq_codes_oracle_sql(
    codebook: PQCodebook,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB SQL replaying :func:`pq_encode` bit-for-bit from the
    codebook literals -> (id, sub, code).  Centroids embed via
    ``repr(float)`` (the shortest round-trip decimal — DuckDB parses
    it back to the identical double); each distance is the same
    left-associated chain of float64 ``(v-c)*(v-c)`` terms the encoder
    accumulates; the argmin is ``row_number() OVER (ORDER BY dist,
    code)`` = numpy's first-occurrence argmin."""
    dsub = codebook.dsub
    selects = []
    for s, C in enumerate(codebook.centroids):
        for c in range(C.shape[0]):
            terms = " + ".join(
                f"(e[{s * dsub + j + 1}] - {float(C[c, j])!r})"
                f" * (e[{s * dsub + j + 1}] - {float(C[c, j])!r})"
                for j in range(dsub)
            )
            selects.append(
                f"SELECT id, {s} AS sub, {c} AS code, ({terms}) AS dist FROM v"
            )
    union = "\nUNION ALL\n".join(selects)
    return f"""
        WITH v AS (
          SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
          WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {codebook.dim}
        ),
        dists AS (
          {union}
        ),
        ranked AS (
          SELECT id, sub, code,
                 row_number() OVER (PARTITION BY id, sub
                                    ORDER BY dist, code) AS rn
          FROM dists
        )
        SELECT id, sub, code FROM ranked WHERE rn = 1
    """


def topk_pq(
    codes: DataFrame,
    codebook: PQCodebook,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    exclude_self: bool = True,
    max_driver_rows: int | None = None,
) -> DataFrame:
    """Top-k approximate cosine of float ``queries`` against a PQ-coded
    corpus (output of :func:`pq_encode`) via asymmetric distance
    computation: per query and subspace, precompute the 16 inner
    products query_sub x centroid (plus the centroid norm table, both
    query-independent of corpus size); each corpus row then costs
    ``m`` gathers + a sum — the corpus vectors are NEVER reconstructed
    or even read.  Same two-level top-k shape as quantize.
    topk_quantized: per-batch pruning bounds the shuffle at
    O(partitions x queries x k), one window closes.

    Returns (query_id, neighbor_id, rank, cos_sim) — cos_sim is the
    query x reconstructed-corpus cosine (approximate; recall vs the
    exact brute force is pinned in tests/test_pq.py).  The query-side
    collect runs under :data:`MAX_DRIVER_QUERY_ROWS`;
    ``max_driver_rows`` is the deliberate escape hatch for larger
    batches (the ivf_pq_topk convention)."""
    return _adc_topk(
        codes, codebook, queries, vec_col, id_col, k, exclude_self, None,
        max_driver_rows=max_driver_rows,
    )


def _adc_topk(
    codes: DataFrame,
    codebook: PQCodebook,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    exclude_self: bool,
    cell_probes: dict | None,
    qpdf=None,
    max_driver_rows: int | None = None,
) -> DataFrame:
    """The shared ADC engine behind :func:`topk_pq` (cell_probes=None —
    score every row for every query) and :func:`ivf_pq_topk`
    (cell_probes = {cid: np.ndarray of query indices} — ``codes``
    carries a ``cid`` column, and a row scores only for the queries
    probing its cell; everything else is masked to -inf before the
    per-batch top-k).  ``qpdf``: a pre-collected queries frame — REQUIRED
    whenever cell_probes is set, because the probe indices were computed
    against that exact row order and a second toPandas() of a
    non-order-stable queries plan could lay the LUT out differently
    (masking query i against query j's column)."""
    spark = codes.sparkSession
    if qpdf is None:
        qpdf = _bounded_query_collect(
            queries, id_col, vec_col, max_driver_rows=max_driver_rows
        )
    out_schema = StructType(
        [
            StructField("query_id", queries.schema[id_col].dataType),
            StructField("neighbor_id", codes.schema["id"].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )
    if len(qpdf) == 0:
        return spark.createDataFrame(
            [],
            StructType(
                out_schema.fields + [StructField("rank", IntegerType())]
            ),
        ).select("query_id", "neighbor_id", "rank", "cos_sim")
    Q = np.stack(
        [np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]]
    )
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = 1.0
    Qn = Q / qn[:, None]
    m, dsub = codebook.m, codebook.dsub
    k_max = max(C.shape[0] for C in codebook.centroids)
    nq = len(qpdf)
    # LUT[s][c][q] = <centroid_{s,c}, qn_sub>; NORM2[s][c] = |centroid|^2
    lut = np.zeros((m, k_max, nq), dtype=np.float64)
    norm2 = np.zeros((m, k_max), dtype=np.float64)
    for s, C in enumerate(codebook.centroids):
        lut[s, : C.shape[0], :] = C @ Qn[:, s * dsub : (s + 1) * dsub].T
        norm2[s, : C.shape[0]] = (C * C).sum(axis=1)
    bc = spark.sparkContext.broadcast(
        (qpdf[id_col].to_numpy(), lut, norm2, cell_probes)
    )
    with_cell = cell_probes is not None

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, T, N2, probes = bc.value
        mm = T.shape[0]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8)
            codes_m = raw.reshape(len(pdf), mm)
            S = np.zeros((len(pdf), T.shape[2]), dtype=np.float64)
            n2 = np.zeros(len(pdf), dtype=np.float64)
            for s in range(mm):
                S += T[s, codes_m[:, s], :]
                n2 += N2[s, codes_m[:, s]]
            rn = np.sqrt(n2)
            rn[rn == 0.0] = 1.0
            S /= rn[:, None]
            c_ids = pdf["id"].to_numpy()
            if probes is not None:
                # IVF mask: a row is visible only to the queries
                # probing its cell (one pass over the <= n_probed
                # distinct cells in the batch)
                allowed = np.zeros(S.shape, dtype=bool)
                cells = pdf["cid"].to_numpy()
                for cell in np.unique(cells):
                    qs = probes.get(cell)
                    if qs is not None and len(qs):
                        rows = np.nonzero(cells == cell)[0]
                        allowed[np.ix_(rows, qs)] = True
                S[~allowed] = -np.inf
            if exclude_self:
                S[c_ids[:, None] == qids[None, :]] = -np.inf
            kk = min(k, S.shape[0])
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                col = S[:, j]
                if S.shape[0] > kk:
                    part = np.argpartition(-col, kk - 1)[:kk]
                    cand = np.nonzero(col >= col[part].min())[0]
                else:
                    cand = np.arange(S.shape[0])
                order = cand[np.lexsort((c_ids[cand], -col[cand]))][:kk]
                order = order[col[order] > -np.inf]
                out_q.append(np.full(len(order), qids[j]))
                out_n.append(c_ids[order])
                out_s.append(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_s),
                }
            )

    cols = ["id", "code"] + (["cid"] if with_cell else [])
    local = fan_out(codes.select(*cols)).mapInPandas(
        score, out_schema
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def topk_pq_reranked(
    codes: DataFrame,
    codebook: PQCodebook,
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    k_prime: int = 20,
    max_driver_rows: int | None = None,
) -> DataFrame:
    """The full PQ serving composition (the published two-stage shape):
    :func:`topk_pq` proposes ``k_prime`` ADC candidates per query from
    the 8-byte codes alone, then ONLY those nq x k_prime candidate
    vectors are fetched from the float corpus and re-scored with the
    exact JVM cosine (`functions/vectors.cosine`) — so the final top-k
    carries EXACT scores, the corpus float column is touched for a
    candidate-sized sliver instead of a full scan, and recall equals
    the candidate recall (0.94+ at the defaults, pinned in tests).
    The candidate set is tiny (nq*k_prime rows) and broadcasts into
    the fetch join; per-query closing is one window over nq*k_prime
    rows."""
    from excelstream_spark.functions import vectors as VEC

    cand = topk_pq(
        codes, codebook, queries, vec_col, id_col, k=k_prime,
        max_driver_rows=max_driver_rows,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    # the candidate side (nq*k_prime rows, query vectors attached) is
    # explicitly the broadcast side: the float corpus streams map-side
    # and only candidate rows survive the join
    scored = cv.join(
        F.broadcast(cand.join(F.broadcast(qv), "query_id")),
        "neighbor_id",
    ).withColumn("cos_sim", VEC.cosine(F.col("_qv"), F.col("_cv")))
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_pq_index(
    corpus: DataFrame,
    codebook: PQCodebook,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_every: int = 50,
):
    """(centroids, coded) — the IVF-PQ artifact: ``coded`` is
    (id, cid, code), i.e. each vector's IVF cell plus its 8-byte PQ
    code — the standard billion-scale index layout (IVF prunes ACROSS
    cells, PQ compresses WITHIN them).  Cell assignment is the
    similarity.assign_ivf_cells broadcast matmul (seeded deterministic
    centroids; a trained kmeans_centroids table drops in unchanged);
    codes come from :func:`pq_encode`; one build-time join on id ties
    them (the artifact builds once — at scale WRITE ``coded``
    partitioned by ``cid`` so probing prunes whole partitions before
    any byte is read)."""
    from excelstream_spark.operators import similarity as SIM

    centroids, assigned = SIM.assign_ivf_cells(
        corpus, vec_col, id_col, centroid_every
    )
    codes = pq_encode(corpus, codebook, vec_col, id_col)
    coded = codes.join(assigned.select("id", "cid"), "id")
    return centroids, coded


def ivf_pq_topk(
    coded: DataFrame,
    codebook: PQCodebook,
    centroids: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_probe: int = 3,
    exclude_self: bool = True,
    max_driver_rows: int | None = None,
) -> DataFrame:
    """IVF-PQ search: probe the ``n_probe`` nearest cells per query
    (broadcast matmul against the tiny centroid table), filter the
    coded artifact to the UNION of probed cells (an ``isin`` on the
    cell column — partition pruning when the artifact is stored
    partitioned by cid), then ADC-score the survivors with a per-cell
    visibility mask (a row scores only for the queries that probed its
    cell).  Per probed row the cost is the same m-gathers-and-a-sum as
    :func:`topk_pq`; the corpus fraction touched is ~n_probe/n_cells.
    With ``n_probe >= n_cells`` the output EQUALS plain
    :func:`topk_pq` (pinned in tests) — the probe is a pure pruning
    layer over the identical scorer.

    Driver traffic is bounded AND validated (r10 verdict #6): the
    probe collect is nq x n_probe rows and the query frame nq rows
    (the topk_quantized/ADC convention of broadcasting the query
    side); both must clear :data:`MAX_DRIVER_QUERY_ROWS` (or an
    explicit ``max_driver_rows``) or the call raises before pulling
    the batch — a 10^5-query batch cannot silently move MBs through
    the driver.  The cell->queries map broadcasts inside the scorer
    closure."""
    from excelstream_spark.operators import vectorized as VZ

    probes = VZ.nearest_against_broadcast(
        queries,
        centroids,
        vec_col=vec_col,
        id_col=id_col,
        n_nearest=n_probe,
        carry_vec=False,
    ).select(F.col("id").alias("qid"), "cid")
    # collect the queries ONCE: the probe indices below are positions
    # in THIS frame, and the scorer must index its LUT by the same
    # order (a second toPandas() of a non-order-stable plan could lay
    # the queries out differently — the same frame object is threaded
    # through _adc_topk instead).  The collect runs under the stated
    # driver bound: nq AND nq x n_probe must clear it, because the
    # probes.collect() below scales with the product
    qpdf = _bounded_query_collect(
        queries, id_col, vec_col, n_probe=n_probe,
        max_driver_rows=max_driver_rows,
    )
    if qpdf[id_col].duplicated().any():
        # a dict {qid: position} would keep only the LAST duplicate's
        # position: earlier duplicates' LUT columns would get no probes
        # and silently return zero rows, diverging from topk_pq's
        # full-probe contract (r9 advice #3)
        dup = sorted(qpdf[id_col][qpdf[id_col].duplicated()].unique().tolist())
        raise ValueError(
            f"ivf_pq_topk: duplicate query ids {dup[:5]} — query ids "
            "must be unique (dedup the query frame first)"
        )
    qpos = {qid: i for i, qid in enumerate(qpdf[id_col])}
    cell_probes: dict = {}
    for r in probes.collect():
        cell_probes.setdefault(r["cid"], []).append(qpos[r["qid"]])
    cell_probes = {
        c: np.asarray(sorted(set(v)), dtype=np.int64)
        for c, v in cell_probes.items()
    }
    if not cell_probes:
        # no queries, OR queries but an empty centroid table: either
        # way the answer is the typed empty frame — never scan the
        # artifact to mask every row to -inf
        probed = coded.limit(0)
    else:
        probed = coded.where(
            F.col("cid").isin([int(c) for c in cell_probes])
        )
    return _adc_topk(
        probed,
        codebook,
        queries,
        vec_col,
        id_col,
        k,
        exclude_self,
        cell_probes,
        qpdf=qpdf,
    )

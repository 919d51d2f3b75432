"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force baseline: broadcast the (small) query
  set, cosine via native ``zip_with``/``aggregate`` arithmetic (JVM
  codegen, no Python), per-query top-k via window.  Exact; cost O(n·q).
* :func:`lsh_ann_topk` — the scale path: random-hyperplane signatures
  bucket the corpus; each query probes only its bucket (equi-join instead
  of a cross join), then exact cosine re-ranks within the bucket.
  Approximate; recall tunable via ``planes`` (fewer planes = bigger
  buckets = higher recall, more compute).

Both shapes survive 100×: brute force scales with a broadcast (queries are
small by construction); ANN turns the cross join into a hash-partitioned
equi-join on the signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — pandas_udf type hints resolve against module globals
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(a: Column, b: Column) -> Column:
    """Native dot product: fold left in element order (deterministic float
    summation — matches a sequential loop bit-for-bit)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (queries broadcast).  Ties broken by
    neighbor id for full determinism."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    scored = corpus.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((planes, dim))


def hyperplane_signature(
    df: DataFrame, vec_col: str = "embedding", planes: int = 16,
    seed: int = 42, dim: int = 64,
) -> DataFrame:
    """Adds ``sig long``: random-hyperplane sign bits packed into an int.
    The planes are literal arrays, so the signature is pure native
    arithmetic (codegen) — no UDF, no shuffle."""
    H = _hyperplanes(planes, dim, seed)
    sig = F.lit(0).cast("long")
    for j in range(planes):
        plane = F.array(*[F.lit(float(v)) for v in H[j]])
        bit = (dot_expr(F.col(vec_col), plane) > 0).cast("long")
        sig = sig + bit * F.lit(2**j).cast("long")
    return df.withColumn("sig", sig)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    dim: int = 64,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: bucket corpus + queries by hyperplane signature,
    equi-join on the bucket, exact cosine re-rank inside.

    ``multi_probe=True`` additionally probes every signature at hamming
    distance 1 from the query's (flip each plane bit once) — the standard
    multi-probe LSH recall boost: x(planes+1) candidate buckets per query
    for the SAME corpus layout (no extra corpus passes or index size).
    Tested to strictly dominate single-probe recall vs the exact top-k."""
    c = hyperplane_signature(corpus, vec_col, planes, seed, dim)
    q = hyperplane_signature(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        "_qv", planes, seed, dim,
    )
    if multi_probe:
        probes = F.array(
            F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << j)) for j in range(planes)]
        )
        q = q.withColumn("sig", F.explode(probes))
    scored = c.join(F.broadcast(q), "sig").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
    )
    if multi_probe:
        # a corpus vector can match several probe buckets of one query
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path beside LSH
# ---------------------------------------------------------------------------

def _centroid_arrays(corpus, id_col, vec_col, n_centroids):
    """Deterministic coarse quantizer: the embeddings of the n_centroids
    smallest ids serve as fixed centroids (no iterative training — float
    reduction order in a trained k-means is nondeterministic across
    partitions, which would break bit-exact oracles; fixed 'sampled'
    centroids keep the IVF *plan shape* while staying reproducible)."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    return [list(r[vec_col]) for r in rows]


def train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_per_centroid: int = 32,
    iters: int = 10,
    seed: int = 42,
) -> list:
    """Deterministic spherical k-means coarse quantizer (the FAISS IVF
    training shape: train on a bounded sample, not the corpus).

    Scale story: the TRAINING sample is ``n_centroids * sample_per_centroid``
    rows pulled to the driver — independent of corpus size (FAISS defaults
    to 39-256 points/centroid); iteration then runs as driver-side numpy,
    so no per-iteration Spark jobs.  Determinism: the sample is the
    smallest ids by ``TABLESAMPLE``-free deterministic rank (hash-ordered,
    not orderBy-on-floats), init is seeded, and all reductions happen in a
    single numpy process with fixed operand order — same inputs, same
    centroids, every run (the oracle requirement that rules out
    distributed k-means with its partition-order float reductions).

    Empty-cell rule: a centroid that captures no points keeps its previous
    position (standard k-means practice; deterministic)."""
    n_sample = n_centroids * sample_per_centroid
    rows = (
        corpus.select(id_col, vec_col)
        # deterministic pseudo-random sample: order by a seeded hash of the
        # id (uniform over the corpus, reproducible, no float ordering)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    X = _unit_rows(np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64))
    rng = np.random.Generator(np.random.PCG64(seed))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        Cn = _unit_rows(C)
        assign = np.argmax(X @ Cn.T, axis=1)
        newC = C.copy()
        for j in range(len(C)):
            pts = X[assign == j]
            if len(pts):
                newC[j] = pts.mean(axis=0)
        if np.allclose(newC, C):
            break
        C = newC
    return [list(map(float, c)) for c in _unit_rows(C)]


def _cos_to_centroids(vec_col: str, centroids: list):
    return F.array(*[
        cosine_expr(
            F.col(vec_col),
            F.array(*[F.lit(float(x)) for x in c]),
        )
        for c in centroids
    ])


# above this many centroids the literal-expression plan stops being a win:
# n_centroids x dim literals bloat the plan (analysis/codegen cost grows
# linearly) and assignment is O(n_centroids) scalar expressions per row.
# The numpy path is one Arrow-batched matmul per batch instead.
IVF_LITERAL_MAX_CENTROIDS = 64


def _unit_rows(mat):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def ivf_assign(df: DataFrame, centroids: list, vec_col: str = "embedding") -> DataFrame:
    """Adds ``cell int`` — nearest centroid by cosine (first index wins
    ties).

    Two physical strategies behind one logical op:

    * ``n <= IVF_LITERAL_MAX_CENTROIDS``: pure native expressions — the
      centroid list rides the plan as literals, one codegen'd projection,
      no Python.
    * larger: an Arrow-batched pandas UDF doing ONE numpy matmul per batch
      against the row-normalized centroid matrix (argmax of v·ĉ ==
      argmax of cosine, since |v| > 0 is constant per row; np.argmax takes
      the first max — the same tie rule as the literal path).  The matrix
      rides the closure (a few MB even at 4096x1024), so realistic
      centroid counts neither explode the plan nor shuffle anything."""
    if len(centroids) <= IVF_LITERAL_MAX_CENTROIDS:
        coss = _cos_to_centroids(vec_col, centroids)
        return df.withColumn(
            "cell", (F.array_position(coss, F.array_max(coss)) - 1).cast("int")
        )

    from pyspark.sql.functions import pandas_udf

    Cn = _unit_rows(np.asarray(centroids, dtype=np.float64))

    @pandas_udf("int")
    def assign(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int32")
        V = np.asarray(s.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(V @ Cn.T, axis=1).astype(np.int32))

    return df.withColumn("cell", assign(F.col(vec_col)))


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list | None = None,
    train: bool = False,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` cells
    (one native projection), probe each query's ``nprobe`` nearest cells,
    exact cosine re-rank inside the probed cells.

    ``train=True`` fits the quantizer with deterministic driver-side
    spherical k-means on a bounded sample (:func:`train_centroids`) —
    better cell balance than the fixed first-N-ids quantizer, still
    bit-reproducible.

    Scale shape: the corpus scan + cell assignment is embarrassingly
    parallel; candidate generation is an equi-join on ``cell`` (the probe
    side is queries x nprobe — broadcast); re-ranking touches only
    ~nprobe/n_centroids of the corpus per query instead of all of it."""
    if centroids is None:
        if train:
            centroids = train_centroids(corpus, n_centroids, id_col, vec_col)
        else:
            centroids = _centroid_arrays(corpus, id_col, vec_col, n_centroids)
    c = ivf_assign(corpus, centroids, vec_col)

    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    if len(centroids) <= IVF_LITERAL_MAX_CENTROIDS:
        coss = _cos_to_centroids("_qv", centroids)
        idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        # nprobe nearest cells: struct(-cos, cell) sorts naturally (lexicographic)
        q = q.withColumn("_coss", coss)
        ranked_cells = F.slice(
            F.array_sort(F.transform(
                idx,
                lambda i: F.struct(
                    (-F.element_at(F.col("_coss"), i + 1)).alias("negcos"),
                    i.alias("cell"),
                ),
            )),
            1, nprobe,
        )
        q = q.withColumn(
            "cell",
            F.explode(F.transform(ranked_cells, lambda s: s.getField("cell").cast("int"))),
        ).drop("_coss")
    else:
        # numpy probe ranking: stable argsort of -v·ĉ == (-cos, cell)
        # lexicographic order (same tie rule as the literal path)
        from pyspark.sql.functions import pandas_udf

        Cn = _unit_rows(np.asarray(centroids, dtype=np.float64))
        np_ = nprobe

        @pandas_udf("array<int>")
        def probe_cells(s: pd.Series) -> pd.Series:
            if len(s) == 0:
                return pd.Series([], dtype="object")
            V = np.asarray(s.tolist(), dtype=np.float64)
            order = np.argsort(-(V @ Cn.T), axis=1, kind="stable")[:, :np_]
            return pd.Series(list(order.astype(np.int32)))

        q = q.withColumn("cell", F.explode(probe_cells(F.col("_qv"))))

    scored = c.join(F.broadcast(q), "cell").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_expr(F.col(vec_col), F.col("_qv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN — the compressed-domain scale path
# (Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011: split each vector into m subvectors, vector-quantize each
# subspace with a kc-entry codebook, score queries against the CODES via
# per-subspace lookup tables — asymmetric distance computation).
#
# Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its
# PQ code (m=8, kc=16) is 8 SMALL INTS — the whole corpus index fits in a
# fraction of the memory/IO, and a scan of the codes does m table lookups
# + adds per row instead of d multiplies.  IVF composes on top (this
# module's ivf_ann_topk provides the coarse stage) exactly as in FAISS's
# IVFPQ.
#
# Determinism discipline (the golden-oracle requirement): encoding
# accumulates distances dim-by-dim in explicit order (numpy elementwise
# ops == the same IEEE sequence as a scalar loop), the ADC lookup tables
# are built on the DRIVER in pure-python float arithmetic, and executor
# scoring gathers + adds them in fixed subspace order — so an independent
# pure-python reimplementation reproduces every bit (argmin ties -> first
# index on both paths).
# ---------------------------------------------------------------------------

def pq_codebooks_fixed(corpus: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", m: int = 8,
                       kc: int = 16) -> list:
    """Deterministic untrained codebooks: the subvectors of the ``kc``
    smallest-id embeddings (the same fixed-quantizer convention as the IVF
    literal path — reproducible with zero float-order concerns)."""
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(kc).collect()
    vecs = [list(map(float, r[vec_col])) for r in rows]
    d = len(vecs[0])
    if d % m:  # silent truncation of d % m trailing dims skews approx_cos
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    sub = d // m
    return [[v[mi * sub:(mi + 1) * sub] for v in vecs] for mi in range(m)]


def train_pq_codebooks(corpus: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", m: int = 8, kc: int = 16,
                       sample_per_code: int = 32, iters: int = 10,
                       seed: int = 42) -> list:
    """Per-subspace L2 k-means codebooks on a bounded deterministic sample
    (same sampling/driver-numpy discipline as :func:`train_centroids`;
    plain L2 k-means because PQ quantizes subvectors, not directions)."""
    n_sample = kc * sample_per_code
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:  # misconfigured m must fail loudly, never skew approx_cos
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = []
    rng = np.random.Generator(np.random.PCG64(seed))
    for mi in range(m):
        S = X[:, mi * sub:(mi + 1) * sub]
        C = S[rng.choice(len(S), size=min(kc, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            newC = C.copy()
            for j in range(len(C)):
                pts = S[assign == j]
                if len(pts):
                    newC[j] = pts.mean(axis=0)
            if np.allclose(newC, C):
                break
            C = newC
        books.append([list(map(float, c)) for c in C])
    return books


def _pq_encode_rows(X: "np.ndarray", codebooks: list) -> "np.ndarray":
    """codes[n, m] — argmin L2 per subspace, distances accumulated
    dim-by-dim in explicit order (bit-reproducible by a scalar loop)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if X.shape[1] != m * sub:  # trailing-dim truncation must fail loudly
        raise ValueError(
            f"embedding dim {X.shape[1]} != m*sub = {m}*{sub} of the codebooks"
        )
    n = X.shape[0]
    codes = np.zeros((n, m), dtype=np.int32)
    for mi in range(m):
        kc = len(codebooks[mi])
        dists = np.empty((n, kc), dtype=np.float64)
        for ki in range(kc):
            acc = np.zeros(n, dtype=np.float64)
            for j in range(sub):
                diff = X[:, mi * sub + j] - codebooks[mi][ki][j]
                acc = acc + diff * diff
            dists[:, ki] = acc
        codes[:, mi] = np.argmin(dists, axis=1)  # first-min, like scalar <
    return codes


def pq_encode(corpus: DataFrame, codebooks: list, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>) — one Arrow-batched numpy pass, codebooks in
    the closure (no shuffle, no join)."""
    import pandas as pd

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            codes = _pq_encode_rows(X, codebooks)
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "codes": [list(map(int, c)) for c in codes],
            })

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, schema="id long, codes array<int>"
    ).withColumnRenamed("id", id_col)


def pq_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                m: int = 8, kc: int = 16, codebooks: list | None = None,
                train: bool = False, id_col: str = "vec_id",
                vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k per query by ADC over PQ codes.

    ``approx_cos`` estimates cosine as ``ip(q, x̂) / (|q|·|x̂|)`` where x̂
    is the code's reconstruction; ``|x̂|²`` is the sum of per-subspace
    centroid norms (subspaces are an orthogonal decomposition).  Lookup
    tables are built per query on the driver (queries are the bounded
    broadcast set, as in the other top-k operators) in pure-python float
    order; executors do m gathers + adds per row — no per-row vector math,
    no shuffle before the final tiny per-query top-k."""
    if codebooks is None:
        codebooks = (train_pq_codebooks(corpus, id_col, vec_col, m, kc)
                     if train else
                     pq_codebooks_fixed(corpus, id_col, vec_col, m, kc))
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    return pq_adc_topk(codes, codebooks, queries, k, id_col, vec_col,
                       query_id_col)


def _adc_normsq(codebooks: list) -> list:
    """Per-code squared reconstruction norms, pure-python sequential order
    (shared by the driver and distributed ADC paths)."""
    sub = len(codebooks[0][0])
    return [
        [sum(c[j] * c[j] for j in range(sub)) for c in book]
        for book in codebooks
    ]


def _np_query_luts(Qm: "np.ndarray", codebooks: list):
    """``(qnorm (q,), ip [m x (q, kc)])`` — the per-query ADC lookup
    tables, vectorized ACROSS queries but with the exact accumulation
    order of the pure-python driver path (left-to-right adds per dim, one
    ``** 0.5``), so both paths are bit-identical.  Runs executor-side in
    the distributed path."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if Qm.shape[1] != m * sub:  # trailing-dim truncation must fail loudly
        raise ValueError(
            f"query dim {Qm.shape[1]} != m*sub = {m}*{sub} of the codebooks"
        )
    q = Qm.shape[0]
    qsq = np.zeros(q, dtype=np.float64)
    for j in range(m * sub):
        qsq = qsq + Qm[:, j] * Qm[:, j]
    qnorm = qsq ** 0.5
    ip = []
    for mi in range(m):
        kc = len(codebooks[mi])
        # vectorized over BOTH q and kc (sub elementwise passes, not
        # kc*sub) — each (qi, ki) cell still accumulates its sub terms
        # left-to-right on a float64, so bit-equality with the scalar
        # driver path is preserved while the build drops from O(kc*sub)
        # numpy dispatches to O(sub) (measured 5.0 -> 0.05 s at Q=10^4,
        # kc=256 — this runs once per task in the distributed path)
        B = np.asarray(codebooks[mi], dtype=np.float64)  # (kc, sub)
        t = np.zeros((q, kc), dtype=np.float64)
        tmp = np.empty((q, kc), dtype=np.float64)
        # Blocked over queries so the accumulator slice (block x kc
        # doubles, ~1 MB at the default block) stays cache-resident
        # across the sub j-passes: the unblocked form streamed the full
        # (q, kc) buffer through DRAM 3*sub times per subspace (~5 GB at
        # Q=10^4), and with every reused Python worker building its LUT
        # concurrently the memory bus — not the FLOPs — was the
        # distributed-ADC stage's bottleneck (measured 472 core-s for a
        # ~2 core-s-of-arithmetic build+score).  The per-cell
        # accumulation order is unchanged (left-to-right over j), so
        # bit-equality with the scalar driver path is preserved.
        blk = max(1, (1 << 17) // max(kc, 1))
        for lo in range(0, q, blk):
            hi = min(lo + blk, q)
            tb, pb = t[lo:hi], tmp[: hi - lo]
            for j in range(sub):
                np.multiply(Qm[lo:hi, mi * sub + j][:, None], B[None, :, j],
                            out=pb)
                tb += pb
        ip.append(t)
    return qnorm, ip


_LUT_CACHE: dict = {}
_LUT_CACHE_MAX = 2

_LUT_PUB_DIR: list = []          # lazy singleton [tempdir], process-lifetime
_LUT_PUB: dict = {}              # key -> (qn_path, ip_path), insertion-ordered
_LUT_PUB_MAX = 2                 # bounded disk: evicted entries are unlinked


def _publish_query_luts(sc, Qm: "np.ndarray", codebooks: list):
    """Local-mode LUT sharing: build the ADC lookup tables ONCE on the
    driver and publish them as ``.npy`` files every executor worker on
    this machine mmaps — page-cache-shared, zero per-worker build.  The
    per-worker build was the distributed-ADC stage's bottleneck AFTER the
    blocked-build fix: 32 reused workers each re-deriving the same
    O(m·Q·kc) tables concurrently saturated the memory bus (measured:
    the full bench ADC query drops 4.5 -> 1.2 s once workers hold the
    LUT).  Returns ``(key, paths_or_None)``; ``None`` (non-local master,
    where executors cannot see the driver's filesystem) keeps today's
    per-worker memoized build — unchanged cluster behavior.  Published
    files hold the byte-exact :func:`_np_query_luts` output, so the mmap
    path is bit-identical to the worker-built path.  Disk is bounded at
    ``_LUT_PUB_MAX`` published queries (older files are unlinked; a
    late re-execution that misses its files falls back to building)."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    key = uuid.uuid4().hex
    if not sc.master.startswith("local"):
        return key, None
    if not _LUT_PUB_DIR:
        d = tempfile.mkdtemp(prefix="httpz_adc_lut_")
        _LUT_PUB_DIR.append(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    qn, ip = _np_query_luts(Qm, codebooks)
    qn_path = os.path.join(_LUT_PUB_DIR[0], f"{key}_qn.npy")
    ip_path = os.path.join(_LUT_PUB_DIR[0], f"{key}_ip.npy")
    np.save(qn_path, qn)
    np.save(ip_path, np.stack(ip))  # (m, Q, kc)
    _LUT_PUB[key] = (qn_path, ip_path)
    while len(_LUT_PUB) > _LUT_PUB_MAX:
        old = _LUT_PUB.pop(next(iter(_LUT_PUB)))
        for p in old:
            try:
                os.unlink(p)
            except OSError:
                pass
    return key, (qn_path, ip_path)


def _cached_query_luts(key: str, Qm: "np.ndarray", codebooks: list,
                       paths: tuple | None = None):
    """Per-worker-process memo of the ADC lookup tables keyed by the
    query's plan-build uuid: Spark reuses Python workers across tasks
    (spark.python.worker.reuse), so a P-partition scan pays the O(Q·kc·m)
    LUT build once per WORKER instead of once per TASK.  When the driver
    published the tables (``paths`` — see :func:`_publish_query_luts`)
    they are READ instead of rebuilt: a sequential load from the page
    cache (the driver just wrote them) costs ~3x less memory-bus traffic
    than the 3·sub-pass build, and the expensive derivation runs once
    per machine instead of once per worker.  (A read-only mmap was
    measured SLOWER here: the score loop's column gathers fault the
    whole table in 4 KB pages — ~1.3 s of scattered minor faults across
    32 workers vs ~0.3 s of bulk copy.)  Any read failure (missing file
    after eviction, cluster executor on another machine) falls back to
    building locally.  Bounded at ``_LUT_CACHE_MAX`` entries (the tables
    are O(m·Q·kc) floats)."""
    hit = _LUT_CACHE.get(key)
    if hit is None:
        if paths is not None:
            try:
                qn = np.load(paths[0])
                ips = np.load(paths[1])
                hit = (qn, [ips[mi] for mi in range(ips.shape[0])])
            except Exception:
                hit = None
        if hit is None:
            hit = _np_query_luts(Qm, codebooks)
        _LUT_CACHE[key] = hit
        while len(_LUT_CACHE) > _LUT_CACHE_MAX:
            _LUT_CACHE.pop(next(iter(_LUT_CACHE)))
    return hit


def _select_topk(qrows: "np.ndarray", ids: "np.ndarray",
                 scores: "np.ndarray", k: int):
    """Exact per-query top-k by (score desc, id asc) over ragged
    candidate triples — fully vectorized (lexsort + first-occurrence
    rank), no per-query python loop."""
    order = np.lexsort((ids, -scores, qrows))
    qr, iD, sc_ = qrows[order], ids[order], scores[order]
    first = np.searchsorted(qr, qr, side="left")
    keep = (np.arange(len(qr)) - first) < k
    return qr[keep], iD[keep], sc_[keep]


def _matrix_topk(S: "np.ndarray", ids: "np.ndarray", k: int):
    """Exact per-row top-k over a dense (Q x n) score matrix: prune each
    row to its candidates with ``np.partition`` (everything >= the k-th
    largest — a superset of the true top-k, ties included), then resolve
    (score desc, id asc) exactly with :func:`_select_topk` over the
    ~Q*k survivors.  Replaces lexsorting all Q*n triples, which at
    Q=10^4 was one 4M-element 3-key sort PER CHUNK and dominated the
    distributed-ADC task profile.  NaN scores (zero-norm rows) are
    excluded from candidacy, matching the old sort order that placed
    them last."""
    q, n = S.shape
    if n <= k:
        qrows = np.repeat(np.arange(q, dtype=np.int64), n)
        return _select_topk(qrows, np.tile(ids, q), S.ravel(), k)
    Sm = np.where(np.isnan(S), -np.inf, S)
    kth = np.partition(Sm, n - k, axis=1)[:, n - k]
    mask = Sm >= kth[:, None]
    qrows, cols = np.nonzero(mask)
    return _select_topk(qrows.astype(np.int64, copy=False), ids[cols],
                        S[mask], k)


def _collect_queries(queries: DataFrame, query_id_col: str, vec_col: str):
    """One Arrow transfer of the query frame -> (ids int64, Qm float64).
    Both ADC paths start here: the driver path builds python LUTs from
    it; the distributed path broadcasts the raw matrix (8*Q*d bytes — a
    10^6 x 64-d query set is ~0.5 GB, the practical ceiling) and builds
    LUTs executor-side."""
    qpdf = queries.select(query_id_col, vec_col).orderBy(query_id_col).toPandas()
    qids = qpdf[query_id_col].to_numpy(dtype=np.int64)
    Qm = (np.asarray([list(map(float, v)) for v in qpdf[vec_col]],
                     dtype=np.float64)
          if len(qpdf) else np.zeros((0, 0), dtype=np.float64))
    return qids, Qm


def pq_adc_topk(codes: DataFrame, codebooks: list, queries: DataFrame,
                k: int = 3, id_col: str = "vec_id",
                vec_col: str = "embedding",
                query_id_col: str = "query_id",
                q_max: int = 1024,
                distributed: bool | None = None) -> DataFrame:
    """ADC scoring over an EXISTING codes frame — the query-time half of
    :func:`pq_ann_topk`, usable directly against a persisted index
    (:mod:`httpz_spark.operators.simindex`): the corpus embeddings are
    never touched, only the m-small-ints codes.

    Two bit-identical execution paths, switched on ``q_max``:

    * **driver path** (Q <= q_max, the FAISS few-queries/huge-corpus
      shape): LUTs built on the driver in pure-python float order and
      shipped in the task closure; executors do m gathers + adds per
      (row, query).
    * **distributed path** (Q > q_max, corpus-vs-corpus retrieval): the
      raw query matrix is broadcast (torrent, not closure), LUTs are
      built ONCE PER TASK inside the Arrow stage with numpy
      (:func:`_np_query_luts` — same accumulation order, bit-equal), the
      (q x batch) score matrix is computed chunk-wise with zero per-query
      python loops, and each task pre-reduces to its LOCAL top-k per
      query (exact, (score desc, id asc)) so the shuffle into the final
      window is P*Q*k rows instead of Q*N.

    ``distributed=None`` picks by comparing Q to ``q_max``; pass
    True/False to force a path."""
    qids, Qm = _collect_queries(queries, query_id_col, vec_col)
    if distributed is None:
        distributed = len(qids) > q_max
    if distributed and len(qids):
        return _pq_adc_topk_dist(codes, codebooks, qids, Qm, k, id_col)
    return _pq_adc_topk_driver(codes, codebooks, qids, Qm, k, id_col)


def _pq_adc_topk_driver(codes: DataFrame, codebooks: list,
                        qids: "np.ndarray", Qm: "np.ndarray", k: int,
                        id_col: str) -> DataFrame:
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    normsq = _adc_normsq(codebooks)
    luts = []  # (query_id, qnorm, ip[mi][ki])
    for qi in range(len(qids)):
        qv = [float(x) for x in Qm[qi]]
        if len(qv) != m * sub:  # trailing-dim truncation must fail loudly
            raise ValueError(
                f"query dim {len(qv)} != m*sub = {m}*{sub} of the codebooks"
            )
        qnorm = 0.0
        for x in qv:
            qnorm += x * x
        qnorm = qnorm ** 0.5
        ip = [
            [sum(qv[mi * sub + j] * c[j] for j in range(sub))
             for c in codebooks[mi]]
            for mi in range(m)
        ]
        luts.append((int(qids[qi]), qnorm, ip))

    def score(batches):
        np_normsq = [np.asarray(t, dtype=np.float64) for t in normsq]
        np_luts = [(qid, qn, [np.asarray(t, dtype=np.float64) for t in ip])
                   for qid, qn, ip in luts]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray([list(c) for c in pdf["codes"]], dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            nsum = np_normsq[0][C[:, 0]]
            for mi in range(1, m):
                nsum = nsum + np_normsq[mi][C[:, mi]]
            rnorm = np.sqrt(nsum)
            out_q, out_id, out_s = [], [], []
            for qid, qn, ip in np_luts:
                s = ip[0][C[:, 0]]
                for mi in range(1, m):
                    s = s + ip[mi][C[:, mi]]
                s = s / (qn * rnorm)
                out_q.append(np.full(len(ids), qid, dtype=np.int64))
                out_id.append(ids)
                out_s.append(s)
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_id),
                "approx_cos": np.concatenate(out_s),
            })

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


_ADC_QDIST_MAX_CODES = 1 << 16


def _pq_adc_topk_qdist(codes: DataFrame, codebooks: list,
                       qids: "np.ndarray", Qm: "np.ndarray", k: int,
                       id_col: str) -> DataFrame:
    """Query-distributed ADC for the many-queries / small-corpus shape
    (Q > q_max but the codes frame fits comfortably on every executor —
    corpus-vs-corpus retrieval against a compact index).  The
    codes-distributed path replicates the full O(m·Q·kc) LUT into every
    worker (~165 MB at Q=10^4, kc=256 — measured as the stage's entire
    bottleneck when N is small: scoring is Q·N·m gathers, a fraction of
    the LUT bytes).  Here the DISTRIBUTION AXIS flips: tasks own disjoint
    query slices, each builds only its slice of the LUT
    (:func:`_np_query_luts` rows are per-query independent, so slices
    are bit-identical to the full build), and the tiny (id, codes)
    matrix rides the broadcast instead.  Total LUT work across the stage
    is exactly ONE build, perfectly parallel, zero replication — and
    each query is fully scored in one task, so the pre-reduced exact
    top-k needs no cross-task merge beyond the same final window."""
    import pandas as pd

    m = len(codebooks)
    normsq = _adc_normsq(codebooks)
    spark = codes.sparkSession
    sc = spark.sparkContext
    cpdf = codes.select(id_col, "codes").toPandas()  # bounded by dispatch
    ids_all = cpdf[id_col].to_numpy(dtype=np.int64)
    C_all = (np.asarray([list(c) for c in cpdf["codes"]], dtype=np.int64)
             if len(cpdf) else np.zeros((0, m), dtype=np.int64))
    bcorpus = sc.broadcast((ids_all, C_all))
    bq = sc.broadcast((qids, Qm))
    Q = len(qids)
    # ~256 queries per slice floor keeps per-task numpy batches vectorized;
    # cap at defaultParallelism so one wave of tasks covers the stage
    n_slices = max(1, min(sc.defaultParallelism, (Q + 255) // 256))

    def score(batches):
        b_qids, b_Qm = bq.value
        b_ids, b_C = bcorpus.value
        np_normsq = [np.asarray(t, dtype=np.float64) for t in normsq]
        n = len(b_ids)
        for pdf in batches:
            for s in pdf["id"]:
                lo, hi = s * Q // n_slices, (s + 1) * Q // n_slices
                if lo >= hi or n == 0:
                    continue
                qn, ip = _np_query_luts(b_Qm[lo:hi], codebooks)
                nsum = np_normsq[0][b_C[:, 0]]
                for mi in range(1, m):
                    nsum = nsum + np_normsq[mi][b_C[:, mi]]
                rnorm = np.sqrt(nsum)
                chunk = max(1, (1 << 22) // max(hi - lo, 1))
                acc = []
                for clo in range(0, n, chunk):
                    chi = min(clo + chunk, n)
                    S = ip[0][:, b_C[clo:chi, 0]]
                    for mi in range(1, m):
                        S = S + ip[mi][:, b_C[clo:chi, mi]]
                    S = S / (qn[:, None] * rnorm[None, clo:chi])
                    acc.append(_matrix_topk(S, b_ids[clo:chi], k))
                qr = np.concatenate([a[0] for a in acc])
                iD = np.concatenate([a[1] for a in acc])
                sc_ = np.concatenate([a[2] for a in acc])
                qr, iD, sc_ = _select_topk(qr, iD, sc_, k)
                yield pd.DataFrame({
                    "query_id": b_qids[lo + qr],
                    "neighbor_id": iD,
                    "approx_cos": sc_,
                })

    scored = spark.range(0, n_slices, 1, n_slices).mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _pq_adc_topk_dist(codes: DataFrame, codebooks: list,
                      qids: "np.ndarray", Qm: "np.ndarray", k: int,
                      id_col: str) -> DataFrame:
    """Distributed ADC: the raw query matrix rides a torrent broadcast,
    each task builds the LUTs ONCE with :func:`_np_query_luts` (bit-equal
    to the driver path), scores chunk-wise with a (Q x chunk) gather+add
    matrix, and pre-reduces to its local exact top-k per query so the
    shuffle into the final window is O(tasks * Q * k), never Q * N.

    Dispatch: a corpus small enough to broadcast
    (``_ADC_QDIST_MAX_CODES``, probed with an early-abort limit-count)
    flips the distribution axis to :func:`_pq_adc_topk_qdist` — when N
    is small the per-worker LUT replication, not scoring, is the entire
    stage cost."""
    import pandas as pd

    if (codes.limit(_ADC_QDIST_MAX_CODES + 1).count()
            <= _ADC_QDIST_MAX_CODES):
        return _pq_adc_topk_qdist(codes, codebooks, qids, Qm, k, id_col)
    m = len(codebooks)
    normsq = _adc_normsq(codebooks)
    sc = codes.sparkSession.sparkContext
    # Scale-adaptive parallelism: a small/compacted codes frame (one
    # parquet file, a fresh encode of a small corpus) arrives with fewer
    # partitions than the session has cores, and the WHOLE Q x N scoring
    # then runs in that many tasks (observed: 1 partition at the bench
    # shape -> single-task scoring, 14+ s).  The scoring work is pure
    # compute, so spread it; at production scale codes already carries
    # >= defaultParallelism partitions and this is a no-op.
    nparts = codes.rdd.getNumPartitions()
    if nparts < sc.defaultParallelism:
        codes = codes.repartition(sc.defaultParallelism)
    bq = sc.broadcast((qids, Qm))
    lut_key, lut_paths = _publish_query_luts(sc, Qm, codebooks)

    def score(batches):
        b_qids, b_Qm = bq.value
        qn, ip = _cached_query_luts(lut_key, b_Qm, codebooks, lut_paths)
        np_normsq = [np.asarray(t, dtype=np.float64) for t in normsq]
        Q = len(b_qids)
        # chunk the corpus so the (Q x chunk) score matrix stays ~32 MB
        chunk = max(1, (1 << 22) // max(Q, 1))
        acc = []  # [(qrow, id, score)] arrays, task-local top-k accumulator
        acc_len = 0

        def reduced():
            qr = np.concatenate([a[0] for a in acc])
            iD = np.concatenate([a[1] for a in acc])
            sc_ = np.concatenate([a[2] for a in acc])
            return _select_topk(qr, iD, sc_, k)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray([list(c) for c in pdf["codes"]], dtype=np.int64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            nsum = np_normsq[0][C[:, 0]]
            for mi in range(1, m):
                nsum = nsum + np_normsq[mi][C[:, mi]]
            rnorm = np.sqrt(nsum)
            for lo in range(0, len(ids), chunk):
                hi = min(lo + chunk, len(ids))
                S = ip[0][:, C[lo:hi, 0]]
                for mi in range(1, m):
                    S = S + ip[mi][:, C[lo:hi, mi]]
                S = S / (qn[:, None] * rnorm[None, lo:hi])
                acc.append(_matrix_topk(S, ids[lo:hi], k))
                acc_len += len(acc[-1][0])
                if acc_len > 4 * Q * k:
                    acc = [reduced()]
                    acc_len = len(acc[0][0])
        if acc_len:
            qr, iD, sc_ = reduced()
            yield pd.DataFrame({
                "query_id": b_qids[qr],
                "neighbor_id": iD,
                "approx_cos": sc_,
            })

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _seq_cos(a, b) -> float:
    import math

    return _seq_dot(a, b) / (math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b)))


def _np_assign_cells(X: "np.ndarray", centroids: list) -> "np.ndarray":
    """Driver-side nearest-centroid-by-cosine assignment (first max wins)
    — the numpy analogue of :func:`ivf_assign`'s batch path, used where a
    bounded sample needs cells without a Spark job (residual codebook
    derivation)."""
    Cn = _unit_rows(np.asarray(centroids, dtype=np.float64))
    return np.argmax(X @ Cn.T, axis=1)


def residual_codebooks_fixed(corpus: DataFrame, centroids: list,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding", m: int = 8,
                             kc: int = 16) -> list:
    """Untrained residual codebooks: the (v - centroid) residuals of the
    ``kc`` smallest-id embeddings, split per subspace (the residual
    analogue of :func:`pq_codebooks_fixed`; deterministic)."""
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(kc).collect()
    X = np.asarray([list(map(float, r[vec_col])) for r in rows],
                   dtype=np.float64)
    d = X.shape[1]
    if d % m:  # silent truncation of d % m trailing dims skews approx_cos
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    C = np.asarray(centroids, dtype=np.float64)
    R = X - C[_np_assign_cells(X, centroids)]
    sub = d // m
    return [[[float(x) for x in R[vi, mi * sub:(mi + 1) * sub]]
             for vi in range(len(R))] for mi in range(m)]


def train_residual_pq_codebooks(corpus: DataFrame, centroids: list,
                                id_col: str = "vec_id",
                                vec_col: str = "embedding", m: int = 8,
                                kc: int = 16, sample_per_code: int = 32,
                                iters: int = 10, seed: int = 42) -> list:
    """Per-subspace k-means over RESIDUALS (v - nearest centroid) — the
    FAISS IVFPQ training rule: the codebooks model what's left after the
    coarse quantizer, so the same (m, kc) budget spends its resolution on
    a much tighter distribution.  Same bounded-deterministic-sample +
    driver-numpy discipline as :func:`train_pq_codebooks`."""
    n_sample = kc * sample_per_code
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    X = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:  # misconfigured m must fail loudly, never skew approx_cos
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    C = np.asarray(centroids, dtype=np.float64)
    R = X - C[_np_assign_cells(X, centroids)]
    sub = d // m
    books = []
    rng = np.random.Generator(np.random.PCG64(seed))
    for mi in range(m):
        S = R[:, mi * sub:(mi + 1) * sub]
        B = S[rng.choice(len(S), size=min(kc, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - B[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            newB = B.copy()
            for j in range(len(B)):
                pts = S[assign == j]
                if len(pts):
                    newB[j] = pts.mean(axis=0)
            if np.allclose(newB, B):
                break
            B = newB
        books.append([list(map(float, c)) for c in B])
    return books


def ivfpq_encode(corpus: DataFrame, centroids: list, codebooks: list,
                 residual: bool = False, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """``(id, cell, codes)`` index rows in one pass: cell assignment
    (native or numpy batch), then PQ codes of either the raw vector or —
    ``residual=True``, the FAISS IVFPQ rule — of ``v - centroid[cell]``
    (both subtractions and the encode accumulate per dim in scalar order,
    so an independent scalar model reproduces every code)."""
    import pandas as pd

    cells = ivf_assign(corpus.select(id_col, vec_col), centroids, vec_col)
    if not residual:
        codes = pq_encode(corpus, codebooks, id_col, vec_col)
        return cells.select(id_col, "cell").join(codes, id_col)

    C = np.asarray(centroids, dtype=np.float64)

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cell = pdf["cell"].to_numpy(dtype=np.int64)
            codes = _pq_encode_rows(X - C[cell], codebooks)
            yield pd.DataFrame({
                "id": pdf[id_col].to_numpy(),
                "cell": cell.astype(np.int32),
                "codes": [list(map(int, c)) for c in codes],
            })

    return cells.select(id_col, vec_col, "cell").mapInPandas(
        enc, schema="id long, cell int, codes array<int>"
    ).withColumnRenamed("id", id_col)


def ivfpq_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                   n_centroids: int = 16, nprobe: int = 4, m: int = 8,
                   kc: int = 16, centroids: list | None = None,
                   codebooks: list | None = None, train: bool = False,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id",
                   residual: bool = False,
                   q_max: int = 1024,
                   distributed: bool | None = None) -> DataFrame:
    """FAISS-IVFPQ composition: the coarse quantizer prunes the corpus to
    each query's ``nprobe`` nearest cells, and ADC over PQ codes scores
    ONLY those candidates — the two approximations multiply, and so do the
    savings: ~nprobe/n_centroids of the corpus is touched, at m lookups +
    adds per touched row over 8-int codes.

    Plan shape: corpus -> cell assignment (native or numpy batch, no
    shuffle) + PQ encode (numpy batch, no shuffle) -> equi-join with the
    broadcast (query_id, cell) probe pairs -> per-row LUT scoring keyed by
    query_id -> tiny per-query top-k window.  The probe ranking runs on
    the driver in sequential pure-python float order (queries are the
    bounded broadcast set), keeping the whole operator bit-reproducible by
    an independent scalar reimplementation."""
    if centroids is None:
        centroids = (train_centroids(corpus, n_centroids, id_col, vec_col)
                     if train else
                     _centroid_arrays(corpus, id_col, vec_col, n_centroids))
    if codebooks is None:
        if residual:
            codebooks = (
                train_residual_pq_codebooks(corpus, centroids, id_col,
                                            vec_col, m, kc)
                if train else
                residual_codebooks_fixed(corpus, centroids, id_col, vec_col,
                                         m, kc))
        else:
            codebooks = (train_pq_codebooks(corpus, id_col, vec_col, m, kc)
                         if train else
                         pq_codebooks_fixed(corpus, id_col, vec_col, m, kc))
    indexed = ivfpq_encode(corpus, centroids, codebooks, residual,
                           id_col, vec_col)
    return ivfpq_adc_topk(indexed, centroids, codebooks, queries, k, nprobe,
                          id_col, vec_col, query_id_col, residual=residual,
                          q_max=q_max, distributed=distributed)


def _np_query_cent_dots(Qm: "np.ndarray", centroids: list) -> "np.ndarray":
    """``(Q, n_centroids)`` inner products, vectorized ACROSS queries but
    accumulating per dim left-to-right — bit-identical to the driver
    path's ``_seq_dot(qv, c)`` per query.  Shared by probe ranking and
    the residual ``<q, centroid>`` score term."""
    Q, d = Qm.shape
    dots = np.empty((Q, len(centroids)), dtype=np.float64)
    for ci, c in enumerate(centroids):
        acc = np.zeros(Q, dtype=np.float64)
        for j in range(d):
            acc = acc + Qm[:, j] * float(c[j])
        dots[:, ci] = acc
    return dots


def _np_probe_cells(Qm: "np.ndarray", centroids: list, nprobe: int) -> "np.ndarray":
    """(Q, nprobe) nearest-centroid indices by cosine, ties -> lower index.
    Vectorized ACROSS queries with the per-dim left-to-right accumulation
    order of the pure-python ``_seq_cos`` driver path, so the rankings are
    bit-identical; stable argsort reproduces ``sorted((-cos, i))``."""
    import math

    Q, d = Qm.shape
    qsq = np.zeros(Q, dtype=np.float64)
    for j in range(d):
        qsq = qsq + Qm[:, j] * Qm[:, j]
    qn = np.sqrt(qsq)
    ncent = len(centroids)
    dots = _np_query_cent_dots(Qm, centroids)
    cn = np.empty(ncent, dtype=np.float64)
    for ci, c in enumerate(centroids):
        cn[ci] = math.sqrt(_seq_dot(c, c))
    cos = dots / (qn[:, None] * cn[None, :])
    return np.argsort(-cos, axis=1, kind="stable")[:, :min(nprobe, ncent)]


def ivfpq_adc_topk(indexed: DataFrame, centroids: list, codebooks: list,
                   queries: DataFrame, k: int = 3, nprobe: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id",
                   residual: bool = False,
                   q_max: int = 1024,
                   distributed: bool | None = None) -> DataFrame:
    """Query-time half of :func:`ivfpq_ann_topk` over an EXISTING
    ``(id, cell, codes)`` frame — usable directly against a persisted
    index (:mod:`httpz_spark.operators.simindex`); the corpus embeddings
    are never touched at query time.

    ``residual=True`` scores codes that quantize ``v - centroid[cell]``
    (the FAISS IVFPQ rule): the reconstruction is ``c + r̂``, so
    ``ip(q, x̂) = ip(q, c) + ip(q, r̂)`` adds one per-(query, cell) term,
    and ``|x̂|² = |c|² + Σ_mi (2⟨c_mi, r̂_mi⟩ + |r̂_mi|²)`` folds the
    cross term into one precomputed ``(n_centroids x m x kc)`` table —
    O(tables) driver/closure cost, still zero embedding reads.

    Same two bit-identical paths as :func:`pq_adc_topk`, switched on
    ``q_max``: the driver path builds per-query LUTs in pure-python float
    order and ships them in the closure (right at FAISS's
    few-queries/huge-corpus shape); the distributed path broadcasts the
    raw query matrix, ranks probe cells with :func:`_np_probe_cells`
    (vectorized, bit-equal), and builds LUTs once per task inside the
    Arrow stage, scoring candidates by a vectorized ``(qidx, code)``
    gather — no per-query python loop anywhere, so 10^5+ query sets
    (corpus-vs-corpus retrieval) neither sit on the driver nor bloat the
    task closure."""
    qids, Qm = _collect_queries(queries, query_id_col, vec_col)
    if distributed is None:
        distributed = len(qids) > q_max
    if distributed and len(qids):
        return _ivfpq_adc_topk_dist(indexed, centroids, codebooks, qids, Qm,
                                    k, nprobe, id_col, residual)
    return _ivfpq_adc_topk_driver(indexed, centroids, codebooks, qids, Qm,
                                  k, nprobe, id_col, residual)


def _residual_cell_tables(centroids: list, codebooks: list, normsq: list):
    """``(cnormsq[cell], combo[mi][cell][ki])`` where combo folds the
    reconstruction cross term: ``2·⟨c_mi, r̂_mi⟩ + |r̂_mi|²``.  Pure-python
    scalar accumulation (left-to-right per dim), shared verbatim by the
    driver and distributed residual paths."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    cnormsq = [_seq_dot(c, c) for c in centroids]
    combo = []
    for mi in range(m):
        t = []
        for c in centroids:
            row = []
            for ki, r in enumerate(codebooks[mi]):
                acc = 0.0
                for j in range(sub):
                    acc += 2.0 * float(c[mi * sub + j]) * float(r[j])
                row.append(acc + normsq[mi][ki])
            t.append(row)
        combo.append(t)
    return cnormsq, combo


def _ivfpq_adc_topk_driver(indexed: DataFrame, centroids: list,
                           codebooks: list, qids: "np.ndarray",
                           Qm: "np.ndarray", k: int, nprobe: int,
                           id_col: str, residual: bool = False) -> DataFrame:
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])

    normsq = _adc_normsq(codebooks)
    cell_tabs = (_residual_cell_tables(centroids, codebooks, normsq)
                 if residual else None)
    probe_pairs = []
    luts = {}
    for qi in range(len(qids)):
        qid = int(qids[qi])
        qv = [float(x) for x in Qm[qi]]
        if len(qv) != m * sub:  # trailing-dim truncation must fail loudly
            raise ValueError(
                f"query dim {len(qv)} != m*sub = {m}*{sub} of the codebooks"
            )
        coss = [_seq_cos(qv, c) for c in centroids]
        probed = [i for _, i in sorted((-c, i) for i, c in enumerate(coss))[:nprobe]]
        probe_pairs.extend((qid, int(cell)) for cell in probed)
        qn = 0.0
        for x in qv:
            qn += x * x
        qn = qn ** 0.5
        ip = [
            [sum(qv[mi * sub + j] * c[j] for j in range(sub))
             for c in codebooks[mi]]
            for mi in range(m)
        ]
        qc = [_seq_dot(qv, c) for c in centroids] if residual else None
        luts[qid] = (qn, ip, qc)

    spark = indexed.sparkSession
    probe_df = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )
    cand = indexed.join(probe_df, "cell")

    def score(batches):
        np_normsq = [np.asarray(t, dtype=np.float64) for t in normsq]
        if residual:
            np_cnormsq = np.asarray(cell_tabs[0], dtype=np.float64)
            np_combo = [np.asarray(t, dtype=np.float64) for t in cell_tabs[1]]
        np_luts = {
            qid: (qn,
                  [np.asarray(t, dtype=np.float64) for t in ip],
                  np.asarray(qc, dtype=np.float64) if qc is not None else None)
            for qid, (qn, ip, qc) in luts.items()
        }
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray([list(c) for c in pdf["codes"]], dtype=np.int64)
            qids = pdf["query_id"].to_numpy()
            if residual:
                # |x̂|² = |c|² + Σ_mi (2⟨c_mi, r̂_mi⟩ + |r̂_mi|²), per (cell, code)
                cells_arr = pdf["cell"].to_numpy(dtype=np.int64)
                nsum = np_cnormsq[cells_arr] + np_combo[0][cells_arr, C[:, 0]]
                for mi in range(1, m):
                    nsum = nsum + np_combo[mi][cells_arr, C[:, mi]]
            else:
                nsum = np_normsq[0][C[:, 0]]
                for mi in range(1, m):
                    nsum = nsum + np_normsq[mi][C[:, mi]]
            rnorm = np.sqrt(nsum)
            out = np.empty(len(C), dtype=np.float64)
            for qid in np.unique(qids):
                mask = qids == qid
                qn, ip, qc = np_luts[int(qid)]
                if residual:
                    # ⟨q, x̂⟩ = ⟨q, c⟩ + Σ_mi ⟨q_mi, r̂_mi⟩
                    s = qc[cells_arr[mask]] + ip[0][C[mask, 0]]
                else:
                    s = ip[0][C[mask, 0]]
                for mi in range(1, m):
                    s = s + ip[mi][C[mask, mi]]
                out[mask] = s / (qn * rnorm[mask])
            yield pd.DataFrame({
                "query_id": qids,
                "neighbor_id": pdf[id_col].to_numpy(),
                "approx_cos": out,
            })

    sel = ["query_id", F.col(id_col), "codes"] + (["cell"] if residual else [])
    scored = cand.select(*sel).mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivfpq_adc_topk_dist(indexed: DataFrame, centroids: list,
                         codebooks: list, qids: "np.ndarray",
                         Qm: "np.ndarray", k: int, nprobe: int,
                         id_col: str, residual: bool = False) -> DataFrame:
    """Distributed IVFPQ ADC: probe ranking is one vectorized numpy pass
    on the driver (cheap — Q x n_centroids x d flops, no python loops),
    the query matrix rides a torrent broadcast, and each task builds the
    LUTs once with :func:`_np_query_luts`; candidate scoring is a fully
    vectorized ``(query_row, code)`` fancy gather keyed by searchsorted
    query ids — bit-identical to the driver path's per-qid masked loop.
    ``residual=True`` adds the per-(query, cell) ``⟨q, c⟩`` gather and the
    precomputed cell/combo tables, in the driver path's accumulation
    order."""
    import pandas as pd

    m = len(codebooks)
    sub = len(codebooks[0][0])
    if Qm.shape[1] != m * sub:  # trailing-dim truncation must fail loudly
        raise ValueError(
            f"query dim {Qm.shape[1]} != m*sub = {m}*{sub} of the codebooks"
        )
    normsq = _adc_normsq(codebooks)
    cell_tabs = (_residual_cell_tables(centroids, codebooks, normsq)
                 if residual else None)
    cells = _np_probe_cells(Qm, centroids, nprobe)
    probe_pairs = [(int(qids[qi]), int(c))
                   for qi in range(len(qids)) for c in cells[qi]]
    spark = indexed.sparkSession
    probe_df = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )
    cand = indexed.join(probe_df, "cell")
    bq = spark.sparkContext.broadcast((qids, Qm))
    lut_key, lut_paths = _publish_query_luts(spark.sparkContext, Qm, codebooks)

    def score(batches):
        b_qids, b_Qm = bq.value
        qn, ip = _cached_query_luts(lut_key, b_Qm, codebooks, lut_paths)
        np_normsq = [np.asarray(t, dtype=np.float64) for t in normsq]
        if residual:
            np_cnormsq = np.asarray(cell_tabs[0], dtype=np.float64)
            np_combo = [np.asarray(t, dtype=np.float64) for t in cell_tabs[1]]
            qc = _np_query_cent_dots(b_Qm, centroids)  # (Q, ncell)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.asarray([list(c) for c in pdf["codes"]], dtype=np.int64)
            rq = pdf["query_id"].to_numpy(dtype=np.int64)
            qidx = np.searchsorted(b_qids, rq)
            if residual:
                cells_arr = pdf["cell"].to_numpy(dtype=np.int64)
                nsum = np_cnormsq[cells_arr] + np_combo[0][cells_arr, C[:, 0]]
                for mi in range(1, m):
                    nsum = nsum + np_combo[mi][cells_arr, C[:, mi]]
            else:
                nsum = np_normsq[0][C[:, 0]]
                for mi in range(1, m):
                    nsum = nsum + np_normsq[mi][C[:, mi]]
            rnorm = np.sqrt(nsum)
            if residual:
                s = qc[qidx, cells_arr] + ip[0][qidx, C[:, 0]]
            else:
                s = ip[0][qidx, C[:, 0]]
            for mi in range(1, m):
                s = s + ip[mi][qidx, C[:, mi]]
            out = s / (qn[qidx] * rnorm)
            yield pd.DataFrame({
                "query_id": rq,
                "neighbor_id": pdf[id_col].to_numpy(),
                "approx_cos": out,
            })

    sel = ["query_id", F.col(id_col), "codes"] + (["cell"] if residual else [])
    scored = cand.select(*sel).mapInPandas(
        score, schema="query_id long, neighbor_id long, approx_cos double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

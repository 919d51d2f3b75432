"""Distributed ADC query path (pq_adc_topk / ivfpq_adc_topk, Q > q_max).

The contract: the broadcast-LUT executor-side path is BIT-IDENTICAL to the
driver-LUT path on every (query_id, rank, neighbor_id, approx_cos) cell —
same float accumulation order, same tie rules — so flipping ``q_max`` (or
forcing ``distributed=``) can never change results, only the plan.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from httpz_spark.operators import similarity as SIM
from httpz_spark.operators.simindex import IVFPQIndex, PQIndex


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _queries(emb, n=8):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _cells(df):
    return sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["approx_cos"])
        for r in df.collect()
    )


def test_np_query_luts_bit_equal_to_driver_luts(spark, emb):
    """The vectorized LUT builder reproduces the pure-python one bit for
    bit (same left-to-right per-dim adds, one sqrt)."""
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    qpdf = (
        emb.filter(F.col("vec_id") < 16)
        .orderBy("vec_id").select("embedding").toPandas()
    )
    Qm = np.asarray([list(map(float, v)) for v in qpdf["embedding"]],
                    dtype=np.float64)
    qnorm, ip = SIM._np_query_luts(Qm, cb)
    m, sub = len(cb), len(cb[0][0])
    for qi in range(len(Qm)):
        qv = [float(x) for x in Qm[qi]]
        qn = 0.0
        for x in qv:
            qn += x * x
        qn = qn ** 0.5
        assert qnorm[qi] == qn  # bit equality, not approx
        for mi in range(m):
            for ki, c in enumerate(cb[mi]):
                ref = sum(qv[mi * sub + j] * c[j] for j in range(sub))
                assert ip[mi][qi, ki] == ref


def test_select_topk_matches_brute_force():
    rng = np.random.Generator(np.random.PCG64(7))
    qrows = rng.integers(0, 5, size=400)
    ids = rng.integers(0, 50, size=400)
    scores = rng.choice(np.linspace(-1, 1, 21), size=400)  # force ties
    qr, iD, sc = SIM._select_topk(qrows, ids, scores.astype(np.float64), 3)
    got = sorted(zip(qr.tolist(), iD.tolist(), sc.tolist()))
    want = []
    for q in np.unique(qrows):
        cand = sorted(
            [(-scores[i], ids[i]) for i in range(400) if qrows[i] == q]
        )[:3]
        want.extend((int(q), int(i), float(-s)) for s, i in cand)
    assert got == sorted(want)


def test_pq_adc_distributed_bit_equal(spark, emb):
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    codes = SIM.pq_encode(emb, cb)
    q = _queries(emb)
    drv = SIM.pq_adc_topk(codes, cb, q, k=3, distributed=False)
    dst = SIM.pq_adc_topk(codes, cb, q, k=3, distributed=True)
    assert _cells(drv) == _cells(dst)


def test_pq_adc_distributed_bit_equal_small_chunks(spark, emb):
    """Exercise the chunked (Q x chunk) scoring + the task-local top-k
    compaction by shrinking the chunk budget below the batch size."""
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    codes = SIM.pq_encode(emb.limit(300), cb)
    # 64 queries drives chunk = 2^22 // 64 = 65536 > n, so repartition to
    # many tiny batches instead to force the accumulator to compact
    q = _queries(emb, 64)
    drv = SIM.pq_adc_topk(codes.repartition(16), cb, q, k=2,
                          distributed=False)
    dst = SIM.pq_adc_topk(codes.repartition(16), cb, q, k=2,
                          distributed=True)
    assert _cells(drv) == _cells(dst)


def test_ivfpq_adc_distributed_bit_equal(spark, emb):
    cents = SIM._centroid_arrays(emb, "vec_id", "embedding", 16)
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    cells = SIM.ivf_assign(emb.select("vec_id", "embedding"), cents)
    codes = SIM.pq_encode(emb, cb)
    indexed = cells.select("vec_id", "cell").join(codes, "vec_id")
    q = _queries(emb)
    drv = SIM.ivfpq_adc_topk(indexed, cents, cb, q, k=3, nprobe=4,
                             distributed=False)
    dst = SIM.ivfpq_adc_topk(indexed, cents, cb, q, k=3, nprobe=4,
                             distributed=True)
    assert _cells(drv) == _cells(dst)


def test_np_probe_cells_matches_seq_cos_ranking(spark, emb):
    """Probe-cell ranking: vectorized argsort(-cos, stable) == the driver
    path's sorted((-_seq_cos, i)) for every query."""
    cents = SIM._centroid_arrays(emb, "vec_id", "embedding", 16)
    qpdf = _queries(emb, 32).orderBy("query_id").select("embedding").toPandas()
    Qm = np.asarray([list(map(float, v)) for v in qpdf["embedding"]],
                    dtype=np.float64)
    got = SIM._np_probe_cells(Qm, cents, 4)
    for qi in range(len(Qm)):
        qv = [float(x) for x in Qm[qi]]
        coss = [SIM._seq_cos(qv, c) for c in cents]
        want = [i for _, i in sorted((-c, i) for i, c in enumerate(coss))[:4]]
        assert got[qi].tolist() == want


def test_q_max_auto_switch(spark, emb, monkeypatch):
    """distributed=None flips to the broadcast path exactly when
    Q > q_max — and the switch is output-invisible."""
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    codes = SIM.pq_encode(emb.limit(200), cb)
    calls = []
    real = SIM._pq_adc_topk_dist

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(SIM, "_pq_adc_topk_dist", spy)
    q = _queries(emb, 8)
    base = _cells(SIM.pq_adc_topk(codes, cb, q, k=2, q_max=16))
    assert not calls  # 8 <= 16: driver path
    auto = _cells(SIM.pq_adc_topk(codes, cb, q, k=2, q_max=4))
    assert calls  # 8 > 4: distributed path
    assert base == auto


def test_index_topk_passthrough(spark, emb, tmp_path):
    """PQIndex/IVFPQIndex.topk forward the path switch; persisted-index
    queries are identical on both paths."""
    q = _queries(emb, 6)
    pq = PQIndex.build(spark, str(tmp_path / "pq"), emb.limit(400),
                       m=8, kc=16, train=False)
    assert _cells(pq.topk(q, k=3, distributed=False)) == \
        _cells(pq.topk(q, k=3, distributed=True))
    ivf = IVFPQIndex.build(spark, str(tmp_path / "ivfpq"), emb.limit(400),
                           n_centroids=8, m=8, kc=16)
    assert _cells(ivf.topk(q, k=3, nprobe=3, distributed=False)) == \
        _cells(ivf.topk(q, k=3, nprobe=3, distributed=True))


# -- residual IVFPQ (FAISS rule: quantize v - centroid[cell]) ---------------


def test_ivfpq_residual_encode_matches_scalar_model(spark, emb):
    """Residual codes == PQ codes of (v - centroid[cell]) computed by an
    independent per-row scalar pass."""
    cents = SIM._centroid_arrays(emb, "vec_id", "embedding", 8)
    cb = SIM.residual_codebooks_fixed(emb, cents, m=8, kc=16)
    rows = (
        SIM.ivfpq_encode(emb.limit(64), cents, cb, residual=True)
        .orderBy("vec_id").collect()
    )
    pdf = emb.limit(64).orderBy("vec_id").toPandas()
    X = np.asarray([list(map(float, v)) for v in pdf["embedding"]],
                   dtype=np.float64)
    C = np.asarray(cents, dtype=np.float64)
    for r, vid in zip(rows, pdf["vec_id"]):
        assert r["vec_id"] == vid
        want = SIM._pq_encode_rows(
            X[pdf["vec_id"].tolist().index(vid)][None, :] - C[r["cell"]][None, :], cb
        )[0]
        assert list(r["codes"]) == [int(x) for x in want]


def test_ivfpq_residual_scores_match_reconstruction(spark, emb):
    """approx_cos under residual=True equals cos(q, centroid + r̂) by an
    independent numpy reconstruction (the folded |x̂|² / cross-term tables
    are algebra, not approximation)."""
    cents = SIM._centroid_arrays(emb, "vec_id", "embedding", 8)
    cb = SIM.residual_codebooks_fixed(emb, cents, m=8, kc=16)
    indexed = SIM.ivfpq_encode(emb.limit(200), cents, cb, residual=True)
    q = _queries(emb, 4)
    got = SIM.ivfpq_adc_topk(indexed, cents, cb, q, k=5, nprobe=3,
                             residual=True, distributed=False)
    code_by_id = {r["vec_id"]: (r["cell"], list(r["codes"]))
                  for r in indexed.collect()}
    qv_by_id = {r["query_id"]: np.asarray(list(map(float, r["embedding"])))
                for r in q.collect()}
    C = np.asarray(cents, dtype=np.float64)
    m, sub = len(cb), len(cb[0][0])
    for r in got.collect():
        cell, codes = code_by_id[r["neighbor_id"]]
        rhat = np.concatenate([np.asarray(cb[mi][codes[mi]]) for mi in range(m)])
        xhat = C[cell] + rhat
        qv = qv_by_id[r["query_id"]]
        want = float(qv @ xhat / (np.linalg.norm(qv) * np.linalg.norm(xhat)))
        assert abs(r["approx_cos"] - want) < 1e-9


def test_ivfpq_residual_bit_equal_paths(spark, emb):
    cents = SIM._centroid_arrays(emb, "vec_id", "embedding", 16)
    cb = SIM.train_residual_pq_codebooks(emb, cents, m=8, kc=16)
    indexed = SIM.ivfpq_encode(emb, cents, cb, residual=True)
    q = _queries(emb)
    drv = SIM.ivfpq_adc_topk(indexed, cents, cb, q, k=3, nprobe=4,
                             residual=True, distributed=False)
    dst = SIM.ivfpq_adc_topk(indexed, cents, cb, q, k=3, nprobe=4,
                             residual=True, distributed=True)
    assert _cells(drv) == _cells(dst)


def test_ivfpq_residual_recall_beats_raw(spark, emb):
    """The FAISS rationale made measurable: at the SAME (m, kc) budget,
    quantizing residuals (a much tighter distribution than raw vectors)
    must recover more of the exact top-k."""
    queries = _queries(emb, 8)
    exact = {}
    for r in SIM.cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(residual):
        got = {}
        res = SIM.ivfpq_ann_topk(emb, queries, k=5, n_centroids=16,
                                 nprobe=4, m=8, kc=16, train=True,
                                 residual=residual)
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(exact[q] & got[q]) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    raw, res = recall(False), recall(True)
    assert res > raw, (res, raw)


def test_ivfpq_index_residual_persist_roundtrip(spark, emb, tmp_path):
    """residual flag persists in the meta file; a reopened index scores
    identically (both execution paths)."""
    q = _queries(emb, 6)
    built = IVFPQIndex.build(spark, str(tmp_path / "r"), emb.limit(400),
                             n_centroids=8, m=8, kc=16, residual=True)
    assert built.residual
    reopened = IVFPQIndex.open(spark, str(tmp_path / "r"))
    assert reopened.residual
    base = _cells(built.topk(q, k=3, nprobe=3, distributed=False))
    assert _cells(reopened.topk(q, k=3, nprobe=3, distributed=False)) == base
    assert _cells(reopened.topk(q, k=3, nprobe=3, distributed=True)) == base


def test_published_luts_mmap_bit_equal_and_fallback(spark, emb):
    """The driver-published mmap LUTs hold the byte-exact
    _np_query_luts output (so the shared-file path cannot diverge from
    the per-worker build), and _cached_query_luts falls back to building
    when the files are gone (eviction / cluster executor)."""
    import numpy as np

    from httpz_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    Qm = rng.standard_normal((50, 64))
    cb = [[list(rng.standard_normal(8)) for _ in range(16)] for _ in range(8)]
    key, paths = S._publish_query_luts(spark.sparkContext, Qm, cb)
    assert paths is not None  # local master publishes
    qn_ref, ip_ref = S._np_query_luts(Qm, cb)
    qn_mm, ip_mm = S._cached_query_luts(key, Qm, cb, paths)
    assert np.array_equal(np.asarray(qn_mm), qn_ref)
    for a, b in zip(ip_mm, ip_ref):
        assert np.array_equal(np.asarray(a), b)
    # publish-eviction bound: pushing more queries unlinks the oldest files
    import os

    for _ in range(S._LUT_PUB_MAX + 1):
        S._publish_query_luts(spark.sparkContext, Qm, cb)
    assert not os.path.exists(paths[0]) and not os.path.exists(paths[1])
    # a worker that misses its files (key2 not in its memo) must rebuild
    S._LUT_CACHE.clear()
    qn_fb, ip_fb = S._cached_query_luts(key, Qm, cb, paths)
    assert np.array_equal(np.asarray(qn_fb), qn_ref)
    for a, b in zip(ip_fb, ip_ref):
        assert np.array_equal(np.asarray(a), b)


def test_pq_adc_three_paths_identical(spark, emb, monkeypatch):
    """driver == codes-distributed == query-distributed on the same
    input.  The qdist small-corpus dispatch would normally swallow every
    test-sized corpus, so the codes-distributed path is pinned by
    forcing the dispatch threshold to zero."""
    cb = SIM.pq_codebooks_fixed(emb, m=8, kc=16)
    codes = SIM.pq_encode(emb.limit(400), cb)
    q = _queries(emb, 48)
    drv = _cells(SIM.pq_adc_topk(codes, cb, q, k=3, distributed=False))
    qdist = _cells(SIM.pq_adc_topk(codes, cb, q, k=3, distributed=True))
    monkeypatch.setattr(SIM, "_ADC_QDIST_MAX_CODES", 0)
    cdist = _cells(SIM.pq_adc_topk(codes, cb, q, k=3, distributed=True))
    assert drv == qdist == cdist

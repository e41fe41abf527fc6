"""Relational-analytics demo queries that live outside the 50-entry driver
registry (TPC-H q3 / q5ish / top-customers) plus the last-commit trio
(sessionize, dedup_groups, cosine_topk_ivf) — DuckDB-oracled here so every
shipped module keeps a passing check of record."""

import duckdb
import pytest
from pyspark.sql import functions as F


def duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region",
              "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def norm(rows):
    return sorted(
        [tuple(round(v, 4) if isinstance(v, float) else v for v in r) for r in rows],
        key=repr,
    )


# ------------------------------------------------------------------ TPC-H

def test_tpch_q3(spark, sf_dir):
    import __spark_entry__ as e

    got = norm([tuple(r) for r in e.q_tpch_q3(spark, sf_dir).collect()])
    want = norm(duck(sf_dir, e.O_TPCH_Q3))
    assert got == want and len(got) > 0


def test_tpch_q5ish(spark, sf_dir):
    import __spark_entry__ as e

    got = norm([tuple(r) for r in e.q_tpch_q5ish(spark, sf_dir).collect()])
    want = norm(duck(sf_dir, e.O_TPCH_Q5))
    assert got == want and len(got) > 0


def test_top_customers(spark, sf_dir):
    import __spark_entry__ as e

    got = norm([tuple(r) for r in e.q_top_customers(spark, sf_dir).collect()])
    want = norm(duck(sf_dir, e.O_TOP_CUSTOMERS))
    assert got == want and len(got) == 10


# -------------------------------------------------------------- sessionize

def test_sessionize_matches_lag_oracle(spark, sf_dir):
    from hyperdx_spark.analytics.sessionize import sessionize
    from hyperdx_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    out = sessionize(ev, ts_col="ts", key_cols=("user_id",), gap="4 hours")
    got = norm([tuple(r) for r in out.collect()])
    want = norm(
        duck(
            sf_dir,
            """
            WITH s AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 4 HOUR
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM s)
            SELECT user_id, min(ts), max(ts) + INTERVAL 4 HOUR, count(*)
            FROM g GROUP BY user_id, sid
            """,
        )
    )
    assert got == want and len(got) > 0


def test_sessionize_merges_within_gap(spark):
    from datetime import datetime

    from hyperdx_spark.analytics.sessionize import sessionize

    rows = [
        (1, datetime(2024, 1, 1, 0, 0)),
        (1, datetime(2024, 1, 1, 0, 20)),   # merges (< 30m after previous)
        (1, datetime(2024, 1, 1, 1, 0)),    # merges (40m? no — 40m > 30m gap)
        (2, datetime(2024, 1, 1, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, ts_col="ts", key_cols=("user_id",), gap="30 minutes")
    got = {(r["user_id"], r["session_start"].minute, r["n_events"]) for r in out.collect()}
    assert got == {(1, 0, 2), (1, 0, 1), (2, 0, 1)}


# ------------------------------------------------------------ dedup_groups

def test_dedup_groups_known_components(spark):
    # two components: {1,2,3} (chain) and {7,8}; singletons never appear
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    from hyperdx_spark.pipeline.dedup import dedup_groups

    out = {r["id"]: (r["group_id"], r["is_keeper"]) for r in dedup_groups(pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        7: (7, True), 8: (7, False),
    }


def test_dedup_groups_long_chain_converges(spark):
    # a 12-node chain needs ~diameter rounds; must converge well under the cap
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    from hyperdx_spark.pipeline.dedup import dedup_groups

    out = dedup_groups(pairs, max_iterations=20).collect()
    assert {r["group_id"] for r in out} == {0}
    assert sum(r["is_keeper"] for r in out) == 1


def test_dedup_groups_warns_without_convergence(spark):
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    from hyperdx_spark.pipeline.dedup import dedup_groups

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup_groups(pairs, max_iterations=2).collect()
        assert any("did not converge" in str(x.message) for x in w)


# ------------------------------------------------------------------- IVF

def test_ivf_exact_when_probing_all_lists(spark, sf_dir):
    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    brute = norm([tuple(r) for r in similarity.cosine_topk(emb, qs, k=5).collect()])
    # both corpus-assignment paths: arrow (default, numpy batch) and the
    # interpreted Column walk must each reproduce brute at full probe
    for arrow in (True, False):
        ivf = norm(
            [
                tuple(r)
                for r in similarity.cosine_topk_ivf(
                    emb, qs, k=5, nlist=8, nprobe=8, arrow=arrow
                ).collect()
            ]
        )
        assert ivf == brute and len(ivf) == 15, f"arrow={arrow}"


def test_ivf_recall_with_partial_probe(spark, sf_dir):
    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5)
    brute = similarity.cosine_topk(emb, qs, k=10)
    ivf = similarity.cosine_topk_ivf(emb, qs, k=10, nlist=8, nprobe=4)
    b = {(r["query_id"], r["match_id"]) for r in brute.collect()}
    i = {(r["query_id"], r["match_id"]) for r in ivf.collect()}
    recall = len(b & i) / len(b)
    assert recall >= 0.5, f"IVF nprobe=nlist/2 recall collapsed: {recall}"


def test_ivf_persisted_index_matches_brute(spark, sf_dir, tmp_path):
    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, nlist=8)
    out = similarity.query_ivf_index(spark, path, qs, k=5, nprobe=8)
    got = norm([tuple(r) for r in out.collect()])
    brute = norm([tuple(r) for r in similarity.cosine_topk(emb, qs, k=5).collect()])
    assert got == brute and len(got) == 15
    # partition pruning: the list scan must carry a cent_id partition filter
    part = similarity.query_ivf_index(spark, path, qs, k=5, nprobe=2)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan


def test_pq_exact_when_refine_covers_corpus(spark, sf_dir):
    from pyspark.sql import functions as F

    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    brute = sorted(
        tuple(r)
        for r in similarity.cosine_topk(emb, qs, k=5)
        .select("query_id", "match_id", "rank")
        .collect()
    )
    # refine >= |corpus| -> stage-2 re-ranks every row by exact cosine, so
    # PQ quantization error cannot change the output: identical to brute —
    # on BOTH encode paths (arrow numpy batch and interpreted Column)
    for arrow in (True, False):
        pq = sorted(
            tuple(r)
            for r in similarity.cosine_topk_pq(
                emb, qs, k=5, m=8, codes=8, refine=10**6, arrow=arrow
            )
            .select("query_id", "match_id", "rank")
            .collect()
        )
        assert pq == brute, f"arrow={arrow}"


def test_pq_recall_with_small_refine(spark, sf_dir):
    from pyspark.sql import functions as F

    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    brute = {
        (r["query_id"], r["match_id"])
        for r in similarity.cosine_topk(emb, qs, k=5).collect()
    }
    pq = {
        (r["query_id"], r["match_id"])
        for r in similarity.cosine_topk_pq(
            emb, qs, k=5, m=8, codes=16, refine=50
        ).collect()
    }
    recall = len(pq & brute) / len(brute)
    assert recall >= 0.6, recall
    # codes are attached deterministically
    books = similarity.pq_codebooks(emb, m=8, codes=16)
    enc1 = similarity.pq_encode(emb, books).select("vec_id", "pq_code").collect()
    enc2 = similarity.pq_encode(emb, books).select("vec_id", "pq_code").collect()
    assert sorted(map(tuple, enc1)) == sorted(map(tuple, enc2))


def test_ivfpq_persisted_index_matches_brute(spark, sf_dir, tmp_path):
    """IVF-PQ composition: partition-pruned list scan + ADC code ranking +
    exact re-rank. With nprobe=nlist and refine covering the corpus the
    output is exactly brute force; with partial probing the plan must
    still prune partitions."""
    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(emb, path, nlist=8, m=8, codes=8)
    out = similarity.query_ivfpq_index(
        spark, path, qs, k=5, nprobe=8, refine=10**6
    )
    got = norm([tuple(r) for r in out.collect()])
    brute = norm([tuple(r) for r in similarity.cosine_topk(emb, qs, k=5).collect()])
    assert got == brute and len(got) == 15
    # partial probe: pruned scan, and recall stays sane on the fixture
    part = similarity.query_ivfpq_index(spark, path, qs, k=5, nprobe=2, refine=50)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan
    brute_pairs = {
        (r["query_id"], r["match_id"])
        for r in similarity.cosine_topk(emb, qs, k=5).collect()
    }
    part_pairs = {(r["query_id"], r["match_id"]) for r in part.collect()}
    assert len(part_pairs & brute_pairs) >= len(brute_pairs) // 3


def test_ivfpq_residual_and_raw_encodings(spark, sf_dir, tmp_path):
    """IVFADC residual encoding (r16, the build default): both encodings
    are exact under full probe + corpus-covering refine, the meta flag
    routes the query to the matching ADC-table shape, and a meta-less
    (pre-r16) index layout still reads as raw."""
    import shutil

    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    brute = norm([tuple(r) for r in similarity.cosine_topk(emb, qs, k=5).collect()])
    for residual in (True, False):
        path = str(tmp_path / f"ivfpq_res_{residual}")
        similarity.build_ivfpq_index(
            emb, path, nlist=8, m=8, codes=8, residual=residual
        )
        meta = spark.read.parquet(path + "/meta").collect()
        assert [r["residual"] for r in meta] == [residual]
        out = norm(
            [
                tuple(r)
                for r in similarity.query_ivfpq_index(
                    spark, path, qs, k=5, nprobe=8, refine=10**6
                ).collect()
            ]
        )
        assert out == brute, f"residual={residual}"
    # pre-meta layout: a raw index whose meta dir is gone must read
    # identically (the residual branch would mis-score raw codes)
    raw_path = str(tmp_path / "ivfpq_res_False")
    partial = norm(
        [
            tuple(r)
            for r in similarity.query_ivfpq_index(
                spark, raw_path, qs, k=5, nprobe=4, refine=20
            ).collect()
        ]
    )
    shutil.rmtree(raw_path + "/meta")
    legacy = norm(
        [
            tuple(r)
            for r in similarity.query_ivfpq_index(
                spark, raw_path, qs, k=5, nprobe=4, refine=20
            ).collect()
        ]
    )
    assert legacy == partial


def test_pq_encode_normalize_false_paths_agree(spark):
    """pq_encode and pq_encode_arrow must assign identical codes with
    normalize=False (the residual-encoding contract) — including on
    vectors whose norm is far from 1, which the normalize=True path
    would collapse."""
    from hyperdx_spark.pipeline import similarity

    rows = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_codebooks(
        df, m=4, codes=4, normalize=False
    )
    a = sorted(
        map(
            tuple,
            similarity.pq_encode(df, books, normalize=False)
            .select("vec_id", "pq_code")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            similarity.pq_encode_arrow(df, books, normalize=False)
            .select("vec_id", "pq_code")
            .collect(),
        )
    )
    assert [(i, list(c)) for i, c in a] == [(i, list(c)) for i, c in b]
    # and the codes differ from the normalized encode somewhere — the
    # flag is actually load-bearing on non-unit vectors
    c = sorted(
        map(
            tuple,
            similarity.pq_encode(df, books)
            .select("vec_id", "pq_code")
            .collect(),
        )
    )
    assert a != c


@pytest.mark.parametrize("residual", [True, False])
def test_ivfpq_query_numpy_twin(spark, tmp_path, residual):
    """Independent replay of the IVF-PQ QUERY math, both encodings: given
    the persisted index artifacts (lists/centroids/codebooks/meta) as
    plain data, a pure-numpy twin computes the expected partial-refine
    output — probe selection, ADC tables (per-(query, list) for residual,
    per-query for raw), (adc, id) candidate cut, exact-cosine re-rank —
    and must agree with query_ivfpq_index exactly on ranks.  Closes the
    loop the recall measurements can't: they bound quality, not the table
    indexing (an off-by-one in the ``table[j][code_j]`` lookup could
    survive a recall floor)."""
    import numpy as np

    from hyperdx_spark.pipeline import similarity

    rng = np.random.default_rng(77)
    vecs = rng.normal(size=(24, 8)).round(3)  # well-separated, no ties
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "twin")
    similarity.build_ivfpq_index(emb, path, nlist=3, m=2, codes=4,
                                 residual=residual)
    qs = emb.where(F.col("vec_id") < 2)
    k, nprobe, refine = 3, 2, 5
    got = sorted(
        (r["query_id"], r["rank"], r["match_id"])
        for r in similarity.query_ivfpq_index(
            spark, path, qs, k=k, nprobe=nprobe, refine=refine
        ).collect()
    )

    # ---- numpy twin, from the artifacts only
    assert (
        spark.read.parquet(path + "/meta").collect()[0]["residual"]
        == residual
    )
    lists = spark.read.parquet(path + "/lists").collect()
    cents = sorted(
        spark.read.parquet(path + "/centroids").collect(),
        key=lambda r: r["cent_id"],
    )
    books = np.asarray(
        [
            [list(cw) for cw in book]
            for book in spark.read.parquet(path + "/codebooks").collect()[0][
                "__cb"
            ]
        ]
    )
    m, codes, sub = books.shape
    C = np.stack([np.asarray(r["cvec"]) for r in cents])
    Cn = C / np.linalg.norm(C, axis=1)[:, None]
    cent_ids = [r["cent_id"] for r in cents]
    expected = []
    for qid in (0, 1):
        qv = vecs[qid]
        qn = qv / np.linalg.norm(qv)
        # probe: top-nprobe centroids by cosine, ties id-asc (none here)
        cos_c = Cn @ (qv / np.linalg.norm(qv))
        probe = [
            cent_ids[j]
            for j in sorted(
                range(len(cent_ids)), key=lambda j: (-cos_c[j], cent_ids[j])
            )[:nprobe]
        ]
        cand = []
        for row in lists:
            if row["cent_id"] not in probe or row["match_id"] == qid:
                continue
            # residual: table base is the query's offset from THIS list's
            # centroid; raw: the unit query itself (per-query table)
            d = (
                qn - Cn[cent_ids.index(row["cent_id"])]
                if residual
                else qn
            )
            adc = sum(
                ((d[j * sub : (j + 1) * sub] - books[j][row["pq_code"][j]]) ** 2).sum()
                for j in range(m)
            )
            cand.append((adc, row["match_id"], np.asarray(row["vec"])))
        cand.sort(key=lambda t: (t[0], t[1]))
        top = cand[: max(refine, k)]
        rer = sorted(
            top,
            key=lambda t: (
                -(qv @ t[2]) / (np.linalg.norm(qv) * np.linalg.norm(t[2])),
                t[1],
            ),
        )
        expected.extend(
            (qid, rank + 1, mid) for rank, (_, mid, _) in enumerate(rer[:k])
        )
    assert got == sorted(expected)


def test_refit_centroids_pure_python_twin(spark):
    """Independent replay of the coarse-quantizer refit: unit-normalize +
    micro-unit quantize the seeds and corpus in pure Python (identical
    IEEE ops), one exact-integer Lloyd step (int argmin, exact sums,
    ``(2s+n)//(2n)`` means, empty clusters keep their seed), dequantize —
    must equal _refit_centroids bit-for-bit.  The refit is otherwise
    verified only through the composed index results (the untwinned-stage
    class the r15 verdict called out for the weighted recluster)."""
    import math

    from hyperdx_spark.pipeline import similarity
    from hyperdx_spark.pipeline.clustering import VEC_SCALE

    vals = [
        [0.3, -1.2, 0.7, 2.1], [1.1, 0.2, -0.4, 0.9], [-2.0, 0.5, 1.5, 0.1],
        [0.6, 0.6, 0.6, -0.6], [1.9, -0.3, 0.2, 0.8], [-0.7, 1.4, -1.1, 0.5],
        [0.0, 0.0, 0.0, 0.0],  # zero-norm row rides the guard
        [2.2, 1.0, -0.9, 1.3], [0.4, -0.8, 1.8, -1.6], [1.0, 1.0, 1.0, 1.0],
    ]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<double>",
    )
    cents = similarity._centroids(emb, id_col="vec_id", vec_col="embedding",
                                  nlist=3, seed=42)
    got = sorted(
        (r["cent_id"], list(r["cvec"]))
        for r in similarity._refit_centroids(
            emb, cents, vec_col="embedding", iterations=1
        ).collect()
    )

    # ---- pure-Python twin
    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    def quant(u):
        return [math.floor(x * float(VEC_SCALE) + 0.5) for x in u]

    rows = sorted(cents.collect(), key=lambda r: r["cent_id"])
    seeds = [quant(unit(list(r["cvec"]))) for r in rows]
    qs = [quant(unit(v)) for v in vals]
    sums = {}
    for q in qs:
        best, bd = 0, None
        for ci, s in enumerate(seeds):
            d = sum((a - b) ** 2 for a, b in zip(q, s))
            if bd is None or d < bd:
                best, bd = ci, d
        n, acc = sums.get(best, (0, [0, 0, 0, 0]))
        sums[best] = (n + 1, [a + v for a, v in zip(acc, q)])
    out = []
    for ci, r in enumerate(rows):
        if ci in sums:
            n, acc = sums[ci]
            cent = [(2 * s + n) // (2 * n) for s in acc]
        else:
            cent = seeds[ci]
        out.append((r["cent_id"], [c / VEC_SCALE for c in cent]))
    assert got == sorted(out)


def test_pca_then_ann_composition(spark, sf_dir, tmp_path):
    """PCA's documented purpose here is dim reduction AHEAD of the ANN
    tiers — pin that the projected space actually composes into them:
    the reduced column feeds the brute, IVF (full probe == brute in the
    reduced space), and persisted IVF-PQ paths without reshaping."""
    from hyperdx_spark.io import load_table
    from hyperdx_spark.pipeline import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    model = similarity.pca_fit(emb, k=8)
    red = similarity.pca_project(emb, model).select(
        "vec_id", F.col("pca").alias("embedding")
    )
    qs = red.where(F.col("vec_id") < 3)
    brute = norm(
        [tuple(r) for r in similarity.cosine_topk(red, qs, k=5).collect()]
    )
    ivf = norm(
        [
            tuple(r)
            for r in similarity.cosine_topk_ivf(
                red, qs, k=5, nlist=8, nprobe=8
            ).collect()
        ]
    )
    assert ivf == brute and len(brute) == 15
    path = str(tmp_path / "pca_ivfpq")
    similarity.build_ivfpq_index(red, path, nlist=8, m=4, codes=8)
    out = norm(
        [
            tuple(r)
            for r in similarity.query_ivfpq_index(
                spark, path, qs, k=5, nprobe=8, refine=10**6
            ).collect()
        ]
    )
    assert out == brute


def test_pca_fit_project_whiten(spark):
    """Distributed PCA: moments match numpy exactly, whitened projection
    has unit variance and decorrelated coordinates, components are
    deterministic under repartitioning."""
    import numpy as np

    from hyperdx_spark.pipeline import similarity

    rng = np.random.default_rng(0)
    Z = rng.normal(size=(400, 2)) @ np.array([[3.0, 0], [0, 1.0]])
    W = rng.normal(size=(2, 8))
    X = Z @ W + rng.normal(scale=0.01, size=(400, 8)) + 5.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    model = similarity.pca_fit(df, k=2)
    assert np.allclose(model["mean"], X.mean(0), atol=1e-9)
    cov = np.cov(X.T, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model["explained_variance"], evals[:2], rtol=1e-8)
    P = np.array([
        r["pca"] for r in similarity.pca_project(df, model, whiten=True)
        .select("pca").collect()
    ])
    assert np.allclose(P.var(0), [1.0, 1.0], atol=1e-6)
    assert abs(np.corrcoef(P.T)[0, 1]) < 1e-6
    # partitioning must not change the fitted model (float sums combine
    # driver-side from per-stream partials; tolerance covers the order)
    model2 = similarity.pca_fit(df.repartition(7), k=2)
    assert np.allclose(model2["mean"], model["mean"], atol=1e-9)
    assert np.allclose(
        np.abs(model2["components"]), np.abs(model["components"]), atol=1e-6
    )
    # centered two-pass mode (ADVICE r4): same subspace, cancellation-safe
    # even with a huge common offset; ddof=1 matches the sklearn convention
    df_off = spark.createDataFrame(
        [(i, [float(x + 1e7) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    mc = similarity.pca_fit(df_off, k=2, centered=True, ddof=1)
    cov1 = np.cov(X.T, bias=False)
    evals1 = np.sort(np.linalg.eigvalsh(cov1))[::-1]
    assert np.allclose(mc["explained_variance"], evals1[:2], rtol=1e-6)
    assert np.allclose(
        np.abs(mc["components"]), np.abs(model["components"]), atol=1e-5
    )


def test_pca_auto_centering(spark):
    """VERDICT r5 #7: centered="auto" (the default) escalates to the
    two-pass branch exactly when ‖μ‖²/mean-variance crosses
    PCA_AUTO_CENTER_RATIO, so large-common-offset corpora get the
    cancellation-safe path without knowing the flag."""
    import numpy as np

    from hyperdx_spark.pipeline import similarity

    rng = np.random.default_rng(1)
    X = rng.normal(size=(300, 6))

    def fit(offset, **kw):
        df = spark.createDataFrame(
            [(i, [float(x + offset) for x in row]) for i, row in enumerate(X)],
            "vec_id long, embedding array<double>",
        )
        return df, similarity.pca_fit(df, k=2, **kw)

    # benign corpus (‖μ‖² ≈ 0): auto stays on the cheap single pass
    _, m0 = fit(0.0)
    assert m0["centered"] is False
    # adversarial large common offset: ratio ≈ 6*(1e7)²/6 = 1e14 >> 1e6 —
    # auto takes the two-pass branch and recovers the true spectrum where
    # the single pass has lost every significant digit
    df_off, m_auto = fit(1e7)
    assert m_auto["centered"] is True
    evals = np.sort(np.linalg.eigvalsh(np.cov(X.T, bias=True)))[::-1]
    assert np.allclose(m_auto["explained_variance"], evals[:2], rtol=1e-6)
    m_forced = similarity.pca_fit(df_off, k=2, centered=True)
    assert np.allclose(
        m_auto["explained_variance"], m_forced["explained_variance"], rtol=0
    )
    # explicit False still means False (opt-out of the auto heuristic)
    m_single = similarity.pca_fit(df_off, k=2, centered=False)
    assert m_single["centered"] is False


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Co-located join layout: two tables bucketed the same way join with
    no Exchange in the physical plan (the write-once/join-many lever for
    100 TB correlation joins). Broadcast is disabled so the test proves
    bucketing, not broadcasting."""
    from hyperdx_spark.io import load_table, write_bucketed

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", "value")
    right = (
        ev.groupBy("user_id").count().withColumnRenamed("count", "n_events")
    )
    write_bucketed(left, "ev_bucketed", buckets=8, bucket_cols=["user_id"],
                   sort_cols=["user_id"])
    write_bucketed(right, "usr_bucketed", buckets=8, bucket_cols=["user_id"],
                   sort_cols=["user_id"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("ev_bucketed").join(
            spark.table("usr_bucketed"), on="user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # buckets pair file-to-file
        # the join is still correct
        assert joined.count() == spark.table("ev_bucketed").count()
        # a NON-bucketed copy of the same join needs two Exchanges
        plain = left.join(right, on="user_id")
        plan2 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS usr_bucketed")


def test_cosine_pairs_mega_bucket_cap(spark):
    """max_bucket_size drops degenerate buckets (a default embedding
    stamped on many rows — the embedding analogue of boilerplate) whose
    n² fan-out dominates at scale, while normal near-dup pairs survive."""
    import numpy as np

    from hyperdx_spark.pipeline import dedup, similarity

    rng = np.random.default_rng(3)
    rows = []
    stamp = [1.0] * 8  # 40 identical "default" vectors -> one mega bucket
    for i in range(40):
        rows.append((i, stamp))
    base = rng.normal(size=8)
    for i in range(2):  # one genuine near-dup pair, distinct bucket
        rows.append((100 + i, [float(x) for x in base + i * 1e-4]))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    capped = similarity.cosine_pairs(
        df, threshold=0.9, num_planes=16, bands=2, dim=8, max_bucket_size=10
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 100 and b < 100 for a, b in got)  # mega bucket dropped
    dedup.release_cached(capped)
    uncapped = similarity.cosine_pairs(
        df, threshold=0.9, num_planes=16, bands=2, dim=8, max_bucket_size=None
    )
    n = uncapped.count()
    assert n >= 40 * 39 // 2  # the fan-out the cap exists to prevent
    dedup.release_cached(uncapped)


def test_cosine_pairs_recall_guard(spark):
    """VERDICT r5 #5: recall-lossy (threshold, planes, bands) combinations
    warn at plan time; the gated default config stays silent; None opts
    out. Closed-form boundary: Charikar'02 collision probability."""
    import math
    import warnings as W

    import pytest

    from hyperdx_spark.pipeline import similarity

    # closed-form spot checks
    r = similarity.lsh_expected_recall
    assert abs(r(0.5, 16, 4) - (1 - (1 - (2 / 3) ** 4) ** 4)) < 1e-12
    assert r(1.0, 60, 3) == pytest.approx(1.0)
    assert r(0.9, 60, 3) < 0.2  # the precision-heavy corpus config
    p9 = 1 - math.acos(0.9) / math.pi
    assert abs(r(0.9, 16, 2) - (1 - (1 - p9 ** 8) ** 2)) < 1e-12

    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.warns(RuntimeWarning, match="banding recall"):
        similarity.cosine_pairs(df, threshold=0.9, num_planes=16, bands=2, dim=8)
    with W.catch_warnings():
        W.simplefilter("error")  # any warning would now raise
        # default gate config: recall 0.59 >= 0.5 floor -> silent
        similarity.cosine_pairs(df, threshold=0.5, dim=8)
        # explicit opt-out of the lossy config -> silent
        similarity.cosine_pairs(
            df, threshold=0.9, num_planes=16, bands=2, dim=8,
            min_expected_recall=None,
        )


def test_ensure_min_parallelism(spark):
    """The small-file rescue rule (io.ensure_min_parallelism): widen an
    under-partitioned frame to default parallelism, and — the part that
    matters at 100 TB — return a well-partitioned frame UNTOUCHED, since
    a repartition before an aggregation would defeat map-side combine."""
    from hyperdx_spark.io import ensure_min_parallelism

    par = spark.sparkContext.defaultParallelism
    few = spark.range(1000).coalesce(2)
    out = ensure_min_parallelism(few)
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 1000
    many = spark.range(1000).repartition(par + 4)
    assert ensure_min_parallelism(many) is many  # no shuffle inserted


def test_ensure_min_parallelism_without_rdd_api(spark):
    """Spark Connect guard (VERDICT r7 #4): when the plan's partition
    count can't be probed (df.rdd raises on Connect clients), the rescue
    degrades to a graceful no-op — the frame comes back UNTOUCHED instead
    of crashing — and the probe is attempted exactly once per call."""
    from hyperdx_spark.io import ensure_min_parallelism, num_partitions

    class _NoRddFrame:
        isStreaming = False

        def __init__(self):
            self.sparkSession = spark
            self.probes = 0

        @property
        def rdd(self):
            self.probes += 1
            raise Exception("RDD API is not supported in Spark Connect")

        def repartition(self, n):  # pragma: no cover - must not run
            raise AssertionError("no-op path must not repartition")

    df = _NoRddFrame()
    assert num_partitions(df) is None
    df.probes = 0
    assert ensure_min_parallelism(df, 64) is df
    assert df.probes == 1  # single probe per call site


def test_rotated_out_entries_still_match_oracles(spark):
    """Registry-rotation safety net (VERDICT r5 #6 / r6 #1): whichever
    six slots are currently OUT of the 50-entry driver registry keep a
    strict oracle check here — same canonicalization as the driver gate —
    so they cannot rot while unregistered. r7 restored the canonical set,
    so the net now covers the six standalone variants that held the r6
    rows."""
    import importlib.util
    import os

    import duckdb

    import __spark_entry__ as e

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_correctness.py"),
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in cc.TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    cases = {
        "q_fill_zero": (e.q_fill_zero, e.O_FILL_ZERO),
        "q_error_ratio": (e.q_error_ratio, e.O_ERROR_RATIO),
        "q_share_of_total": (e.q_share_of_total, e.O_SHARE),
        "q_hist_count": (e.q_hist_count, e.O_HIST_COUNT),
        "q_promql_offset": (e.q_promql_offset, e.O_PROMQL_OFFSET),
        "q_promql_absent": (e.q_promql_absent, e.O_PROMQL_ABSENT),
    }
    for name, (fn, osql) in cases.items():
        pdf = fn(spark, sf).toPandas()
        ddf = con.execute(osql).df()
        assert sorted(pdf.columns) == sorted(ddf.columns), name
        a = cc.rows_to_canon(list(pdf.columns), cc.pdf_rows(pdf), cc.canon_strict)
        b = cc.rows_to_canon(list(ddf.columns), cc.pdf_rows(ddf), cc.canon_strict)
        assert len(a) > 0 and a == b, name

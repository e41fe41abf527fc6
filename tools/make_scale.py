"""Build a larger scale factor from the driver's sf0.1 parquet, for
superlinearity checks (VERDICT r3 #9: prove the audited plans scale with
data, empirically).

Replicates every fact table N times with consistently shifted keys so join
degrees, group cardinalities, and dup-cluster structure scale linearly —
i.e. the data GROWS the way real data grows instead of producing
pathological exact duplicates:

* TPC-H keys (cust/supp/part/order) shift by a per-table stride per
  replica, and foreign keys shift in lockstep, so every join fans out
  exactly as at sf0.1 — just 10x more of them. region/nation stay fixed
  (TPC-H dims don't scale).
* events: 10x users, 10x event density over the SAME time range (how an
  observability workload actually grows).
* documents: replica text is passed through a per-replica consonant
  rotation (translate), so intra-replica near-dup structure is preserved
  while cross-replica similarity collapses — LSH/shingle workloads scale
  ~linearly instead of quadratically in candidate pairs.
* embeddings: per-replica epsilon shift so no exact-duplicate vectors.

Usage: python tools/make_scale.py [N] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 /root/repo/.scale/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

ROT = "etaoinsr"  # letters rotated per replica for document text


def _perm(i: int) -> str:
    return ROT[i % len(ROT):] + ROT[: i % len(ROT)]


def build(n: int, src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW reps AS SELECT unnest(range({n})) AS i")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def stride(name: str, key: str) -> int:
        return con.sql(f"SELECT max({key}) + 1 FROM {t(name)}").fetchone()[0]

    s_c = stride("customer", "c_custkey")
    s_s = stride("supplier", "s_suppkey")
    s_p = stride("part", "p_partkey")
    s_o = stride("orders", "o_orderkey")
    s_e = stride("events", "event_id")
    s_u = stride("events", "user_id")
    s_d = stride("documents", "doc_id")
    s_v = stride("embeddings", "vec_id")

    def emit(name: str, select: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.sql(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {rows} rows")

    for dim in ("region", "nation"):
        emit(dim, f"SELECT * FROM {t(dim)}")
    emit("customer", f"""
        SELECT c_custkey + i * {s_c} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')} CROSS JOIN reps""")
    emit("supplier", f"""
        SELECT s_suppkey + i * {s_s} AS s_suppkey,
               * EXCLUDE (s_suppkey)
        FROM {t('supplier')} CROSS JOIN reps""")
    emit("part", f"""
        SELECT p_partkey + i * {s_p} AS p_partkey, * EXCLUDE (p_partkey)
        FROM {t('part')} CROSS JOIN reps""")
    emit("orders", f"""
        SELECT o_orderkey + i * {s_o} AS o_orderkey,
               o_custkey + i * {s_c} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')} CROSS JOIN reps""")
    emit("lineitem", f"""
        SELECT l_orderkey + i * {s_o} AS l_orderkey,
               l_partkey + i * {s_p} AS l_partkey,
               l_suppkey + i * {s_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')} CROSS JOIN reps""")
    emit("events", f"""
        SELECT event_id + i * {s_e} AS event_id, ts,
               user_id + i * {s_u} AS user_id, event_type, value, props
        FROM {t('events')} CROSS JOIN reps""")
    text_case = "CASE i WHEN 0 THEN text " + " ".join(
        f"WHEN {i} THEN translate(text, '{ROT}', '{_perm(i)}')"
        for i in range(1, n)
    ) + " END"
    emit("documents", f"""
        SELECT doc_id + i * {s_d} AS doc_id, {text_case} AS text,
               lang, source, n_chars
        FROM {t('documents')} CROSS JOIN reps""")
    emit("embeddings", f"""
        SELECT vec_id + i * {s_v} AS vec_id,
               CAST(list_transform(embedding, x -> x + i * 0.001e0)
                    AS FLOAT[]) AS embedding,
               label
        FROM {t('embeddings')} CROSS JOIN reps""")


def build_corpus(n: int, src: str, dst: str) -> None:
    """One more decade for the adversarial-tier operators: documents and
    embeddings ONLY (the dedup/similarity workloads), with transforms that
    stay collision-free at ANY replica count — the full-table build's
    8-letter rotation (and the embeddings' epsilon shift) collide once
    replicas exceed the variant space, which would manufacture quadratic
    cross-replica near-dup structure and invalidate the scaling read:

    * documents: every alphanumeric token gets the replica id appended
      (replica 0 verbatim). Token/shingle/k-gram/span identity collapses
      across replicas while the intra-replica structure the near-dup
      queries derive downstream is preserved exactly.
    * embeddings: per-(replica, dim) deterministic sign flips (replica 0
      verbatim). An isometry — intra-replica cosine geometry is EXACT —
      while cross-replica cosines drop to ~N(0, 1/sqrt(d)): no manufactured
      near-duplicates. (The epsilon-shift used for the full build keeps
      cosine ~1 between copies of the same vector, which is quadratic in
      replica count.)
    """
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW reps AS SELECT unnest(range({n})) AS i")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    s_d = con.sql(f"SELECT max(doc_id) + 1 FROM {t('documents')}").fetchone()[0]
    s_v = con.sql(f"SELECT max(vec_id) + 1 FROM {t('embeddings')}").fetchone()[0]

    def emit(name: str, select: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.sql(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {rows} rows")

    emit("documents", f"""
        SELECT doc_id + i * {s_d} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                        '\\1' || i::VARCHAR, 'g')
               END AS text,
               lang, source, n_chars
        FROM {t('documents')} CROSS JOIN reps""")
    emit("embeddings", f"""
        SELECT vec_id + i * {s_v} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE CAST(list_transform(embedding, (x, j) ->
                         x * (CASE WHEN hash(i::VARCHAR || ':' || j::VARCHAR)
                                        % 2 = 0
                              THEN 1.0 ELSE -1.0 END)) AS FLOAT[])
               END AS embedding,
               label
        FROM {t('embeddings')} CROSS JOIN reps""")


def build_synth(n_docs: int, n_vecs: int, dst: str, seed: int = 16) -> None:
    """Distinct-content corpus decade (VERDICT r15 #1): the replicated
    builds above preserve intra-replica structure but collapse under
    exact dedup (.scale/sf10 holds 500k docs with only 39,936 distinct
    texts), so the post-dedup chain stages and the blocked-recall sf10
    row measured a near-sf1 corpus.  This synthesizes EVERY row from a
    seeded hash — same schema, same vocabulary, same length/lang/source
    distributions as the driver corpus — with a controlled dup funnel:

    * documents: word streams drawn uniformly from the driver's 31-word
      vocabulary (the driver corpus is uniform-vocab), 8-96 words
      (avg ≈ 290 chars, matching sf0.1's 297).  Roles by ``doc_id % 20``:
      ``19`` = EXACT duplicate of doc_id-1 (5% — the exact-dedup stage's
      real work), ``9`` = NEAR duplicate of doc_id-1 (5% — shared prefix,
      fresh tail, shingle-Jaccard ≈ 0.8), everything else globally
      distinct (the word stream is salted with doc_id, so two ids collide
      only if 50+ independent 64-bit hashes collide).
    * embeddings: ``max(8, n_vecs/250)`` latent clusters; vector =
      cluster center (components U[-0.35, 0.35], matching the driver's
      observed range) + per-vector noise (U[-0.08, 0.08]) — same-cluster
      cosine ≈ 0.95, cross-cluster ≈ 0, so k-means at the SemDeDup-
      realistic k = N/100 SUBDIVIDES real clusters and the blocked-recall
      measurement shows the k-granularity curve instead of replicated-
      vector saturation.  ``vec_id % 20 == 9`` vectors are the planted
      semantic near-dups: vec(v-1) + U[-0.002, 0.002] per component
      (cosine ≈ 0.9999 > every production threshold).  vec_id v is the
      embedding of doc_id v (docs beyond n_vecs carry no embedding and
      pass through the semantic stages, the semantic_dedup convention).

    Deterministic in (n_docs, n_vecs, seed); no RNG state, only hashes.
    """
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    vocab = (
        "a agg batch big column customer data dup fast filter group hash "
        "join key line merge order part query row scan slow small sort "
        "spark stream table the value vector window"
    ).split()
    vlist = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    con.sql(f"SET threads TO {max(os.cpu_count() or 8, 8)}")
    # word stream for id x with salt s: nw in 8..96, uniform vocab draw
    con.sql(f"""
        CREATE MACRO nw(x) AS
          8 + (hash(x::VARCHAR || ':nw:{seed}') % 89)::INT;
        CREATE MACRO wstream(x, s, n) AS
          list_transform(range(1, n + 1),
            j -> ({vlist})[1 + (hash(x::VARCHAR || ':' || j::VARCHAR
                                 || ':' || s || ':{seed}') % 31)::INT]);
    """)
    docs_sql = f"""
      WITH ids AS (SELECT unnest(range({n_docs})) AS did),
      base AS (
        SELECT did,
          CASE
            WHEN did % 20 = 19 THEN
              array_to_string(wstream(did - 1, 'w', nw(did - 1)), ' ')
            WHEN did % 20 = 9 THEN
              array_to_string(
                wstream(did - 1, 'w',
                        nw(did - 1) - 3 - (hash(did::VARCHAR
                                           || ':cut:{seed}') % 5)::INT)
                || wstream(did, 'nd', 3 + (hash(did::VARCHAR
                                           || ':cut:{seed}') % 5)::INT),
                ' ')
            ELSE array_to_string(wstream(did, 'w', nw(did)), ' ')
          END AS text
        FROM ids)
      SELECT did AS doc_id, text,
        CASE WHEN hash(did::VARCHAR || ':lg:{seed}') % 100 < 42 THEN 'en'
             WHEN hash(did::VARCHAR || ':lg:{seed}') % 100 < 57 THEN 'zh'
             WHEN hash(did::VARCHAR || ':lg:{seed}') % 100 < 72 THEN 'es'
             WHEN hash(did::VARCHAR || ':lg:{seed}') % 100 < 86 THEN 'fr'
             ELSE 'de' END AS lang,
        'src' || (hash(did::VARCHAR || ':sr:{seed}') % 20)::VARCHAR AS source,
        strlen(text)::BIGINT AS n_chars
      FROM base
    """
    con.sql(f"COPY ({docs_sql}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    nd = con.sql(
        f"SELECT count(*), count(DISTINCT text) "
        f"FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()
    print(f"documents: {nd[0]} rows, {nd[1]} distinct texts")

    n_clusters = max(8, n_vecs // 250)
    # center: U[-0.35, 0.35]; noise: U[-0.08, 0.08]; near-dup jitter:
    # U[-0.002, 0.002] on the PARENT's realized vector
    con.sql(f"""
        CREATE MACRO centc(c, d) AS
          (hash('c:' || c::VARCHAR || ':' || d::VARCHAR || ':{seed}')
           % 700001)::DOUBLE / 1e6 - 0.35;
        CREATE MACRO noisec(v, d) AS
          (hash('n:' || v::VARCHAR || ':' || d::VARCHAR || ':{seed}')
           % 160001)::DOUBLE / 1e6 - 0.08;
        CREATE MACRO jitc(v, d) AS
          (hash('j:' || v::VARCHAR || ':' || d::VARCHAR || ':{seed}')
           % 4001)::DOUBLE / 1e6 - 0.002;
        CREATE MACRO basevec(v) AS
          list_transform(range(0, 64),
            d -> centc(hash(v::VARCHAR || ':cl:{seed}') % {n_clusters}, d)
                 + noisec(v, d));
    """)
    emb_sql = f"""
      WITH ids AS (SELECT unnest(range({n_vecs})) AS vid)
      SELECT vid AS vec_id,
        CAST(CASE WHEN vid % 20 = 9 THEN
               list_transform(basevec(vid - 1), (x, i) -> x + jitc(vid, i))
             ELSE basevec(vid) END AS FLOAT[]) AS embedding,
        ((hash((CASE WHEN vid % 20 = 9 THEN vid - 1 ELSE vid END)::VARCHAR
               || ':cl:{seed}') % {n_clusters}) % 10)::INT AS label
      FROM ids
    """
    con.sql(f"COPY ({emb_sql}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    ne = con.sql(
        f"SELECT count(*), count(DISTINCT embedding::VARCHAR) "
        f"FROM read_parquet('{dst}/embeddings.parquet')"
    ).fetchone()
    print(f"embeddings: {ne[0]} rows, {ne[1]} distinct, "
          f"{n_clusters} latent clusters")


def build_relational(n: int, src: str, dst: str, corpus_dir: str | None) -> None:
    """The relational/metrics decade (VERDICT r7 #3): TPC-H tables + events
    ONLY, scaled n x from *src* with the same consistently-shifted-key
    transforms as the full build (join degrees and group cardinalities grow
    linearly; events keep the SAME time range at 10x density — how an
    observability workload actually grows). documents/embeddings are
    symlinked from *corpus_dir* (the collision-free ``corpus`` build) so one
    directory serves the whole 16-query bench set without rebuilding — or
    duplicating — the 500k-doc corpus tier."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW reps AS SELECT unnest(range({n})) AS i")

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def stride(name: str, key: str) -> int:
        return con.sql(f"SELECT max({key}) + 1 FROM {t(name)}").fetchone()[0]

    s_c = stride("customer", "c_custkey")
    s_s = stride("supplier", "s_suppkey")
    s_p = stride("part", "p_partkey")
    s_o = stride("orders", "o_orderkey")
    s_e = stride("events", "event_id")
    s_u = stride("events", "user_id")

    def emit(name: str, select: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.sql(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        rows = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {rows} rows")

    for dim in ("region", "nation"):
        emit(dim, f"SELECT * FROM {t(dim)}")
    emit("customer", f"""
        SELECT c_custkey + reps.i * {s_c} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')} CROSS JOIN reps""")
    emit("supplier", f"""
        SELECT s_suppkey + reps.i * {s_s} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {t('supplier')} CROSS JOIN reps""")
    emit("part", f"""
        SELECT p_partkey + reps.i * {s_p} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')} CROSS JOIN reps""")
    emit("orders", f"""
        SELECT o_orderkey + reps.i * {s_o} AS o_orderkey,
               o_custkey + reps.i * {s_c} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')} CROSS JOIN reps""")
    emit("lineitem", f"""
        SELECT l_orderkey + reps.i * {s_o} AS l_orderkey,
               l_partkey + reps.i * {s_p} AS l_partkey,
               l_suppkey + reps.i * {s_s} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')} CROSS JOIN reps""")
    emit("events", f"""
        SELECT event_id + reps.i * {s_e} AS event_id, ts,
               user_id + reps.i * {s_u} AS user_id, event_type, value, props
        FROM {t('events')} CROSS JOIN reps""")
    if corpus_dir:
        for name in ("documents", "embeddings"):
            link = f"{dst}/{name}.parquet"
            target = os.path.abspath(f"{corpus_dir}/{name}.parquet")
            if not os.path.exists(link) and os.path.exists(target):
                os.symlink(target, link)
                print(f"{name}: symlink -> {target}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "relational":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        src = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
        dst = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/.scale/rel/sf10"
        corpus = sys.argv[5] if len(sys.argv) > 5 else "/root/repo/.scale/sf10"
        build_relational(n, src, dst, corpus)
    elif len(sys.argv) > 1 and sys.argv[1] == "synth":
        n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
        n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        dst = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/.scale/synth_sf1"
        build_synth(n_docs, n_vecs, dst)
    elif len(sys.argv) > 1 and sys.argv[1] == "corpus":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        src = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
        dst = sys.argv[4] if len(sys.argv) > 4 else "/root/repo/.scale/sf10"
        build_corpus(n, src, dst)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
        src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        dst = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale/sf1"
        build(n, src, dst)

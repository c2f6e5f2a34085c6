"""Training-data analysis operator tests over the sf0.001 testdata tables
plus synthetic near-duplicate fixtures for the dedup family."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_dedup_exact_matches_duckdb(ray_session):
    import duckdb

    from tokenzip.analysis import q_dedup_exact

    got = q_dedup_exact(SF).reset_index(drop=True)
    exp = duckdb.sql(
        f"""
        WITH h AS (SELECT doc_id, source, md5(text) AS h
                   FROM read_parquet('{SF}/documents.parquet')),
        k AS (SELECT h, MIN(doc_id) AS kept FROM h GROUP BY h)
        SELECT d.source AS source,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM h d2 WHERE d2.source = d.source) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(d.doc_id) AS BIGINT) AS sum_kept_ids
        FROM h d JOIN k ON d.doc_id = k.kept
        GROUP BY d.source ORDER BY source
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_embedding_topk_matches_duckdb(ray_session):
    import duckdb

    from tokenzip.analysis import q_embedding_topk

    got = q_embedding_topk(SF)
    exp = duckdb.sql(
        f"""
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                   FROM read_parquet('{SF}/embeddings.parquet')
                   WHERE vec_id = (SELECT MIN(vec_id) FROM read_parquet('{SF}/embeddings.parquet'))),
        scored AS (SELECT vec_id,
                          list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                                 (SELECT qv FROM q)) AS cos
                   FROM read_parquet('{SF}/embeddings.parquet'))
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank,
               CAST(vec_id AS BIGINT) AS vec_id
        FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_text_quality_matches_duckdb(ray_session):
    import duckdb

    from tokenzip.analysis import q_text_quality_by_lang

    got = q_text_quality_by_lang(SF).to_pandas()
    exp = duckdb.sql(
        f"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_words,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                            w -> w IN ('the','a','and','of','to')))) AS BIGINT) AS sum_stopwords
        FROM read_parquet('{SF}/documents.parquet') GROUP BY lang ORDER BY lang
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )


def _ddb_on_docs(sql: str, doc_path: str):
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{doc_path}')"
    )
    return con.sql(sql).df()


def test_minhash_planted_near_dups_match_sql_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_minhash
    from tokenzip.oracles import minhash_sql

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab, 120))
    near = base.replace("w5", "w6", 1)  # tiny edit -> high jaccard
    other = [" ".join(rng.choice(vocab, 120)) for _ in range(40)]
    texts = [base, near] + other + [base] * 40
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dedup_minhash(str(tmp_path)).reset_index(drop=True)
    # exact copies of `base` (+ the near-dup pair) must all be found
    assert int(got["n_dup_pairs"].iloc[0]) >= (41 * 40) // 2
    exp = _ddb_on_docs(minhash_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_simhash_copies_match_sql_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_simhash
    from tokenzip.oracles import simhash_sql

    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab, 80)) for _ in range(30)]
    texts += [texts[0], texts[1]]  # two exact copies
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dedup_simhash(str(tmp_path)).reset_index(drop=True)
    assert int(got["n_dup_pairs"].iloc[0]) >= 2
    exp = _ddb_on_docs(simhash_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fingerprint_and_langid(ray_session):
    from tokenzip.analysis import (
        _LANG_MARKERS,
        q_fingerprint_by_source,
        q_lang_id_confusion,
    )

    fp = q_fingerprint_by_source(SF)
    assert (fp["n_distinct"] <= fp["n_docs"]).all()
    assert fp["n_docs"].sum() == 500

    conf = q_lang_id_confusion(SF)
    assert conf["n_docs"].sum() == 500
    assert set(conf["pred_lang"]).issubset(set(_LANG_MARKERS))


def test_langid_matches_sql_oracle(ray_session):
    from tokenzip.analysis import q_lang_id_confusion
    from tokenzip.oracles import lang_id_sql

    got = q_lang_id_confusion(SF).reset_index(drop=True)
    exp = _ddb_on_docs(lang_id_sql(), f"{SF}/documents.parquet")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_minhash_viral_cluster_interleaved_ids(ray_session, tmp_path):
    """Viral-duplicate cluster with ids INTERLEAVED among other docs plus a
    cross-cluster near-dup — exercises the closed-form cluster-collapse
    paths (intra, cross, rank-counted checksum) against the SQL oracle."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_minhash
    from tokenzip.oracles import minhash_sql

    rng = np.random.default_rng(8)
    vocab = [f"w{i}" for i in range(150)]
    base = " ".join(rng.choice(vocab, 100))
    near = base.replace("w3", "w4", 1)
    texts, srcs = [], []
    for i in range(120):
        if i % 3 == 0:
            texts.append(base)        # 40-clone cluster, ids 0,3,6,...
        elif i % 3 == 1:
            texts.append(near)        # 40-clone near-dup cluster, ids 1,4,...
        else:
            texts.append(" ".join(rng.choice(vocab, 100)))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dedup_minhash(str(tmp_path)).reset_index(drop=True)
    # two 40-clone clusters: >= 2*C(40,2) intra pairs + 1600 cross pairs
    assert int(got["n_dup_pairs"].iloc[0]) >= 2 * (40 * 39 // 2)
    exp = _ddb_on_docs(minhash_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_pair_checksums_match_hugeint_at_large_ids():
    """Pair/cluster checksums must match the oracle's HUGEINT per-term
    modular sums even for doc_id > 2^53 (int64 products would wrap without
    the per-term mod folds)."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD, _cross_pair_chk, _intra_pair_chk

    def brute_cross(A, B):
        return sum(
            (min(a, b) * _PAIR_K + max(a, b)) % _PAIR_MOD for a in A for b in B
        ) % _PAIR_MOD

    def brute_intra(ids):
        ids = sorted(ids)
        return sum(
            (ids[i] * _PAIR_K + ids[j]) % _PAIR_MOD
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
        ) % _PAIR_MOD

    rng = np.random.default_rng(0)
    for scale in (10_000, 2**40, 2**62):
        pool = np.unique(rng.integers(0, scale, 200).astype(np.int64))
        A, B = np.sort(pool[:40]), np.sort(pool[40:70])  # unique ids => disjoint
        assert _cross_pair_chk(A, B) == brute_cross(A.tolist(), B.tolist())
        assert _intra_pair_chk(A) == brute_intra(A.tolist())


def test_simhash_viral_cluster_and_near_misses(ray_session, tmp_path):
    """Viral corpus: a 50-clone cluster (identical simhash), a near-dup text
    variant, and unrelated docs — exercises the collapsed intra/cross
    closed-form paths and the two-level bucket recall against the
    brute-force SQL oracle."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_simhash, simhash60
    from tokenzip.oracles import simhash_sql

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(300)]
    base = " ".join(rng.choice(vocab, 80))
    near = base.replace("tok", "toq", 2)  # small perturbation
    texts = []
    for i in range(150):
        if i % 3 == 0:
            texts.append(base)            # 50-clone viral cluster
        elif i % 15 == 1:
            texts.append(near)            # possible near-dup cluster
        else:
            texts.append(" ".join(rng.choice(vocab, 80)))
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dedup_simhash(str(tmp_path)).reset_index(drop=True)
    # the 50-clone cluster alone contributes C(50,2) intra pairs
    assert int(got["n_dup_pairs"].iloc[0]) >= 50 * 49 // 2
    # collapse sanity: identical texts share one simhash
    assert simhash60(base) == simhash60(base)
    exp = _ddb_on_docs(simhash_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dedup_embedding_planted_near_dups(ray_session, tmp_path):
    """Planted embedding near-dups: clusters of nearly-identical vectors
    (cos ~ 0.999) plus orthogonal-ish noise vectors. The Ray all-pairs
    result must match the DuckDB self-join oracle exactly (integer count
    + modular pair checksum)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_embedding

    rng = np.random.default_rng(11)
    dim = 16
    vecs, ids = [], []
    vid = 0
    for c in range(3):  # 3 clusters of 4 near-identical vectors
        base = rng.normal(size=dim)
        for _ in range(4):
            vecs.append(base + rng.normal(scale=0.01, size=dim))
            ids.append(vid)
            vid += 1
    for _ in range(30):  # noise
        vecs.append(rng.normal(size=dim))
        ids.append(vid)
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    p = str(tmp_path / "embeddings.parquet")
    pq.write_table(t, p)

    from tokenzip.oracles import embedding_dedup_sql

    got = q_dedup_embedding(str(tmp_path), tau=(2, 5)).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    # same builder the harness registers in __ray_entry__.oracle_sql()
    exp = con.sql(embedding_dedup_sql()).df()
    # each 4-clone cluster contributes C(4,2)=6 pairs at cos ~ 0.999
    assert int(got["n_dup_pairs"].iloc[0]) >= 18
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_jaccard_exact_agrees_with_minhash_and_oracle(ray_session, tmp_path):
    """The exact inverted-index Jaccard and the LSH minhash pipeline must
    produce the identical row (and match the shared SQL oracle) on a
    planted near-dup corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_jaccard, q_dedup_minhash
    from tokenzip.oracles import minhash_sql

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(40):
        if i % 7 == 0:
            rows.append((i, base))  # clones (J = 1)
        elif i % 7 == 1:
            rows.append((i, base + " extra"))  # near-dup
        else:
            rows.append((i, f"unique document number {i} with words {i * 3}"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(t, d)

    ja = q_dedup_jaccard(str(tmp_path)).reset_index(drop=True)
    mh = q_dedup_minhash(str(tmp_path)).reset_index(drop=True)
    exp = _ddb_on_docs(minhash_sql(), d)
    assert int(ja["n_dup_pairs"].iloc[0]) > 0
    pd.testing.assert_frame_equal(ja, exp, check_dtype=False)
    pd.testing.assert_frame_equal(mh, exp, check_dtype=False)


def test_dedup_embedding_ivf_planted(ray_session, tmp_path):
    """IVF-bucketed near-dup on planted clusters: near-identical vectors
    land in the same coarse bucket, so the scale path must find EVERY
    planted pair (recall 10000 here), count each exactly once despite
    multi-assignment (found <= exact always), and the checksum must be the
    exact query's checksum when recall is total."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_dedup_embedding, q_dedup_embedding_ivf

    rng = np.random.default_rng(0)
    dim = 64  # high enough that random noise pairs stay below tau=0.4
    vecs, ids = [], []
    vid = 0
    for c in range(4):  # 4 tight clusters of 5
        base = rng.normal(size=dim) * 3
        for _ in range(5):
            vecs.append(base + rng.normal(scale=0.01, size=dim))
            ids.append(vid)
            vid += 1
    for _ in range(40):
        vecs.append(rng.normal(size=dim))
        ids.append(vid)
        vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [np.asarray(v, np.float32).tolist() for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(ids), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    exact = q_dedup_embedding(str(tmp_path), tau=(2, 5))
    got = q_dedup_embedding_ivf(
        str(tmp_path), tau=(2, 5), n_clusters=4, n_assign=2
    ).reset_index(drop=True)
    assert int(got["n_vecs"].iloc[0]) == len(ids)  # primary rows count once
    n_exact = int(exact["n_dup_pairs"].iloc[0])
    assert n_exact == 40  # exactly the planted C(5,2) x 4 pairs
    assert int(got["n_dup_exact"].iloc[0]) == n_exact
    found = int(got["n_dup_found"].iloc[0])
    assert found <= n_exact  # primary-ownership rule: no double counting
    # tight planted clusters co-locate: full recall, identical checksum
    assert found == n_exact
    assert int(got["recall_pct_x100"].iloc[0]) == 10000
    assert int(got["pair_checksum_found"].iloc[0]) == int(
        exact["pair_checksum"].iloc[0]
    )
    # deterministic under re-run (retry-safety)
    again = q_dedup_embedding_ivf(
        str(tmp_path), tau=(2, 5), n_clusters=4, n_assign=2
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)


def test_repetition_planted_and_oracle(ray_session, tmp_path):
    """Hand-checked duplicate-word fractions: 'a a a b' is 2/4 duplicated
    (repetitive at the 30% bar), 'a b c d' is 0/4, 'a a b c d e f g h j'
    is 1/10 (below the bar); the SQL oracle agrees on the same file."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import q_repetition_by_source, repetition_sql

    texts = ["a a a b", "a b c d", "a a b c d e f g h j"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s1", "s1", "s2"]),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_repetition_by_source(str(tmp_path)).reset_index(drop=True)
    assert got.values.tolist() == [
        ["s1", 2, 8, 6, 1],   # 4+4 words, 2+4 distinct, one repetitive
        ["s2", 1, 10, 9, 0],
    ]
    exp = _ddb_on_docs(repetition_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_repetition_matches_oracle_on_testdata(ray_session):
    from tokenzip.analysis import q_repetition_by_source, repetition_sql

    got = q_repetition_by_source(SF).reset_index(drop=True)
    exp = _ddb_on_docs(repetition_sql(), f"{SF}/documents.parquet")
    assert int(got["n_docs"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cross_source_dups_planted(ray_session, tmp_path):
    """Planted cross-source duplicates: s1/s2 share one bag (word order and
    multiplicity must NOT matter), s3's internal duplicate must not count."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import cross_source_dups_sql, q_cross_source_dups

    texts = [
        "x y z",        # s1 — shared bag with doc 1/2 (reordered / repeated)
        "z y x",        # s2 — same bag, different order
        "x x y z",      # s2 — same bag via multiplicity
        "only here",    # s3 — unique
        "only here",    # s3 — duplicate WITHIN one source only: excluded
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s1", "s2", "s2", "s3", "s3"]),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_cross_source_dups(str(tmp_path)).reset_index(drop=True)
    assert got.values.tolist() == [
        ["s1", 1, 1],
        ["s2", 2, 1],
    ]
    exp = _ddb_on_docs(cross_source_dups_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cross_source_dups_matches_oracle_on_testdata(ray_session):
    from tokenzip.analysis import cross_source_dups_sql, q_cross_source_dups

    got = q_cross_source_dups(SF).reset_index(drop=True)
    exp = _ddb_on_docs(cross_source_dups_sql(), f"{SF}/documents.parquet")
    assert int(got["n_shared_docs"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dup_clusters_matches_recursive_oracle(ray_session):
    from tokenzip.analysis import dup_clusters_sql, q_dup_clusters

    got = q_dup_clusters(SF).reset_index(drop=True)
    exp = _ddb_on_docs(dup_clusters_sql(), f"{SF}/documents.parquet")
    assert int(got["n_clusters"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dup_clusters_planted_chain(ray_session, tmp_path):
    """Transitivity: A~B and B~C but A!~C must still land in ONE cluster of
    size 3 (pairwise dedup alone would under-merge) — plus an isolated
    near-dup pair and a singleton that must not appear."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import dup_clusters_sql, q_dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    # A and C share little; both overlap B heavily (chain via B)
    texts = [
        " ".join(words[:8]),                     # A: w0..w7
        " ".join(words[1:9]),                    # B: w1..w8 (near A and C)
        " ".join(words[2:10]),                   # C: w2..w9
        "totally different text one",            # D
        "totally different text one",            # E: exact dup of D
        "lonely document about nothing at all",  # F singleton
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dup_clusters(str(tmp_path)).reset_index(drop=True)
    exp = _ddb_on_docs(dup_clusters_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    by_size = dict(zip(got["cluster_size"], got["n_clusters"]))
    assert by_size.get(3) == 1 and by_size.get(2) == 1  # chain + exact pair


def test_dedup_keep_stats_matches_oracle(ray_session):
    from tokenzip.analysis import dedup_keep_stats_sql, q_dedup_keep_stats

    got = q_dedup_keep_stats(SF).reset_index(drop=True)
    exp = _ddb_on_docs(dedup_keep_stats_sql(), f"{SF}/documents.parquet")
    # accounting identity + dedup actually removed something
    assert (got["n_kept"] + got["n_removed"]).equals(got["n_docs"])
    assert int(got["n_removed"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dedup_keep_stats_no_dups(ray_session, tmp_path):
    """A corpus with zero near-dup pairs keeps everything."""
    import pyarrow.parquet as pq

    from tokenzip.analysis import dedup_keep_stats_sql, q_dedup_keep_stats

    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s1", "s2", "s2"]),
        }
    )
    d = str(tmp_path / "documents.parquet")
    pq.write_table(docs, d)
    got = q_dedup_keep_stats(str(tmp_path)).reset_index(drop=True)
    assert got.values.tolist() == [["s1", 1, 0, 1], ["s2", 2, 0, 2]]
    exp = _ddb_on_docs(dedup_keep_stats_sql(), d)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_kmeans_sizes_matches_pin_and_audits(ray_session):
    """The census reproduces the pinned rows at the oracle scale; the pin's
    gate (exact COUNT(*)) closes on any OTHER corpus, so a stale pin can
    only go red."""
    import duckdb

    from tokenzip.analysis import (
        KMEANS_SIZES_PIN,
        embedding_kmeans_sizes_sql,
        q_embedding_kmeans_sizes,
    )

    d = "/root/testdata/sf0.01"
    got = q_embedding_kmeans_sizes(d).reset_index(drop=True)
    assert [tuple(r) for r in got.values.tolist()] == KMEANS_SIZES_PIN
    assert int(got["n_vectors"].sum()) == sum(n for _, n, _ in KMEANS_SIZES_PIN)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    exp = con.sql(embedding_kmeans_sizes_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # a different-scale corpus must EMPTY the oracle (gate), never match
    con2 = duckdb.connect()
    con2.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    assert len(con2.sql(embedding_kmeans_sizes_sql()).df()) == 0


def test_marker_counts_by_lang_matches_oracle(ray_session):
    import duckdb

    from tokenzip.analysis import marker_counts_by_lang_sql, q_marker_counts_by_lang

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = q_marker_counts_by_lang(SF).reset_index(drop=True)
    exp = con.sql(marker_counts_by_lang_sql()).df()
    # every containing doc contributes >= 1 occurrence
    assert (got["n_docs"] <= got["n_occurrences"]).all()
    assert int(got["n_occurrences"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_corpus_diff_matches_full_outer_oracle(ray_session):
    import duckdb

    from tokenzip.analysis import corpus_diff_stats_sql, q_corpus_diff_stats
    from tokenzip.corpus import ensure_corpus

    sf = "sf0.001"
    glob = ensure_corpus(sf) + "/*.parquet"
    got = q_corpus_diff_stats(sf).reset_index(drop=True)
    exp = duckdb.sql(corpus_diff_stats_sql(glob)).df()
    # every class present at this scale, accounting sums to |A| + added
    assert int(got["n_removed"].sum()) > 0
    assert int(got["n_changed"].sum()) > 0
    assert int(got["n_added"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_corpus_diff_classes_planted(ray_session, tmp_path):
    """Planted 4-doc corpus: one of each class (n_tok 7k+1 changed,
    7k+3 removed, 7k+5 added-source, else same)."""
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    tbl = pa_.table(
        {
            "doc_id": pa_.array(["a", "b", "c", "d"]),
            "tokens": pa_.array(
                [[5, 6, 7, 8, 9, 10, 11, 12],      # n_tok=8 -> changed
                 [1, 2, 3],                          # n_tok=3 -> removed
                 [9, 9, 9, 9, 9],                    # n_tok=5 -> +added twin
                 [4, 4]],                            # n_tok=2 -> same
                pa_.list_(pa_.int32()),
            ),
            "n_tok": pa_.array([8, 3, 5, 2], pa_.int32()),
            "source": pa_.array(["x", "x", "y", "y"]),
        }
    )
    pq_.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.analysis import q_corpus_diff_stats

    got = q_corpus_diff_stats(str(tmp_path))
    # x: a changed, b removed; y: c same + its added twin, d same
    assert got.values.tolist() == [
        ["x", 0, 1, 1, 0],
        ["y", 2, 0, 0, 1],
    ]


def test_curation_funnel_matches_oracle(ray_session):
    import duckdb

    from tokenzip.analysis import curation_funnel_sql, q_curation_funnel

    got = q_curation_funnel(SF)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    odf = con.sql(curation_funnel_sql()).df()
    # monotone funnel: every stage only removes
    assert (got["n_quality"] <= got["n_raw"]).all()
    assert (got["n_dedup"] <= got["n_quality"]).all()
    assert (got["n_final"] <= got["n_dedup"]).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_curation_funnel_viral_fingerprint_combines(ray_session, tmp_path):
    """A fingerprint duplicated across many docs collapses to ONE partial
    row per (batch, source) — and the funnel still keeps exactly the
    min-id doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokenzip.analysis import _FunnelSurvivorStage, q_curation_funnel

    text = " ".join(f"w{i}" for i in range(80)) + " "  # all-distinct words
    n = 400
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([text.strip()] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["src2"] * n),
            "n_chars": pa.array([len(text.strip())] * n, pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    # combiner claim: one partial row for 400 identical docs
    part = _FunnelSurvivorStage(16)(tbl)
    assert part.num_rows == 1
    assert part["n"][0].as_py() == 400
    assert part["min_doc"][0].as_py() == 0
    got = q_curation_funnel(str(tmp_path)).iloc[0]
    assert got["n_raw"] == 400
    assert got["n_dedup"] == 1  # keep-min collapses the viral clone

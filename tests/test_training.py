"""Training-set preparation operators (tokenzip.training): sequence
packing (stats + full emit), vocabulary top-k, deterministic train/val
split — each checked against a straightforward local NumPy/DuckDB
reference on the sf0.001 corpus plus planted edge-case tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "sf0.001"
L = 2048


def _local_pack_reference(tbl: pa.Table, seq_len: int) -> pd.DataFrame:
    """Single-process packing geometry: the semantics in ~15 lines."""
    df = tbl.select(["doc_id", "n_tok", "source"]).to_pandas()
    df = df.sort_values(["source", "doc_id"]).reset_index(drop=True)
    out = []
    for source, g in df.groupby("source", sort=True):
        ntok = g["n_tok"].to_numpy().astype(np.int64)
        off = np.concatenate([[0], np.cumsum(ntok)[:-1]])
        total = int(ntok.sum())
        boundary = (ntok > 0) & (off // seq_len != (off + ntok - 1) // seq_len)
        from tokenzip.analysis import _PAIR_K, _PAIR_MOD

        term = ((off % _PAIR_MOD) * _PAIR_K + ntok % _PAIR_MOD) % _PAIR_MOD
        out.append(
            {
                "source": source,
                "n_docs": len(g),
                "total_tokens": total,
                "n_sequences": total // seq_len,
                "n_boundary_docs": int(boundary.sum()),
                "pack_checksum": int(term.sum() % _PAIR_MOD),
            }
        )
    return pd.DataFrame(out)


def test_pack_stats_matches_local_reference(ray_session):
    from tokenzip.corpus import corpus_paths
    from tokenzip.training import q_pack_stats_by_source

    paths = corpus_paths(SF)
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    expect = _local_pack_reference(tbl, L)
    got = q_pack_stats_by_source(SF, seq_len=L)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expect.astype(got.dtypes.to_dict())
    )


def test_pack_stats_matches_duckdb_window_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import pack_stats_sql, q_pack_stats_by_source

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_pack_stats_by_source(SF, seq_len=L)
    odf = duckdb.sql(pack_stats_sql(glob, L)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_pack_sequences_emit_exact_stream(ray_session, tmp_path):
    """The emitted sequences ARE the concatenated per-source streams: every
    sequence exactly seq_len long, count == total // seq_len, and the
    re-concatenated stream equals the locally-built one token for token."""
    from tokenzip.corpus import corpus_paths
    from tokenzip.training import pack_sequences

    seq_len = 256  # small L so sf0.001 yields many sequences
    paths = corpus_paths(SF)
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    df = tbl.to_pandas().sort_values(["source", "doc_id"])
    streams = {
        s: np.concatenate(
            [np.asarray(t, np.int32) for t in g["tokens"]]
            + [np.empty(0, np.int32)]
        )
        for s, g in df.groupby("source", sort=True)
    }

    out = pack_sequences(SF, seq_len=seq_len).to_pandas()
    assert (out.groupby("source")["seq_id"].nunique()
            == out.groupby("source").size()).all()  # one row per seq
    for s, g in out.groupby("source", sort=True):
        g = g.sort_values("seq_id")
        assert list(g["seq_id"]) == list(range(len(g)))
        assert len(g) == len(streams[s]) // seq_len
        got = np.concatenate([np.asarray(t, np.int32) for t in g["tokens"]])
        assert np.array_equal(got, streams[s][: len(g) * seq_len])


def test_pack_stats_planted_edges(ray_session, tmp_path, monkeypatch):
    """Planted table: empty docs, a doc exactly filling a sequence, a doc
    spanning 3 boundaries — geometry checked by hand."""
    import tokenzip.training as tr

    rows = [
        ("doc-0", 10, "a"),       # off 0
        ("doc-1", 0, "a"),        # empty: no boundary, no offset change
        ("doc-2", 6, "a"),        # off 10, crosses 16-boundary (L=16)
        ("doc-3", 16, "a"),       # off 16: exactly fills seq 1
        ("doc-4", 40, "a"),       # off 32: spans seqs 2,3,4 exactly->no, 32..71
        ("doc-5", 5, "b"),        # other source
    ]
    tok = lambda n: np.arange(n, dtype=np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([tok(r[1]) for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([r[1] for r in rows], pa.int32()),
            "source": pa.array([r[2] for r in rows]),
        }
    )
    p = tmp_path / "tokens"
    p.mkdir()
    pq.write_table(tbl, p / "part-0000.parquet")
    monkeypatch.setattr(tr, "corpus_paths", lambda sf: [str(p / "part-0000.parquet")])

    got = tr.q_pack_stats_by_source("planted", seq_len=16).set_index("source")
    assert got.loc["a", "n_docs"] == 5
    assert got.loc["a", "total_tokens"] == 72
    assert got.loc["a", "n_sequences"] == 4
    # boundary docs: doc-2 (10..15 vs boundary at 16? 10+6-1=15 -> no!),
    # recompute: doc-2 occupies [10,16) -> last index 15, seq 0 -> NOT boundary;
    # doc-3 [16,32) -> seq 1 exactly -> not boundary; doc-4 [32,72) -> seqs 2..4 -> boundary
    assert got.loc["a", "n_boundary_docs"] == 1
    assert got.loc["b", "n_sequences"] == 0
    # cross-check the whole frame against the local reference
    expect = _local_pack_reference(tbl, 16).set_index("source")
    pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))


def test_pack_emit_checksum_matches_duckdb(ray_session):
    """End-to-end emit differential: every emitted sequence's (id, content)
    checksum equals the oracle's window-arithmetic recomputation."""
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import pack_emit_sql, q_pack_emit_by_source

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_pack_emit_by_source(SF, seq_len=512)
    odf = duckdb.sql(pack_emit_sql(glob, 512)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_pack_emit_doc_id_reused_across_sources(ray_session, tmp_path, monkeypatch):
    """Regression: the offset sidecar is keyed by (source, doc_id) — a
    corpus reusing the same doc_id in two sources must pack both docs at
    their own per-source offsets."""
    import tokenzip.training as tr

    tok = lambda lo, n: np.arange(lo, lo + n, dtype=np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array(["d1", "d1", "d2"]),
            "tokens": pa.array(
                [tok(0, 10), tok(100, 6), tok(200, 6)], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([10, 6, 6], pa.int32()),
            "source": pa.array(["a", "b", "b"]),
        }
    )
    p = tmp_path / "tokens"
    p.mkdir()
    pq.write_table(tbl, p / "part-0000.parquet")
    monkeypatch.setattr(tr, "_token_paths", lambda sf: [str(p / "part-0000.parquet")])
    out = tr.pack_sequences("planted", seq_len=8).to_pandas()
    got = {
        (r["source"], r["seq_id"]): np.asarray(r["tokens"], np.int32)
        for _, r in out.iterrows()
    }
    assert set(got) == {("a", 0), ("b", 0)}
    assert np.array_equal(got[("a", 0)], np.arange(8, dtype=np.int32))
    # source b stream: d1 tokens 100..105 then d2 tokens 200..205
    assert np.array_equal(
        got[("b", 0)], np.r_[np.arange(100, 106), np.arange(200, 202)].astype(np.int32)
    )


def test_vocab_topk_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_vocab_topk, vocab_topk_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_vocab_topk(SF, k=25)
    odf = duckdb.sql(vocab_topk_sql(glob, 25)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_vocab_topk_bucket_boundary_ties(ray_session, tmp_path, monkeypatch):
    """Tokens tied at the k-th count must resolve by smaller token id, even
    when the tied tokens live in different hash buckets."""
    import tokenzip.training as tr

    # tokens 1000 and 1513 (different buckets mod 512) both appear 3x;
    # token 7 appears 5x; k=2 must pick (7,5),(1000,3)
    toks = [7] * 5 + [1000] * 3 + [1513] * 3
    tbl = pa.table(
        {
            "doc_id": pa.array(["doc-0"]),
            "tokens": pa.array([np.array(toks, np.int32)], pa.list_(pa.int32())),
            "n_tok": pa.array([len(toks)], pa.int32()),
            "source": pa.array(["a"]),
        }
    )
    p = tmp_path / "t.parquet"
    pq.write_table(tbl, p)
    monkeypatch.setattr(tr, "corpus_paths", lambda sf: [str(p)])
    got = tr.q_vocab_topk("planted", k=2)
    assert got["token"].tolist() == [7, 1000]
    assert got["cnt"].tolist() == [5, 3]


def test_vocab_topk_mg_matches_exact(ray_session):
    """Certified-exact MG path returns the identical frame to the exact
    vocab-sized path (same oracle SQL)."""
    from tokenzip.training import q_vocab_topk, q_vocab_topk_mg

    exact = q_vocab_topk(SF, k=25)
    mg = q_vocab_topk_mg(SF, k=25)
    pd.testing.assert_frame_equal(mg, exact)


def test_vocab_topk_mg_small_cap_still_exact_or_raises(ray_session):
    """With a cap far below the vocabulary, MG either certifies (and then
    must be exact) or raises MGCertificationError — never a silent
    approximate answer."""
    from tokenzip.training import (
        MGCertificationError,
        q_vocab_topk,
        q_vocab_topk_mg,
    )

    try:
        mg = q_vocab_topk_mg(SF, k=5, cap=64)
    except MGCertificationError:
        return
    pd.testing.assert_frame_equal(mg, q_vocab_topk(SF, k=5))


def test_vocab_topk_mg_batch_compression_bounds():
    """The per-batch MG stage emits at most cap survivors + 1 delta row,
    and lower bounds never exceed true batch counts."""
    import tokenzip.training as tr

    rng = np.random.default_rng(7)
    toks = rng.zipf(1.3, size=20000).astype(np.int32)
    tbl = pa.table(
        {
            "tokens": pa.array([toks], pa.list_(pa.int32())),
        }
    )
    out = tr._VocabMGPartialStage(cap=32)(tbl)
    kind = out["kind"].to_numpy()
    assert (kind == 0).sum() <= 32
    assert (kind == 1).sum() == 1
    delta = out["cnt"].to_numpy()[kind == 1][0]
    assert delta > 0
    true_uniq, true_cnt = np.unique(toks.astype(np.int64), return_counts=True)
    surv_tok = out["token"].to_numpy()[kind == 0]
    surv_cnt = out["cnt"].to_numpy()[kind == 0]
    truth = dict(zip(true_uniq.tolist(), true_cnt.tolist()))
    for t, c in zip(surv_tok.tolist(), surv_cnt.tolist()):
        assert 0 < c <= truth[t]
        assert truth[t] <= c + delta


def test_bigram_topk_mg_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import bigram_topk_sql, q_bigram_topk_mg

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_bigram_topk_mg(SF, k=15)
    odf = duckdb.sql(bigram_topk_sql(glob, 15)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_bigram_keys_respect_doc_boundaries():
    """Pairs crossing document boundaries must not count as bigrams, and the
    int64 packing must round-trip signed int32 tokens exactly."""
    import tokenzip.training as tr

    tbl = pa.table(
        {
            "tokens": pa.array(
                [
                    np.array([1, 2, 3], np.int32),
                    np.array([-7], np.int32),
                    np.array([5, -7], np.int32),
                ],
                pa.list_(pa.int32()),
            )
        }
    )
    keys = tr._mg_keys_bigrams(tbl)
    t1, t2 = tr._mg_unpack_bigram(keys)
    pairs = sorted(zip(t1.tolist(), t2.tolist()))
    # (3,-7) and (-7,5) cross docs; only (1,2),(2,3),(5,-7) are bigrams
    assert pairs == [(1, 2), (2, 3), (5, -7)]


def test_df_topk_mg_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import df_topk_sql, q_df_topk_mg

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_df_topk_mg(SF, k=15)
    odf = duckdb.sql(df_topk_sql(glob, 15)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_df_keys_dedupe_within_doc_only():
    import tokenzip.training as tr

    tbl = pa.table(
        {
            "tokens": pa.array(
                [
                    np.array([4, 4, 9], np.int32),   # doc A: {4, 9}
                    np.array([4, -1, -1], np.int32),  # doc B: {4, -1}
                ],
                pa.list_(pa.int32()),
            )
        }
    )
    keys = sorted(tr._mg_keys_doc_distinct(tbl).tolist())
    assert keys == [-1, 4, 4, 9]  # 4 appears once per doc


def test_split_stats_deterministic_and_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_split_stats_by_source, split_stats_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    a = q_split_stats_by_source(SF)
    b = q_split_stats_by_source(SF)
    pd.testing.assert_frame_equal(a, b)  # placement-independent
    odf = duckdb.sql(split_stats_sql(glob)).df()
    pd.testing.assert_frame_equal(a, odf.astype(a.dtypes.to_dict()))
    # both splits exist and val is the small one per source
    piv = a.pivot(index="source", columns="split", values="n_docs")
    assert (piv["train"] > piv["val"]).all()


def test_mixture_sample_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import mixture_sample_sql, q_mixture_sample_stats

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_mixture_sample_stats(SF)
    odf = duckdb.sql(mixture_sample_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))
    # weights actually bite: web must sample below its raw count, code ~all
    g = got.set_index("source")
    assert g.loc["web", "n_sampled"] < g.loc["web", "n_docs"]
    assert g.loc["code", "n_sampled"] == g.loc["code", "n_docs"]
    assert g.loc["synth", "n_sampled"] < 0.3 * g.loc["synth", "n_docs"]


def test_sample_bottomk_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import (
        SAMPLE_K,
        q_sample_bottomk_by_source,
        sample_bottomk_sql,
    )

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_sample_bottomk_by_source(SF)
    odf = duckdb.sql(sample_bottomk_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))
    # every source has >= SAMPLE_K docs at this sf, so the sample is full
    assert (got["n_kept"] == SAMPLE_K).all()
    # deterministic under re-run (the salt-hash contract)
    again = q_sample_bottomk_by_source(SF)
    pd.testing.assert_frame_equal(got, again)


def test_decontamination_matches_duckdb(ray_session):
    from tokenzip.training import (
        decontamination_sql,
        q_decontamination_by_source,
    )

    sf = "/root/testdata/sf0.001"
    got = q_decontamination_by_source(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(decontamination_sql()).fetchdf()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_decontamination_planted_overlap(ray_session, tmp_path, monkeypatch):
    """Planted corpus: one training doc copies an eval doc's text (must be
    contaminated), one shares no gram (must not)."""
    import tokenzip.analysis as an

    docs = pa.table(
        {
            "doc_id": pa.array([100, 1, 2], pa.int64()),  # 100 -> eval row
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon",
                    "zeta alpha beta gamma theta",  # shares gram 'alpha beta gamma'
                    "one two three four five",  # disjoint
                ]
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["a", "a", "b"]),
            "n_chars": pa.array([30, 27, 23], pa.int64()),
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    from tokenzip.training import q_decontamination_by_source

    got = q_decontamination_by_source(str(d)).set_index("source")
    assert got.loc["a", "n_contaminated"] == 1
    assert got.loc["a", "sum_hit_grams"] == 1
    assert got.loc["b", "n_contaminated"] == 0


def test_split_is_pure_row_function():
    """The md5 rule itself, independent of Ray: stable and ~5% val."""
    import hashlib

    from tokenzip.training import _SPLIT_DEN

    ids = [f"doc-{i:08d}" for i in range(20_000)]
    hv = [int(hashlib.md5(i.encode()).hexdigest()[:15], 16) for i in ids]
    val = sum(1 for h in hv if h % _SPLIT_DEN == 0)
    assert abs(val / len(ids) - 1 / _SPLIT_DEN) < 0.01


def test_seqlen_quantiles_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import (
        q_seqlen_quantiles_by_source,
        seqlen_quantiles_sql,
    )

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_seqlen_quantiles_by_source(SF)
    odf = duckdb.sql(seqlen_quantiles_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))
    assert (got["p50"] <= got["p90"]).all()
    assert (got["p90"] <= got["p99"]).all()
    assert (got["p99"] <= got["max_tok"]).all()


def test_seqlen_quantile_fold_rank_parity():
    """The histogram fold's integer-ceil rank must equal the rank-ceil
    element of the explicitly sorted array, including float-hostile sizes
    (n=10: float CEIL(0.9*10) would pick rank 10, integer math rank 9)."""
    import numpy as np

    from tokenzip.training import SEQLEN_QUANTILES, _seqlen_quantile_group

    rng = np.random.default_rng(5)
    for n in (1, 2, 9, 10, 100, 1000, 12345):
        vals = rng.integers(0, 2**17, n).astype(np.int64)
        u, c = np.unique(vals, return_counts=True)
        df = pd.DataFrame({"source": "s", "n_tok": u, "cnt": c})
        out = _seqlen_quantile_group(df)
        s = np.sort(vals)
        for name, num, den in SEQLEN_QUANTILES:
            rank = (num * n + den - 1) // den
            assert out[name].iloc[0] == s[rank - 1], (n, name)
        assert out["max_tok"].iloc[0] == s[-1]
        assert out["n_docs"].iloc[0] == n


def test_top_token_by_source_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_top_token_by_source, top_token_by_source_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_top_token_by_source(SF).reset_index(drop=True)
    odf = duckdb.sql(top_token_by_source_sql(glob)).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_top_token_by_source_signed_and_cross_bucket_ties(ray_session, tmp_path):
    """Signed token ids must survive the composite packing, and a tie
    between tokens in DIFFERENT hash buckets must resolve to the smaller
    token id."""
    import pyarrow.parquet as pq_

    # token -513 and 511 land in different (_VOCAB_NB=512) buckets; equal
    # counts -> winner must be -513 (the smaller id)
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "tokens": pa.array([[-513, -513, 511], [511, 7]], pa.list_(pa.int32())),
            "n_tok": pa.array([3, 2], pa.int32()),
            "source": pa.array(["s1", "s1"], pa.string()),
        }
    )
    p = str(tmp_path / "toks.parquet")
    pq_.write_table(tbl, p)
    from tokenzip.training import q_top_token_by_source

    got = q_top_token_by_source(str(tmp_path))
    assert got.values.tolist() == [["s1", -513, 2]]


def test_token_freq_histogram_matches_duckdb(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_token_freq_histogram, token_freq_histogram_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_token_freq_histogram(SF).reset_index(drop=True)
    odf = duckdb.sql(token_freq_histogram_sql(glob)).df()
    # digit-class boundaries are exact: class d holds counts in [10^(d-1), 10^d)
    assert (got["n_tokens"] > 0).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_freq_hist_digit_boundaries():
    import pandas as _pd

    from tokenzip.training import _freq_hist_group

    g = _pd.DataFrame(
        {
            "token": list(range(6)),
            "cnt": [1, 9, 10, 99, 100, 1000],
            "bkt": [0] * 6,
        }
    )
    out = _freq_hist_group(g)
    assert out.values.tolist() == [
        [1, 2, 10],
        [2, 2, 109],
        [3, 1, 100],
        [4, 1, 1000],
    ]


def test_vocab_overlap_matches_intersect_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_vocab_overlap, vocab_overlap_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_vocab_overlap(SF)
    odf = duckdb.sql(vocab_overlap_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_vocab_overlap_bitmask_is_or(ray_session, tmp_path):
    """A token in ALL sources counts once per pair; a token in one source
    counts nowhere; duplicate occurrences never inflate the mask."""
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array(
                [[5, 5, 7], [5, 9], [5, 9, 9], [11]],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([3, 2, 3, 1], pa.int32()),
            "source": pa.array(["s1", "s2", "s3", "s3"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_vocab_overlap

    got = q_vocab_overlap(str(tmp_path))
    # 5 in all three pairs; 9 in (s2,s3) only; 7/11 nowhere
    assert got.values.tolist() == [
        ["s1", "s2", 1],
        ["s1", "s3", 1],
        ["s2", "s3", 2],
    ]


def test_token_run_stats_matches_window_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_token_run_stats, token_run_stats_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_token_run_stats(SF)
    odf = duckdb.sql(token_run_stats_sql(glob)).df()
    assert (got["n_runs"] <= got["n_tokens"]).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_token_run_stats_run_boundaries(ray_session, tmp_path):
    """Runs never span documents, empty docs count as docs with no runs,
    and max_run is per source."""
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array(
                [[3, 3, 3], [3, 3], [], [1, 1, 2]], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([3, 2, 0, 3], pa.int32()),
            "source": pa.array(["x", "x", "x", "y"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_token_run_stats

    got = q_token_run_stats(str(tmp_path))
    # x: docs a+b+c -> runs [3][2] (never merged across docs), max 3
    # y: runs [1,1][2] -> 2 runs, max 2
    assert got.values.tolist() == [
        ["x", 3, 5, 2, 3],
        ["y", 1, 3, 2, 2],
    ]


def test_vocab_unique_matches_except_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_vocab_unique_by_source, vocab_unique_by_source_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_vocab_unique_by_source(SF)
    odf = duckdb.sql(vocab_unique_by_source_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_vocab_unique_census_identity(ray_session, tmp_path):
    """unique + shared partition the vocab: sum(n_unique) + |tokens in >=2
    sources| == |global vocab| on a planted corpus."""
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "tokens": pa.array([[1, 2], [2, 3], [4]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 2, 1], pa.int32()),
            "source": pa.array(["x", "y", "z"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_vocab_unique_by_source

    got = q_vocab_unique_by_source(str(tmp_path))
    # 1 unique to x, 3 unique to y, 4 unique to z; 2 shared
    assert got.values.tolist() == [["x", 1], ["y", 1], ["z", 1]]


def test_vocab_jaccard_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_vocab_jaccard, vocab_jaccard_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_vocab_jaccard(SF)
    odf = duckdb.sql(vocab_jaccard_sql(glob)).df()
    # identity: inter <= union, bp within [0, 10000]
    assert (got["n_inter"] <= got["n_union"]).all()
    assert got["jaccard_bp"].between(0, 10000).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_longest_docs_matches_order_by_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import longest_docs_sql, q_longest_docs

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_longest_docs(SF)
    odf = duckdb.sql(longest_docs_sql(glob)).df()
    assert got["n_tok"].is_monotonic_decreasing
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_dup_block_census_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import dup_block_census_sql, q_dup_block_census

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_dup_block_census(SF)
    odf = duckdb.sql(dup_block_census_sql(glob)).df()
    assert (got["n_dup_blocks"] <= got["n_blocks"]).all()
    assert (got["n_distinct_blocks"] <= got["n_blocks"]).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_dup_block_census_planted(ray_session, tmp_path):
    """A 16-token run shared by two docs is dup mass in BOTH; the same
    content repeated within one doc is NOT (distinct-doc rule); short docs
    and trailing partial blocks contribute nothing."""
    shared = list(range(100, 116))
    other = list(range(900, 916))
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"]),
            "tokens": pa.array(
                [
                    shared + [1, 2, 3],      # a: 1 complete block + partial
                    shared,                  # b: the same block content
                    other + other,           # c: within-doc repeat, nd=1
                    list(range(15)),         # d: too short, 0 blocks
                    [],                      # e: empty
                ],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([19, 16, 32, 15, 0], pa.int32()),
            "source": pa.array(["x", "y", "x", "x", "y"]),
        }
    )
    p = str(tmp_path / "toks.parquet")
    pq.write_table(tbl, p)
    from tokenzip.training import q_dup_block_census

    got = q_dup_block_census(str(tmp_path))
    x = got[got["source"] == "x"].iloc[0]
    y = got[got["source"] == "y"].iloc[0]
    # x: blocks = a(1) + c(2) = 3; dup = a's shared block; distinct = shared + other
    assert (x["n_blocks"], x["n_dup_blocks"], x["n_distinct_blocks"]) == (3, 1, 2)
    # y: b's single block is dup (shared with a, a different doc)
    assert (y["n_blocks"], y["n_dup_blocks"], y["n_distinct_blocks"]) == (1, 1, 1)


def test_length_outliers_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import length_outliers_sql, q_length_outliers_by_source

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_length_outliers_by_source(SF)
    odf = duckdb.sql(length_outliers_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_length_outliers_planted(ray_session, tmp_path):
    """One giant doc among uniform ones is a high outlier; zero-variance
    and single-doc sources produce none (not a divide-by-zero)."""
    lens = [10] * 99 + [1000]
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(103)]),
            "tokens": pa.array([[1] * 3] * 103, pa.list_(pa.int32())),
            "n_tok": pa.array(lens + [7, 7, 42], pa.int32()),
            "source": pa.array(["x"] * 100 + ["flat", "flat", "one"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_length_outliers_by_source

    got = q_length_outliers_by_source(str(tmp_path)).set_index("source")
    assert got.loc["x", "n_high_outliers"] == 1
    assert got.loc["x", "n_low_outliers"] == 0
    assert got.loc["flat"].tolist() == [2, 0, 0]
    assert got.loc["one"].tolist() == [1, 0, 0]


def test_vocab_tv_distance_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_vocab_tv_distance, vocab_tv_distance_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_vocab_tv_distance(SF)
    odf = duckdb.sql(vocab_tv_distance_sql(glob)).df()
    assert ((got["tv_bp"] >= 0) & (got["tv_bp"] <= 10000)).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_vocab_tv_distance_planted(ray_session, tmp_path):
    """Identical distributions give 0 bp, disjoint vocabularies 10000 bp,
    and a half-overlap lands exactly where the closed form says."""
    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"]),
            "tokens": pa.array(
                [[1, 2], [1, 2], [5, 6], [1, 5]], pa.list_(pa.int32())
            ),
            "n_tok": pa.array([2, 2, 2, 2], pa.int32()),
            "source": pa.array(["p", "q", "r", "s"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_vocab_tv_distance

    got = q_vocab_tv_distance(str(tmp_path)).set_index(["source_a", "source_b"])
    assert got.loc[("p", "q"), "tv_bp"] == 0       # identical
    assert got.loc[("p", "r"), "tv_bp"] == 10000   # disjoint
    # p={1,2}, s={1,5}: TV = 1/2*(|.5-.5| + .5 + .5) = 0.5 -> 5000 bp
    assert got.loc[("p", "s"), "tv_bp"] == 5000


def test_seqlen_mad_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.training import q_seqlen_mad_by_source, seqlen_mad_sql

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_seqlen_mad_by_source(SF)
    odf = duckdb.sql(seqlen_mad_sql(glob)).df()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_seqlen_mad_planted(ray_session, tmp_path):
    """Closed-form check: values 1..9 + one 1000. Median = low rank-5 of 10
    = 5; deviations sorted 0,1,1,2,2,3,3,4,4,995 -> MAD (rank 5) = 2;
    robust outliers (dev > 10): only the 1000."""
    lens = list(range(1, 10)) + [1000]
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(10)]),
            "tokens": pa.array([[1]] * 10, pa.list_(pa.int32())),
            "n_tok": pa.array(lens, pa.int32()),
            "source": pa.array(["x"] * 10),
        }
    )
    pq.write_table(tbl, str(tmp_path / "toks.parquet"))
    from tokenzip.training import q_seqlen_mad_by_source

    got = q_seqlen_mad_by_source(str(tmp_path)).iloc[0]
    assert (got["med_tok"], got["mad_tok"], got["n_robust_outliers"]) == (5, 2, 1)


def test_ratio_by_length_bucket_matches_oracle(ray_session):
    from tokenzip.corpus import ensure_corpus
    from tokenzip.queries import (
        q_ratio_by_length_bucket,
        ratio_by_length_bucket_sql,
    )

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_ratio_by_length_bucket(SF)
    odf = duckdb.sql(ratio_by_length_bucket_sql(glob)).df()
    # every kilotoken ratio must be a plausible LEB128 cost (1..5 B/token)
    assert ((got["bytes_per_kilotoken"] >= 1000) & (got["bytes_per_kilotoken"] <= 5000)).all()
    pd.testing.assert_frame_equal(got, odf.astype(got.dtypes.to_dict()))


def test_shuffle_emit_order_and_determinism(ray_session, tmp_path):
    """The epoch-shuffle writer: written files are internally sorted with
    pairwise-disjoint skey windows; same seed = same order across runs;
    different seed = different order; content is the full multiset."""
    import glob as globmod

    import numpy as np
    import pyarrow.parquet as pq

    from tokenzip.training import _token_paths, shuffle_emit

    paths = _token_paths("/root/testdata/sf0.001")

    def order_of(out):
        files = sorted(globmod.glob(out + "/*.parquet"))
        spans = []
        for p in files:
            t = pq.read_table(p, columns=["skey", "doc_id"])
            sk = t["skey"].to_numpy(zero_copy_only=False)
            if len(sk):
                spans.append((int(sk[0]), t))
        spans.sort(key=lambda s: s[0])
        ids = []
        for _, t in spans:
            ids.extend(t["doc_id"].to_pylist())
        return ids

    a = str(tmp_path / "a")
    t = shuffle_emit(paths, a, seed=0)
    assert t["ordered"] and t["n_rows"] == 2000
    oa = order_of(a)
    assert len(oa) == 2000 and len(set(oa)) == 2000
    # deterministic: a second run with the same seed replays the order
    b = str(tmp_path / "b")
    shuffle_emit(paths, b, seed=0)
    assert order_of(b) == oa
    # a different seed is a genuinely different epoch order
    c = str(tmp_path / "c")
    shuffle_emit(paths, c, seed=1)
    oc = order_of(c)
    assert set(oc) == set(oa) and oc != oa
    # and the order is not the ingest order (it actually shuffled)
    ingest = []
    for p in paths:
        ingest.extend(pq.read_table(p, columns=["doc_id"])["doc_id"].to_pylist())
    assert oa != ingest

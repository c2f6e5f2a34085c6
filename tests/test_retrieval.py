"""TF-IDF retrieval: vectorized per-doc term-count kernel properties and
the DuckDB oracle on the real sf0.001 documents table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from tokenzip.retrieval import (
    QUERY_TERMS,
    _per_doc_term_counts,
    q_tfidf_topk,
    tfidf_topk_sql,
)

SF = "/root/testdata/sf0.001"


def _chunked(texts):
    return pa.chunked_array([pa.array(texts, pa.string())])


def test_term_counts_match_python_split():
    texts = [
        "spark window spark hash",
        "merge",
        "",
        "nothing here",
        "stream stream stream window",
    ]
    tf, n = _per_doc_term_counts(_chunked(texts), QUERY_TERMS)
    assert n == len(texts)
    for i, t in enumerate(texts):
        words = t.split(" ")
        for j, term in enumerate(QUERY_TERMS):
            assert tf[i, j] == words.count(term), (i, term)


def test_term_counts_empty_batch():
    tf, n = _per_doc_term_counts(_chunked([]), QUERY_TERMS)
    assert n == 0 and tf.shape == (0, len(QUERY_TERMS))


def test_term_counts_multichunk_input():
    """ChunkedArray inputs (the normal Arrow-batch case) combine correctly."""
    ca = pa.chunked_array(
        [pa.array(["spark spark"], pa.string()), pa.array(["hash"], pa.string())]
    )
    tf, n = _per_doc_term_counts(ca, QUERY_TERMS)
    assert n == 2
    assert tf[0, QUERY_TERMS.index("spark")] == 2
    assert tf[1, QUERY_TERMS.index("hash")] == 1


def test_tfidf_topk_matches_oracle_on_testdata(ray_session):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = q_tfidf_topk(SF).reset_index(drop=True)
    exp = con.sql(tfidf_topk_sql()).df()
    assert len(got) > 0
    assert got["score"].is_monotonic_decreasing
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

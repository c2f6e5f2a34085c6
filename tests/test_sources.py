"""JSONL ingestion: canonical-schema coercion, int32 range guard, and the
value-level DuckDB differential on the deterministic corpus rendering."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_jsonl_ingest_matches_duckdb(ray_session):
    from tokenzip.sources import (
        ensure_jsonl_corpus,
        jsonl_ingest_sql,
        q_jsonl_ingest_stats,
    )

    got = q_jsonl_ingest_stats(SF)
    ora = duckdb.sql(jsonl_ingest_sql(ensure_jsonl_corpus(SF))).df()
    pd.testing.assert_frame_equal(got, ora.astype(got.dtypes.to_dict()))


def test_jsonl_canonical_schema(ray_session, tmp_path):
    import json

    from tokenzip.sources import TOKEN_SCHEMA, read_tokens_jsonl

    p = tmp_path / "d.jsonl"
    rows = [
        {"doc_id": "a", "tokens": [1, -2, 3], "n_tok": 3, "source": "web"},
        {"doc_id": "b", "tokens": [7], "n_tok": 1, "source": "code"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_tokens_jsonl(str(p))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    got = ds.take_all()
    assert sorted(r["doc_id"] for r in got) == ["a", "b"]
    sch = ds.schema()
    assert sch.base_schema.field("tokens").type == pa.list_(pa.int32())
    assert sch.base_schema.field("n_tok").type == pa.int32()


def test_jsonl_int32_overflow_refused(ray_session, tmp_path):
    import json

    from tokenzip.sources import read_tokens_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        json.dumps(
            {"doc_id": "x", "tokens": [2**33], "n_tok": 1, "source": "web"}
        )
        + "\n"
    )
    with pytest.raises(Exception, match="int32"):
        read_tokens_jsonl(str(p)).materialize()


def test_csv_ingest_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from tokenzip.sources import csv_ingest_sql, ensure_csv_corpus, q_csv_ingest_stats

    p = ensure_csv_corpus("sf0.001")
    got = q_csv_ingest_stats("sf0.001").reset_index(drop=True)
    exp = duckdb.sql(csv_ingest_sql(p)).df()
    assert int(got["n_docs"].sum()) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_csv_empty_tokens_and_negatives(ray_session, tmp_path):
    """'' must parse to an EMPTY token list (not ['']), negatives survive,
    and the canonical schema comes out."""
    from tokenzip.sources import read_tokens_csv

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,tokens,n_tok,source\n"
        "a,1 -2 3,3,web\n"
        "b,,0,web\n"
        "c,-2147483648 2147483647,2,wiki\n"
    )
    ds = read_tokens_csv(str(p))
    got = {r["doc_id"]: r["tokens"] for r in ds.take_all()}
    assert list(got["a"]) == [1, -2, 3]
    assert list(got["b"]) == []
    assert list(got["c"]) == [-(2**31), 2**31 - 1]
    sch = ds.schema()
    assert sch.base_schema.field("tokens").type == pa.list_(pa.int32())
    assert sch.base_schema.field("n_tok").type == pa.int32()


def test_csv_non_numeric_token_refused(ray_session, tmp_path):
    from tokenzip.sources import read_tokens_csv

    p = tmp_path / "bad.csv"
    p.write_text("doc_id,tokens,n_tok,source\nx,1 oops 3,3,web\n")
    with pytest.raises(Exception):
        read_tokens_csv(str(p)).materialize()


def test_multi_format_union_equals_parquet_corpus(ray_session):
    """jsonl(shard0) + csv(shard1) + parquet(rest) == the full corpus."""
    import duckdb

    from tokenzip.corpus import ensure_corpus
    from tokenzip.sources import multi_format_union_sql, q_multi_format_union

    glob = ensure_corpus(SF) + "/*.parquet"
    got = q_multi_format_union(SF).reset_index(drop=True)
    exp = duckdb.sql(multi_format_union_sql(glob)).df()
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))

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

"""Distributed term-based retrieval over the documents table.

TF-IDF top-k search, the inverted-retrieval workload an LLM-corpus engine
needs next to its dedup/decontamination passes (find the documents most
relevant to a probe query — e.g. to audit what a corpus says about a topic
before training). Two column-pruned streaming passes:

  pass 1  per-batch vectorized term document-frequencies (one Arrow
          ``split_pattern`` + ``equal`` kernel per term, per-doc sums via a
          cumsum-gather over the list offsets — no Python per row), folded
          by a tiny ``groupby(term)`` whose domain is len(QUERY_TERMS)+1;
  pass 2  idf weights broadcast once (``ray.put``), per-batch integer
          scores ``tf @ idf`` and a partial top-k, final exact top-k on the
          driver over the bounded (k × n_batches) partials.

Scoring is pure integer arithmetic on BOTH engines so the DuckDB oracle is
hash-exact: ``idf_int = ((2N - 2df + 1) * 1_000_000) // (2df + 1)`` (the
classic (N - df + 0.5)/(df + 0.5) BM25 idf ratio cleared of halves), and
``score = Σ_t tf(t, doc) * idf_int(t)``. Ranks tie-break on doc_id asc.

Scale shape: pass 1's shuffle is |terms| rows per batch; pass 2 is map-only
plus a driver-side reduce of k-row partials. Nothing materializes the
corpus. (Reference scope analog: this engine-side query surface sits above
the codec core the reference ships — see SURVEY.md §2.7.)
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from tokenzip.stages import _bcast, _bget

QUERY_TERMS = ("spark", "window", "hash", "stream", "merge")
IDF_SCALE = 1_000_000
TOP_K = 10
_N_KEY = "__corpus_n__"  # pseudo-term carrying the total doc count


def _per_doc_term_counts(texts: pa.ChunkedArray, terms) -> tuple[np.ndarray, int]:
    """(n_docs × n_terms) int64 tf matrix from one split + |terms| equal
    kernels; per-doc sums via cumsum gathered at the list offsets (robust
    to empty word lists, unlike reduceat)."""
    arr = pc.split_pattern(texts.combine_chunks(), pattern=" ")
    flat = arr.flatten()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(arr)
    tf = np.zeros((n_docs, len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        eq = pc.equal(flat, t).to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(eq)])
        tf[:, j] = c[offsets[1:]] - c[offsets[:-1]]
    return tf, n_docs


def _df_partials(batch: pa.Table) -> pa.Table:
    tf, n_docs = _per_doc_term_counts(batch["text"], QUERY_TERMS)
    dfs = (tf > 0).sum(axis=0).astype(np.int64)
    return pa.table(
        {
            "term": pa.array(list(QUERY_TERMS) + [_N_KEY], pa.string()),
            "n": pa.array(np.concatenate([dfs, [n_docs]]), pa.int64()),
        }
    )


class _ScoreStage:
    """Integer tf·idf scores with a per-batch partial top-k; the idf vector
    is broadcast once and fetched in __init__, never shipped per batch."""

    def __init__(self, idf_ref, k: int):
        self.idf = _bget(idf_ref)  # int64 vector aligned with QUERY_TERMS
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf, _ = _per_doc_term_counts(batch["text"], QUERY_TERMS)
        scores = tf @ self.idf
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = scores > 0
        ids, scores = ids[hit], scores[hit]
        top = np.lexsort((ids, -scores))[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(ids[top], pa.int64()),
                "score": pa.array(scores[top], pa.int64()),
            }
        )


def q_tfidf_topk(sf_dir: str, k: int = TOP_K) -> pd.DataFrame:
    """Top-k documents for QUERY_TERMS by integer TF-IDF. Returns
    (rank, doc_id, score) ordered by (score desc, doc_id asc)."""
    path = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])

    stats = (
        ds.map_batches(_df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    by_term = dict(zip(stats["term"], stats["n"].astype(np.int64)))
    n_total = int(by_term[_N_KEY])
    idf = np.array(
        [
            ((2 * n_total - 2 * int(by_term.get(t, 0)) + 1) * IDF_SCALE)
            // (2 * int(by_term.get(t, 0)) + 1)
            for t in QUERY_TERMS
        ],
        dtype=np.int64,
    )

    partials = ds.map_batches(
        _ScoreStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
        concurrency=2,
        fn_constructor_kwargs={"idf_ref": _bcast(idf), "k": k},
    ).to_pandas()
    top = (
        partials.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top["doc_id"].astype("int64"),
            "score": top["score"].astype("int64"),
        }
    )


def tfidf_topk_sql(k: int = TOP_K) -> str:
    in_list = ",".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM words WHERE w IN ({in_list})
  GROUP BY doc_id, w
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
idf AS (
  SELECT term, ((2 * n.n - 2 * df.df + 1) * {IDF_SCALE}) // (2 * df.df + 1) AS idf
  FROM df CROSS JOIN n
),
score AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf * idf.idf) AS BIGINT) AS score
  FROM tf JOIN idf USING (term) GROUP BY tf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       score
FROM score ORDER BY score DESC, doc_id ASC LIMIT {k}
"""

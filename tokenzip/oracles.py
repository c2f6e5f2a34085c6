"""DuckDB oracle SQL builders for the analysis-family queries.

Each builder returns ANSI-ish SQL DuckDB 1.0 runs over the pre-registered
``documents`` view, recomputing EXACTLY what the corresponding Ray pipeline
computes (same hashes, same integer thresholds, same tie-breaks) — the
engine's analog of the reference's differential fuzz oracles
(/root/reference/fuzz/fuzz_targets/fuzz_target_1.rs:6-15).
"""

from __future__ import annotations

def lang_id_sql() -> str:
    """Programmatically-generated oracle for the stopword language vote:
    per-language distinct-word marker overlap, argmax with alphabetical-first
    tie-break — the exact rule of tokenzip.analysis.predict_lang."""
    from tokenzip.analysis import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    scores = ", ".join(
        "len(list_intersect(ws, [{m}])) AS s_{lg}".format(
            m=", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lg])), lg=lg
        )
        for lg in langs
    )
    cases = []
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(f"s_{lg} >= s_{o}" for o in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lg}'")
    pred = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH w AS (
  SELECT lang, list_distinct(string_split(text, ' ')) AS ws FROM documents
),
s AS (SELECT lang, {scores} FROM w),
p AS (SELECT lang, {pred} AS pred_lang FROM s)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""


def media_sql() -> str:
    """Oracle for the md5-seeded fake media decode: byte_i of md5(text)
    recovered nibble-by-nibble with strpos (DuckDB-native, no UDFs)."""

    def nib(i: int) -> str:  # 1-based hex char index into md5(text)
        return f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"

    def byte(j: int) -> str:  # j-th byte (0-based) of the digest
        return f"({nib(2 * j + 1)} * 16 + {nib(2 * j + 2)})"

    w = f"(({byte(0)} + 256 * {byte(1)}) % 640) + 1"
    h = f"(({byte(2)} + 256 * {byte(3)}) % 480) + 1"
    return f"""
WITH m5 AS (SELECT source, text, md5(text) AS m FROM documents),
d AS (SELECT source, octet_length(encode(text)) AS pb, {w} AS dw, {h} AS dh FROM m5)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(pb) AS BIGINT) AS sum_payload_bytes,
       CAST(SUM(dw) AS BIGINT) AS sum_w,
       CAST(SUM(dh) AS BIGINT) AS sum_h
FROM d GROUP BY source ORDER BY source
"""


def minhash_sql() -> str:
    """Exact word-3-gram Jaccard near-dup oracle via an inverted-index
    self-join (pairs sharing >= 1 gram), integer threshold 10*inter >=
    7*union — byte-for-byte the rule the Ray pipeline verifies inside its
    LSH buckets. The engine's 32x2 banding finds every >=0.7 pair w.h.p."""
    from tokenzip.analysis import _PAIR_MOD

    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(ws) - 2, 1)),
           i -> CASE WHEN len(ws) >= 3
                     THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     ELSE array_to_string(ws, ' ') END)) AS gram
  FROM w
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns FROM gd GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM gd x JOIN gd y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
dup AS (
  SELECT a, b
  FROM inter JOIN sz sa ON sa.doc_id = inter.a JOIN sz sb ON sb.doc_id = inter.b
  WHERE 10 * c >= 7 * (sa.ns + sb.ns - c)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(SUM(ns) AS BIGINT) FROM sz) AS sum_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(SUM((CAST(a AS HUGEINT) * 1000003 + b) % {_PAIR_MOD}), 0)
            % {_PAIR_MOD} AS BIGINT) AS pair_checksum
FROM dup
"""


def events_window_sql(window_ms: int = 3_600_000) -> str:
    """Sliding-window oracle: SQL's RANGE frame IS the spec the Ray
    operator implements — per event, count same-user events with time in
    [t - W, t] inclusive of ORDER BY peers, on millisecond-quantized
    timestamps (epoch_us // 1000, exact int64 on both engines)."""
    return f"""
WITH e AS (SELECT event_type, user_id, epoch_us(ts) // 1000 AS tms FROM events),
w AS (SELECT event_type,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY tms
                            RANGE BETWEEN {window_ms} PRECEDING AND CURRENT ROW) AS cnt
      FROM e)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cnt) AS BIGINT) AS sum_window_cnt,
       CAST(MAX(cnt) AS BIGINT) AS max_window_cnt
FROM w GROUP BY event_type ORDER BY event_type
"""


def events_asof_sql() -> str:
    """AS-OF join oracle: latest order (max order date, ties to max
    orderkey via a HUGEINT composite) of the same customer at-or-before
    each event. Price in exact cents via the identical floor(x*100 + 0.5)
    both engines use; checksum congruent to the Ray side's per-term
    modular fold."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD

    return f"""
WITH e AS (SELECT event_id, event_type, user_id, epoch_us(ts) // 1000 AS tms
           FROM events),
o AS (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) // 1000 AS oms,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders),
m AS (
  SELECT e.event_id,
         arg_max(o.o_orderkey,
                 CAST(o.oms AS HUGEINT) * 4294967296 + o.o_orderkey) AS okey,
         arg_max(o.price_c,
                 CAST(o.oms AS HUGEINT) * 4294967296 + o.o_orderkey) AS price_c
  FROM e JOIN o ON e.user_id = o.o_custkey AND o.oms <= e.tms
  GROUP BY e.event_id
)
SELECT e.event_type AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(m.okey) AS BIGINT) AS n_matched,
       CAST(COALESCE(SUM(m.price_c), 0) AS BIGINT) AS sum_price_cents,
       CAST(COALESCE(SUM((e.event_id % {_PAIR_MOD}) * {_PAIR_K}
                         + (m.okey % {_PAIR_MOD})), 0)
            % {_PAIR_MOD} AS BIGINT) AS join_checksum
FROM e LEFT JOIN m ON e.event_id = m.event_id
GROUP BY e.event_type ORDER BY event_type
"""


def events_range_sql(range_ms: int = 10_000 * 86_400_000) -> str:
    """Interval range-join oracle: enumerate every (event, order) pair of
    the same customer with the order dated in the trailing inclusive
    window [tms - range_ms, tms] and aggregate per event_type. n_events
    counts ALL events (zero-pair events included); DuckDB's SUM(BIGINT)
    accumulates in HUGEINT, so the checksum fold is exact and congruent
    to the Ray side's per-event modular prefix-sum fold
    (tokenzip.relational._range_group)."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD

    return f"""
WITH e AS (SELECT event_id, event_type, user_id, epoch_us(ts) // 1000 AS tms
           FROM events),
o AS (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) // 1000 AS oms,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      FROM orders),
ec AS (SELECT event_type, COUNT(*) AS n_events FROM e GROUP BY event_type),
p AS (
  SELECT e.event_type, e.event_id, o.o_orderkey AS okey, o.price_c
  FROM e JOIN o ON e.user_id = o.o_custkey
               AND o.oms <= e.tms AND o.oms >= e.tms - {range_ms}
),
pa AS (
  SELECT event_type,
         COUNT(*) AS n_pairs,
         SUM(price_c) AS sum_price,
         SUM((event_id % {_PAIR_MOD}) * {_PAIR_K} + (okey % {_PAIR_MOD}))
           % {_PAIR_MOD} AS chk
  FROM p GROUP BY event_type
)
SELECT ec.event_type AS event_type,
       CAST(ec.n_events AS BIGINT) AS n_events,
       CAST(COALESCE(pa.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(pa.sum_price, 0) AS BIGINT) AS sum_price_cents,
       CAST(COALESCE(pa.chk, 0) AS BIGINT) AS pair_checksum
FROM ec LEFT JOIN pa USING (event_type) ORDER BY event_type
"""


def embedding_dedup_sql(tau=(2, 5)) -> str:
    """Embedding-cosine near-dup oracle: exact float64 self-join over the
    ``embeddings`` view, pairs with cosine >= tau (default 0.4 — chosen
    >=1e-4 away from every pair at the oracle scale so summation-order
    noise cannot flip a pair). Integer outputs only; the per-term modular
    folds match analysis._PAIR_MOD / _PAIR_K exactly."""
    from tokenzip.analysis import _PAIR_K, _PAIR_MOD

    num, den = tau
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS ai, b.vec_id AS bi
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {num / den}
)
SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(SUM((ai % {_PAIR_MOD}) * {_PAIR_K} + (bi % {_PAIR_MOD})), 0)
            % {_PAIR_MOD} AS BIGINT) AS pair_checksum
FROM p
"""


def embedding_topk_ivf_sql() -> str:
    """Recall-pinned oracle for q_embedding_topk_ivf: the IVF result is
    deterministic (fixed corpus + seeded k-means on a bounded sample +
    float64 matmul), so the sf0.01 recall row is a constant the engine must
    reproduce exactly (analysis.EMB_TOPK_IVF_PIN; regenerate with
    `python -m tokenzip pins`)."""
    from tokenzip.analysis import EMB_TOPK_IVF_PIN as P

    return f"""
SELECT CAST({P["k"]} AS BIGINT) AS k, CAST({P["n_probe"]} AS BIGINT) AS n_probe,
       CAST({P["n_clusters"]} AS BIGINT) AS n_clusters,
       CAST({P["recall_pct_x100"]} AS BIGINT) AS recall_pct_x100,
       CAST({P["n_found"]} AS BIGINT) AS n_found
"""


def embedding_dedup_ivf_sql(tau=(2, 5)) -> str:
    """Self-auditing oracle for the IVF-bucketed near-dup: DuckDB recomputes
    the EXACT pair set itself (same self-join as embedding_dedup_sql) and
    emits the pinned IVF-found constants (analysis.EMB_DEDUP_IVF_PIN) only
    when that exact count matches the pin — corpus or threshold drift makes
    the oracle return ZERO rows (red), never a silently-green stale pin.
    The found side is deterministic on the engine (fixed corpus, seeded
    k-means on a bounded sample, float64 matmuls), so it pins exactly.
    Regenerate pins with `python -m tokenzip pins`."""
    from tokenzip.analysis import EMB_DEDUP_IVF_PIN as P

    num, den = tau
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {num / den}
)
SELECT CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vecs,
       n_exact AS n_dup_exact,
       CAST({P["found"]} AS BIGINT) AS n_dup_found,
       CAST({P["chk"]} AS BIGINT) AS pair_checksum_found,
       CAST((10000 * {P["found"]}) // n_exact AS BIGINT) AS recall_pct_x100
FROM x WHERE n_exact = {P["exact"]}
"""


def simhash_sql() -> str:
    """Brute-force oracle recomputing the engine's 60-bit simhash exactly:
    word hash = first 15 md5 hex nibbles (strpos arithmetic, int64-safe),
    per-bit +-1 votes over distinct words, pairs at hamming <= 3."""
    from tokenzip.analysis import _PAIR_MOD, _SH_BITS, _SH_MAXHAM

    def nib(i: int) -> str:
        return f"(strpos('0123456789abcdef', substr(m, {i}, 1)) - 1)"

    wh = " + ".join(f"{nib(i + 1)} * {16 ** (14 - i)}" for i in range(15))
    votes = ", ".join(
        f"SUM(CASE WHEN (wh >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS s{k}"
        for k in range(_SH_BITS)
    )
    hbits = " + ".join(
        f"CASE WHEN s{k} > 0 THEN {1 << k} ELSE 0 END" for k in range(_SH_BITS)
    )
    return f"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
  FROM documents
),
hw AS (SELECT doc_id, {wh} AS wh
       FROM (SELECT doc_id, md5(word) AS m FROM w)),
v AS (SELECT doc_id, {votes} FROM hw GROUP BY doc_id),
s AS (SELECT doc_id, CAST({hbits} AS BIGINT) AS sh FROM v),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM s x JOIN s y ON x.doc_id < y.doc_id
  WHERE bit_count(xor(x.sh, y.sh)) <= {_SH_MAXHAM}
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
       (SELECT CAST(SUM(CAST(sh AS HUGEINT)) % {_PAIR_MOD} AS BIGINT) FROM s)
         AS simhash_checksum,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
       CAST(COALESCE(SUM((CAST(a AS HUGEINT) * 1000003 + b) % {_PAIR_MOD}), 0)
            % {_PAIR_MOD} AS BIGINT) AS pair_checksum
FROM p
"""



# Pinned per-codec compression mix at the driver's oracle scale (sf0.01).
# The mix is DETERMINISTIC: fixed corpus (seed=42), deterministic block
# splitting (override_num_blocks from file bytes), deterministic selector
# (tokenzip/codecs/selector.py) — verified byte-identical across num_cpus=4
# and 16 fresh sessions. Regenerate with tests/test_analysis.py's
# test_compression_by_codec_pin (or /tmp: q_compression_by_codec('sf0.01'))
# whenever the corpus generator, chunking, or selector changes.
# Pin methodology mirrors the IVF recall constant (__ray_entry__.py) and the
# reference's fixed-corpus fuzz oracles
# (/root/reference/fuzz/fuzz_targets/fuzz_target_1.rs:6-15).
COMPRESSION_BY_CODEC_PIN = [
    # (tokens_codec, n_tokens, tokens_bytes_out, leb128_bytes) —
    # regenerated by `python -m tokenzip pins`
    ("for", 4_171_134, 8_367_420, 13_714_780),
    ("rankdict", 6_630_597, 6_148_769, 8_626_780),
    ("rle", 1_395_516, 652_351, 3_804_123),
]


def compression_by_codec_sql(glob: str) -> str:
    """Self-auditing pinned oracle for the per-codec compression mix: the
    pinned rows are returned ONLY IF their n_tokens / leb128_bytes sums equal
    the closed-form totals DuckDB computes from the corpus itself — a stale
    pin (corpus or chunking change) yields zero rows and a red row-count
    instead of silently matching."""
    vals = ", ".join(
        f"('{c}', {nt}, {bo}, {lb})" for c, nt, bo, lb in COMPRESSION_BY_CODEC_PIN
    )
    zz = "CASE WHEN t >= 0 THEN 2*CAST(t AS BIGINT) ELSE -2*CAST(t AS BIGINT)-1 END"
    return f"""
WITH z AS (
  SELECT {zz} AS zz
  FROM (SELECT unnest(tokens) AS t FROM read_parquet('{glob}'))
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN zz < 128 THEN 1 WHEN zz < 16384 THEN 2
                       WHEN zz < 2097152 THEN 3 WHEN zz < 268435456 THEN 4
                       ELSE 5 END) AS BIGINT) AS leb128_bytes
  FROM z
),
pin(tokens_codec, n_tokens, tokens_bytes_out, leb128_bytes) AS (VALUES {vals})
SELECT tokens_codec,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       CAST(p.tokens_bytes_out AS BIGINT) AS tokens_bytes_out,
       CAST(p.leb128_bytes AS BIGINT) AS leb128_bytes
FROM pin p
WHERE (SELECT SUM(n_tokens) FROM pin) = (SELECT n_tokens FROM tot)
  AND (SELECT SUM(leb128_bytes) FROM pin) = (SELECT leb128_bytes FROM tot)
ORDER BY tokens_codec
"""


def boundary_sql() -> str:
    """Oracle for q_boundary_roundtrip: per-(width, codec) sums of the SAME
    fixture literals the engine round-trips — any decode corruption at a
    7-bit boundary breaks the sum equality."""
    from tokenzip.codecs.core import INT_CODECS
    from tokenzip.fixtures import WIDTHS, boundary_values

    def lit(v: int) -> str:
        # BIGINT min cannot be written as a single literal (parsed as
        # unary minus of an out-of-range positive)
        return f"(-9223372036854775807 - 1)" if v == -(1 << 63) else str(v)

    parts = []
    for w in WIDTHS:
        vals = boundary_values(w)
        lst = ", ".join(lit(v) for v in vals)
        for c in sorted(INT_CODECS):
            if c == "svb" and w > 32:
                continue
            parts.append(
                f"SELECT CAST({w} AS BIGINT) AS width, '{c}' AS codec, "
                f"CAST({len(vals)} AS BIGINT) AS n_values, "
                f"(SELECT CAST(SUM(CAST(v AS HUGEINT)) AS BIGINT) "
                f"FROM (SELECT unnest([{lst}]) AS v)) AS sum_decoded"
            )
    return " UNION ALL ".join(parts) + " ORDER BY width, codec"

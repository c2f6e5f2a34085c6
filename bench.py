#!/usr/bin/env python
"""tokenzip benchmark: headline compress / decompress / verify pipelines over
the synthetic token corpus at $GRAFT_SF_DIR scale.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline in two fresh processes (num_cpus=8 and 32) on
the same input and reports both throughputs + scaling efficiency
(the sandbox evidence for the north rule's N vs 4N cluster criterion).

--random-access: scattered-ingest corpus compressed plain vs
cluster_by="doc_id"; measures a 1% doc-id range decompress and a
6-point lookup on both sinks plus the zone-hit census — the measured
clustering-index claim.
"""

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray
    import ray.data
    from ray.data import DataContext

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Ray Data reserves 50% of cluster resources per operator by default;
    # for these short multi-op pipelines the reservation leaves ~60% of the
    # cluster idle (long-lived streaming read generators hold slots while
    # map tasks starve). 0.1 measured: verify 24.1s -> 19.8s at 8 cpus,
    # 2->8 stage efficiency 0.71 -> 0.86.
    ctx.op_resource_reservation_ratio = 0.1

    from tokenzip.corpus import corpus_paths
    from tokenzip.pipeline import (
        compress,
        decompress,
        verify_roundtrip,
        verify_sink_roundtrip,
    )

    paths = corpus_paths(sf_dir)  # deterministic, cached in /tmp
    for p in paths:  # warm the page cache: measure compute, not first disk read
        with open(p, "rb") as f:
            f.read()
    # warm the Ray Data executor + worker pool once (untimed) with the REAL
    # encode path: each worker's first encode task pays native-lib load +
    # malloc arena growth (~0.17 s/worker measured) — spin-up, not steady
    # state. One 64-row batch per CPU touches (nearly) every worker.
    import pyarrow.parquet as _pq
    from tokenzip.pipeline import _encode_fn

    _wt = _pq.read_table(paths[0]).slice(0, 64)
    ray.data.from_arrow([_wt] * ncpu).map_batches(
        _encode_fn, batch_format="pyarrow", zero_copy_batch=True
    ).count()

    out_dir = os.path.join("/tmp/tokenzip_bench", os.path.basename(os.path.normpath(sf_dir)))

    # median-of-N full cycles in one session (host-side demand-paging noise
    # windows measured the same code at 4.7s and 18.4s ninety minutes apart —
    # a single sample is variance-exposed; per-stage medians with spread are
    # the honest headline)
    reps = int(os.environ.get("BENCH_REPS", 3))
    import statistics

    runs: list[dict[str, float]] = []
    totals = None
    for _ in range(reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        queries: dict[str, float] = {}
        t0 = time.time()
        totals = compress(paths, out_dir)
        queries["compress"] = time.time() - t0

        t0 = time.time()
        n_rows = decompress(out_dir).count()
        queries["decompress"] = time.time() - t0
        assert n_rows == totals["n_rows"], (n_rows, totals)

        # fused-consumer decode (decompress_map): the user's fold runs on
        # each decoded chunk inside the decode task — decoded tokens never
        # form block tables. This is the scaling-clean consumer path; the
        # plain decompress above materializes the decoded Dataset through
        # the object store because the Dataset IS its product.
        def _fold(t):
            import numpy as np
            import pyarrow as _pa

            from tokenzip.chunk import _tokens_parts

            lengths, flat = _tokens_parts(t["tokens"])
            return _pa.table(
                {
                    "n_docs": _pa.array([t.num_rows], _pa.int64()),
                    "n_tok": _pa.array([int(lengths.sum())], _pa.int64()),
                    "tok_sum": _pa.array(
                        [int(flat.astype(np.int64).sum())], _pa.int64()
                    ),
                }
            )

        t0 = time.time()
        from tokenzip.pipeline import decompress_map

        fold_df = decompress_map(out_dir, _fold).to_pandas()
        queries["decompress_fold"] = time.time() - t0
        assert fold_df["n_docs"].sum() == totals["n_rows"]
        assert fold_df["n_tok"].sum() == totals["n_tokens"]

        # decode -> write_parquet (the decompress-to-sink shape): decoded
        # blocks feed the writer directly
        t0 = time.time()
        sink_dir = out_dir + "_restored"
        shutil.rmtree(sink_dir, ignore_errors=True)
        decompress(out_dir).write_parquet(sink_dir)
        queries["decompress_sink"] = time.time() - t0
        shutil.rmtree(sink_dir, ignore_errors=True)

        t0 = time.time()
        v = verify_roundtrip(paths).to_pandas()
        queries["verify_roundtrip"] = time.time() - t0
        assert (v["n_docs"] == v["n_equal"]).all(), v

        t0 = time.time()
        vs = verify_sink_roundtrip(paths, out_dir)
        queries["verify_sink"] = time.time() - t0
        assert (vs["n_docs"] == vs["n_equal"]).all(), vs
        assert vs["n_docs"].sum() == totals["n_rows"], vs
        runs.append(queries)

    med = statistics.median
    queries = {k: med(r[k] for r in runs) for k in runs[0]}
    spread = {
        k: [round(min(r[k] for r in runs), 2), round(max(r[k] for r in runs), 2)]
        for k in runs[0]
    }
    # headline value = median of the per-RUN core-stage totals (an actual
    # achieved wall time — a sum of per-stage medians could combine legs no
    # single run achieved); verify_sink is reported alongside in queries
    core = ("compress", "decompress", "verify_roundtrip")
    value = med(sum(r[k] for k in core) for r in runs)
    result = {
        "metric": "tokenzip compress+decompress+verify wall time "
                  f"(median of {reps})",
        "value": round(value, 2),
        "unit": "sec",
        "queries": {k: round(s, 2) for k, s in queries.items()},
        "spread": spread,
        "reps": reps,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": ncpu,
        "n_rows": totals["n_rows"],
        "n_tokens": totals["n_tokens"],
        "bytes_in": totals["bytes_in"],
        "bytes_out": totals["bytes_out"],
        "leb128_bytes": totals["leb128_bytes"],
        "ratio_vs_raw": round(totals["bytes_out"] / max(1, totals["bytes_in"]), 4),
        "ratio_vs_leb128": round(totals["bytes_out"] / max(1, totals["leb128_bytes"]), 4),
        "compress_mtok_per_sec": round(totals["n_tokens"] / queries["compress"] / 1e6, 1),
        "decompress_mtok_per_sec": round(totals["n_tokens"] / queries["decompress"] / 1e6, 1),
        "compress_gb_per_sec": round(totals["bytes_in"] / queries["compress"] / 1e9, 3),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Two fresh sessions, same input, 4x CPU ratio. Defaults to 2 -> 8 on a
    2x-size corpus: per-core DRAM bandwidth on this single box saturates well
    below 32 workers (encode CPU-time inflates ~2.4x from 8 to 32 concurrent
    workers), which models a *bigger node*, not *more nodes* — a 4N-node
    cluster adds 4x memory bandwidth along with 4x cores. The low-concurrency
    pair is the faithful single-box proxy for node-count scaling; the 8->32
    numbers are reported alongside in BASELINE.md with that caveat."""
    import statistics

    lo = int(os.environ.get("SCALE_LO", 2))
    hi = int(os.environ.get("SCALE_HI", 8))
    reps = int(os.environ.get("SCALE_REPS", 3))
    scale_sf = os.environ.get("SCALE_SF", "sfscale")

    def run(ncpu: int) -> dict:
        # each leg is a single cycle — the scaling loop already medians
        # over interleaved reps; nesting medians would cube the wall time
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=scale_sf,
            BENCH_REPS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    from tokenzip.corpus import corpus_paths

    corpus_paths(scale_sf)  # generate once, outside all timed runs
    # median-of-N, legs interleaved so drift of the shared box hits both
    # legs equally (single runs measured +-50% wall variance on this VM)
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    med = statistics.median
    sec_lo = med(r["value"] for r in runs_lo)
    sec_hi = med(r["value"] for r in runs_hi)
    speedup = sec_lo / sec_hi
    eff = speedup / (hi / lo)
    per_query_eff = {
        k: round(
            (med(r["queries"][k] for r in runs_lo)
             / med(r["queries"][k] for r in runs_hi)) / (hi / lo),
            3,
        )
        for k in runs_lo[0]["queries"]
    }
    return {
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, fresh sessions, "
                  f"same input, median of {reps})",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "reps": reps,
        "sec_lo": sec_lo,
        "sec_hi": sec_hi,
        "sec_lo_runs": [r["value"] for r in runs_lo],
        "sec_hi_runs": [r["value"] for r in runs_hi],
        "per_query_efficiency": per_query_eff,
        "queries_lo_median": {
            k: round(med(r["queries"][k] for r in runs_lo), 2)
            for k in runs_lo[0]["queries"]
        },
        "queries_hi_median": {
            k: round(med(r["queries"][k] for r in runs_hi), 2)
            for k in runs_hi[0]["queries"]
        },
        "mtok_per_sec_lo": runs_lo[-1]["n_tokens"] / 1e6 / sec_lo,
        "mtok_per_sec_hi": runs_hi[-1]["n_tokens"] / 1e6 / sec_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": runs_hi[-1]["sf"],
        "n_tokens": runs_hi[-1]["n_tokens"],
    }



# the representative query set for the data-scale sweep: every expensive
# plan shape (scan-agg, equi/as-of join, window fold, LSH dedup shuffle,
# embedding dedup, retrieval) — one wall at sf0.1 and one at a 10x
# key-remapped replication of it, so the linearity claim is measured, not
# extrapolated. Chosen heavy, not exhaustive: the full 111-query suite is
# correctness-gated by `python -m tokenzip audit` at sf0.01.
_SWEEP_QUERIES = [
    "pricing_summary",
    "order_revenue_by_priority",
    "events_asof_orders",
    "events_window_agg",
    "dedup_exact",
    "dedup_minhash",
    "dedup_embedding_ivf",
    "tfidf_topk",
]


def run_scale_sweep(factor: int = 10, reps: int = 3) -> dict:
    """Run the representative query set at sf0.1 and at a ``factor``-x
    deterministic replication (tokenzip.scale.replicate_tables) in ONE Ray
    session at $RAY_GRAFT_CPUS, reporting median walls at both scales and
    the wall ratio per query (ideal = ``factor`` at fixed CPUs; below it
    means the small scale is overhead-bound, far above it means a
    super-linear stage that would not hold at 100 TB)."""
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    base = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sharded layout: one part file per replica — Ray launches one read
    # task per FILE, so the single-file layout serializes the scan (measured:
    # the lone read task was ~75% of pricing_summary's wall at factor 10 and
    # 8->32 cpus gained nothing; sharded, the same query got 3.3x faster)
    big = os.path.join("/tmp/tokenzip_scale", f"x{factor}s")
    if not os.path.exists(os.path.join(big, "lineitem.parquet")):
        from tokenzip.scale import replicate_tables

        replicate_tables(base, big, factor, shard=True)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_ratio = 0.1

    import __ray_entry__ as entrymod

    qs = entrymod.queries()

    def med(vals):
        vals = sorted(vals)
        return vals[len(vals) // 2]

    out = {}
    for name in _SWEEP_QUERIES:
        fn = qs[name]
        walls = {}
        for label, d in [("sf0.1", base), (f"x{factor}", big)]:
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(d)
                runs.append(round(time.perf_counter() - t0, 3))
            walls[label] = {"median": med(runs), "runs": sorted(runs)}
        ratio = walls[f"x{factor}"]["median"] / max(walls["sf0.1"]["median"], 1e-9)
        out[name] = {**walls, "wall_ratio": round(ratio, 2)}
    ray.shutdown()
    return {
        "metric": f"data-scale sweep (sf0.1 vs {factor}x replication, "
                  f"median of {reps}, num_cpus={ncpu})",
        "factor": factor,
        "num_cpus": ncpu,
        "reps": reps,
        "queries": out,
    }


def run_random_access() -> dict:
    """Plain vs clustered layout on a SCATTERED-ingest corpus: compress
    wall, zone-map hit census, and pruned range/point decompress walls."""
    import glob as globmod

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", 3))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from tokenzip.corpus import corpus_paths
    from tokenzip.pipeline import compress, decompress

    paths = corpus_paths(sf_dir)
    scat = "/tmp/tokenzip_bench_scat"
    if not os.path.isdir(scat + "/done"):
        shutil.rmtree(scat, ignore_errors=True)
        os.makedirs(scat)
        tabs = pa.concat_tables([pq.read_table(p) for p in paths])
        perm = np.random.default_rng(1).permutation(len(tabs))
        tabs = tabs.take(perm)
        cut = np.linspace(0, len(tabs), 33).astype(int)
        for i in range(32):
            pq.write_table(
                tabs.slice(cut[i], cut[i + 1] - cut[i]),
                f"{scat}/part-{i:04d}.parquet",
            )
        os.makedirs(scat + "/done")
    spaths = sorted(globmod.glob(scat + "/part-*.parquet"))
    n_docs = sum(pq.ParquetFile(p).metadata.num_rows for p in spaths)
    lo = f"doc-{n_docs // 100:08d}"
    hi = f"doc-{2 * (n_docs // 100) - 1:08d}"
    points = [f"doc-{(i * n_docs) // 7:08d}" for i in range(6)]

    out = {}
    for mode, kw in (("plain", {}), ("clustered", {"cluster_by": "doc_id"})):
        d = f"/tmp/tokenzip_bench_ra_{mode}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.perf_counter()
        tot = compress(spaths, d, **kw)
        wall_c = time.perf_counter() - t0
        hits = tts = 0
        for f in globmod.glob(d + "/chunks/frag=*/*.parquet"):
            t = pq.read_table(f, columns=["did_min", "did_max"])
            mn, mx = t["did_min"].to_pylist(), t["did_max"].to_pylist()
            tts += len(mn)
            hits += sum(1 for a, b in zip(mn, mx) if a <= hi and b >= lo)
        rw, pw = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            nr = decompress(d, doc_id_range=(lo, hi)).count()
            rw.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            decompress(d, doc_ids=points).count()
            pw.append(time.perf_counter() - t0)
        out[mode] = {
            "compress_s": round(wall_c, 2),
            "bytes_out": int(tot["bytes_out"]),
            "chunks": int(tot["n_chunks"]),
            "zone_hits": f"{hits}/{tts}",
            "range_rows": int(nr),
            "range_decompress_s": round(sorted(rw)[len(rw) // 2], 2),
            "point_decompress_s": round(sorted(pw)[len(pw) // 2], 2),
        }
    ray.shutdown()
    return {
        "metric": "random access: plain vs clustered layout on scattered "
                  f"ingest (median of {reps}, num_cpus={ncpu})",
        "sf": os.path.basename(sf_dir),
        "num_cpus": ncpu,
        "layouts": out,
    }


if __name__ == "__main__":
    if "--scale-sweep" in sys.argv:
        print(json.dumps(run_scale_sweep()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--random-access" in sys.argv:
        print(json.dumps(run_random_access()))
    else:
        print(json.dumps(run_bench()))

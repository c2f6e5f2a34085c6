#!/usr/bin/env python
"""tokenzip benchmark: headline compress / decompress / verify pipelines over
the synthetic token corpus at $GRAFT_SF_DIR scale.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline in two fresh processes (num_cpus=8 and 32) on
the same input and reports both throughputs + scaling efficiency
(the sandbox evidence for the north rule's N vs 4N cluster criterion).
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
    DataContext.get_current().enable_progress_bars = False

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
    # warm the Ray Data executor + worker pool once (untimed) so the first
    # timed query doesn't pay cluster spin-up
    ray.data.read_parquet(paths[:1]).map_batches(
        lambda b: b.slice(0, 1), batch_format="pyarrow"
    ).count()

    out_dir = os.path.join("/tmp/tokenzip_bench", os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)

    queries: dict[str, float] = {}
    t0 = time.time()
    totals = compress(paths, out_dir)
    queries["compress"] = time.time() - t0

    t0 = time.time()
    n_rows = decompress(out_dir).count()
    queries["decompress"] = time.time() - t0
    assert n_rows == totals["n_rows"], (n_rows, totals)

    t0 = time.time()
    v = verify_roundtrip(paths).to_pandas()
    queries["verify_roundtrip"] = time.time() - t0
    assert (v["n_docs"] == v["n_equal"]).all(), v

    t0 = time.time()
    vs = verify_sink_roundtrip(paths, out_dir)
    queries["verify_sink"] = time.time() - t0
    assert (vs["n_docs"] == vs["n_equal"]).all(), vs
    assert vs["n_docs"].sum() == totals["n_rows"], vs

    # headline value = the three core stages (round-over-round comparable);
    # verify_sink is reported alongside in queries
    value = sum(queries[k] for k in ("compress", "decompress", "verify_roundtrip"))
    result = {
        "metric": "tokenzip compress+decompress+verify wall time",
        "value": round(value, 2),
        "unit": "sec",
        "queries": {k: round(s, 2) for k, s in queries.items()},
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
    lo = int(os.environ.get("SCALE_LO", 2))
    hi = int(os.environ.get("SCALE_HI", 8))
    scale_sf = os.environ.get("SCALE_SF", "sfscale")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=scale_sf)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    from tokenzip.corpus import corpus_paths

    corpus_paths(scale_sf)  # generate once, outside both timed runs
    r_lo, r_hi = run(lo), run(hi)
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    per_query_eff = {
        k: round((r_lo["queries"][k] / r_hi["queries"][k]) / (hi / lo), 3)
        for k in r_lo["queries"]
    }
    return {
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
        "per_query_efficiency": per_query_eff,
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, fresh sessions, same input)",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "mtok_per_sec_lo": r_lo["compress_mtok_per_sec"],
        "mtok_per_sec_hi": r_hi["compress_mtok_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
        "n_tokens": r_hi["n_tokens"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

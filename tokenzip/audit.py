"""One-command oracle sweep over the whole query surface.

``python -m tokenzip audit`` runs EVERY ``__ray_entry__.queries()`` entry
against its ``oracle_sql()`` in DuckDB with the driver's exact compare rule
(sort columns by name, sort rows by every column, md5 of the csv rendering)
and writes an ``AUDIT.json``.  The per-round driver only checks a subset of
the queries; this sweep is the CI-style insurance that the uncovered rest
can't silently regress between rounds.

Model: the reference's all-vector ``check()`` sweep
(/root/reference/src/lib.rs:71-85, 297-353) — one call validates the whole
surface, not just the vectors a caller happens to exercise.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time
from typing import Any

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _vhash(df) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def _load_entry():
    """Import __ray_entry__ from the repo root (the package's parent dir),
    regardless of the caller's cwd — Ray workers resolve tokenzip off the
    driver cwd, but the audit driver itself must not depend on it."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("__ray_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__ray_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def run_audit(
    sf_dir: str = "/root/testdata/sf0.01",
    names: list[str] | None = None,
    out_path: str | None = None,
    verbose: bool = True,
) -> dict[str, Any]:
    """Run queries() vs oracle_sql() and return {name: result} (also written
    to ``out_path`` if given). A result is either
    ``{rows, schema, hash, n, sec}`` (oracle-checked),
    ``{rows_only, n, sec}`` (no SQL oracle — the weaker driver check), or
    ``{error, sec}``."""
    import duckdb
    import pandas as pd

    entry = _load_entry()
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, Any] = {}
    todo = [n for n in qs if not names or n in names]
    unknown = set(names or []) - set(qs)
    if unknown:
        raise SystemExit(f"audit: unknown query names {sorted(unknown)}")
    for i, name in enumerate(todo):
        t0 = time.time()
        try:
            res = qs[name](sf_dir)
            rdf = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {
                    "rows_only": len(rdf) >= 0,
                    "n": len(rdf),
                    "sec": round(time.time() - t0, 1),
                }
            else:
                odf = con.execute(sql).fetchdf()
                r, o = _norm(rdf), _norm(odf)
                ok_rows = len(r) == len(o)
                ok_schema = list(r.columns) == list(o.columns)
                ok_hash = (
                    _vhash(r) == _vhash(o) if (ok_rows and ok_schema) else False
                )
                results[name] = {
                    "rows": ok_rows,
                    "schema": ok_schema,
                    "hash": ok_hash,
                    "n": len(r),
                    "sec": round(time.time() - t0, 1),
                }
                if not ok_hash:
                    results[name]["ray_cols"] = list(r.columns)
                    results[name]["oracle_cols"] = list(o.columns)
        except Exception as ex:  # noqa: BLE001 — a sweep must finish
            results[name] = {
                "error": f"{type(ex).__name__}: {ex}"[:300],
                "sec": round(time.time() - t0, 1),
            }
        if verbose:
            r = results[name]
            status = (
                "ERROR"
                if "error" in r
                else "ok(rows-only)"
                if "rows_only" in r
                else ("OK" if r["hash"] else "MISMATCH")
            )
            print(
                f"[{i + 1}/{len(todo)}] {name}: {status} ({r['sec']}s)",
                file=sys.stderr,
                flush=True,
            )

    bad = sorted(
        k
        for k, v in results.items()
        if "error" in v or v.get("hash") is False or v.get("rows_only") is False
    )
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(todo),
        "n_oracle_checked": sum(1 for v in results.values() if "hash" in v),
        "n_rows_only": sum(1 for v in results.values() if "rows_only" in v),
        "bad": bad,
        "results": results,
    }
    if out_path:
        tmp = out_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        os.replace(tmp, out_path)
    return summary

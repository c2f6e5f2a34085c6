"""CLI entry points: the ``ray job submit``-able surface of the engine.

    python -m tokenzip compress    <input_dir_or_glob> <out_dir> [--shared-tables]
    python -m tokenzip decompress  <out_dir> <restored_dir>
    python -m tokenzip verify      <input_dir_or_glob>
    python -m tokenzip verify-sink <input_dir_or_glob> <out_dir>
    python -m tokenzip stats       <out_dir>
    python -m tokenzip table-compress   <input_dir_or_glob> <out_dir>
    python -m tokenzip table-decompress <out_dir> <restored_dir>
    python -m tokenzip pack        <sf_dir_or_corpus> <out_dir> [--seq-len N]
    python -m tokenzip upsert      <in_sink> <out_sink> <new.parquet> [...]
    python -m tokenzip audit       [--query NAME ...] [--sf-dir D] [--out AUDIT.json]

Owns its Ray session (guarded init; the library itself never calls
ray.init) — submit with ``ray job submit -- python -m tokenzip compress ...``
on a real cluster.
"""

from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import sys


def _paths(spec: str) -> list[str]:
    if os.path.isdir(spec):
        found = sorted(
            os.path.join(spec, f) for f in os.listdir(spec) if f.endswith(".parquet")
        )
    else:
        found = sorted(globmod.glob(spec))
    if not found:
        raise SystemExit(f"tokenzip: no parquet files found at {spec!r}")
    return found


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tokenzip")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress", help="compress a token table to chunk parquet + manifest")
    c.add_argument("input"), c.add_argument("out_dir")
    c.add_argument("--shared-tables", action="store_true")
    c.add_argument("--tokens-codec", default="auto")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument(
        "--shuffle-by-source", action="store_true",
        help="skew isolation: one doc-hash groupby shuffle before encode "
             "so a skewed source's long docs spread across encode tasks",
    )
    c.add_argument(
        "--cluster-by", choices=["doc_id"], default=None,
        help="layout optimization: one range-partitioned shuffle + in-group "
             "sort so chunk [did_min, did_max] windows are tight — point/"
             "range decompress prunes to the few chunks that can hold the "
             "request",
    )

    d = sub.add_parser("decompress", help="restore the original table from chunks")
    d.add_argument("out_dir"), d.add_argument("restored_dir")
    d.add_argument(
        "--sources",
        default=None,
        help="comma-separated source subset; single-source chunks outside "
             "it are pruned at the parquet read (storage-level pushdown)",
    )
    d.add_argument(
        "--doc-range",
        default=None,
        metavar="LO:HI",
        help="inclusive lexicographic doc_id range; chunks whose "
             "did_min/did_max zone map misses it never leave storage",
    )
    d.add_argument(
        "--doc-ids",
        default=None,
        help="comma-separated doc_id point lookups (zone-map pruned; "
             "format-3 sinks also prune on per-chunk doc-id blooms)",
    )
    d.add_argument(
        "--columns",
        default=None,
        help="comma-separated output columns (doc_id,tokens,n_tok,source); "
             "unrequested streams are neither read from storage nor decoded",
    )

    ing = sub.add_parser(
        "ingest",
        help="JSONL or CSV documents -> canonical token-schema parquet "
             "shards (CSV carries tokens space-joined in one column)",
    )
    ing.add_argument("input", help="JSONL/CSV file, directory, or glob")
    ing.add_argument("dst_dir")

    cp = sub.add_parser(
        "compact", help="merge a sink's chunk files into ~target-size files"
    )
    cp.add_argument("out_dir"), cp.add_argument("dst_dir")
    cp.add_argument("--target-mb", type=int, default=256)

    rc = sub.add_parser(
        "recode", help="migrate a sink to a new codec regime (decode fused "
        "with re-encode; the corpus never materializes)"
    )
    rc.add_argument("in_dir"), rc.add_argument("out_dir")
    rc.add_argument("--codec", default="auto", help="tokens codec for the new sink")
    rc.add_argument("--no-resume", action="store_true")

    rt = sub.add_parser(
        "table-recode", help="migrate a generic-table sink to the current "
        "format/codec regime (fused decode->re-encode)"
    )
    rt.add_argument("in_dir"), rt.add_argument("out_dir")
    rt.add_argument("--no-resume", action="store_true")

    de = sub.add_parser(
        "delete", help="delete doc ids from a sink (bloom/zone-pruned "
        "selective rewrite; clean fragments are byte-copied)"
    )
    de.add_argument("in_dir"), de.add_argument("out_dir")
    de.add_argument("--ids", help="comma-separated doc ids")
    de.add_argument("--ids-file", help="file with one doc id per line")
    de.add_argument("--no-resume", action="store_true")

    up = sub.add_parser(
        "upsert", help="MERGE parquet fragments into a sink (latest-wins "
        "by doc_id: stale versions evicted via the delete path, new "
        "fragments appended under the manifest)"
    )
    up.add_argument("in_dir"), up.add_argument("out_dir")
    up.add_argument("new_paths", nargs="+", help="parquet fragment(s) to merge")
    up.add_argument("--codec", default="auto")
    up.add_argument("--no-resume", action="store_true")

    tde = sub.add_parser(
        "table-delete", help="DELETE WHERE lo<=col<=hi from a generic-table "
        "sink (zone-classified: contained chunks drop on metadata, disjoint "
        "fragments byte-copy, straddlers rewrite)"
    )
    tde.add_argument("in_dir"), tde.add_argument("out_dir")
    tde.add_argument("--where", required=True, help="COL:LO:HI (ints or strings)")
    tde.add_argument("--no-resume", action="store_true")

    tdc = sub.add_parser(
        "table-drop-column", help="zero-decode DROP COLUMN on a table sink"
    )
    tdc.add_argument("in_dir"), tdc.add_argument("out_dir"), tdc.add_argument("col")
    tdc.add_argument("--no-resume", action="store_true")

    trc = sub.add_parser(
        "table-rename-column", help="zero-decode RENAME COLUMN on a table sink"
    )
    trc.add_argument("in_dir"), trc.add_argument("out_dir")
    trc.add_argument("old"), trc.add_argument("new")
    trc.add_argument("--no-resume", action="store_true")

    tac = sub.add_parser(
        "table-add-column",
        help="zero-decode ADD COLUMN <col> <dtype> DEFAULT <value> on a "
        "table sink (constant or NULL column synthesized per chunk row; "
        "existing payload bytes untouched)",
    )
    tac.add_argument("in_dir"), tac.add_argument("out_dir")
    tac.add_argument("col"), tac.add_argument("dtype")
    tac.add_argument(
        "--default", default=None,
        help="constant default value (omit for an all-NULL column)",
    )
    tac.add_argument("--no-resume", action="store_true")

    v = sub.add_parser("verify", help="encode->decode->equality over an input table")
    v.add_argument("input")

    vs = sub.add_parser(
        "verify-sink",
        help="decode the WRITTEN chunks and join them to the input by doc_id",
    )
    vs.add_argument("input"), vs.add_argument("out_dir")

    st = sub.add_parser("stats", help="print the manifest totals of a run")
    st.add_argument("out_dir")

    fs = sub.add_parser(
        "fsck", help="standalone sink integrity check: every chunk decodes "
        "and every pruning-relevant metadata field (n_rows, n_tokens, "
        "n_tok, zone windows, blooms, manifest ledger) is re-derived and "
        "compared; exit 1 on violations"
    )
    fs.add_argument("out_dir")
    fs.add_argument(
        "--sample", type=float, default=1.0,
        help="scrub a deterministic fraction of chunk files (0 < f <= 1); "
             "repeated scrubs compose into full coverage",
    )

    tc = sub.add_parser(
        "table-compress", help="compress ANY parquet table (generic columns)"
    )
    tc.add_argument("input"), tc.add_argument("out_dir")
    tc.add_argument("--no-resume", action="store_true")

    td = sub.add_parser("table-decompress", help="restore a generic table")
    td.add_argument("out_dir"), td.add_argument("restored_dir")
    td.add_argument(
        "--where",
        default=None,
        metavar="COL:LO:HI",
        help="zone-map-pruned range restore: only rows with LO <= COL <= HI "
        "(int64 storage units for int/timestamp columns; lexicographic for "
        "string columns — non-integer bounds are passed as strings, use "
        "LO == HI for equality); chunks outside never leave storage",
    )
    td.add_argument(
        "--columns",
        default=None,
        help="comma-separated output columns; unrequested columns' blobs "
             "are never decoded",
    )

    pk = sub.add_parser(
        "pack", help="pack token docs into fixed-length training sequences"
    )
    pk.add_argument("sf_dir"), pk.add_argument("out_dir")
    pk.add_argument("--seq-len", type=int, default=2048)

    au = sub.add_parser(
        "audit",
        help="run EVERY queries() entry vs its oracle_sql() (the driver's "
             "rows/schema/hash rule) and write AUDIT.json",
    )
    au.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    au.add_argument(
        "--query", action="append", default=None,
        help="audit only this query (repeatable); default: all",
    )
    au.add_argument("--out", default="AUDIT.json")

    ms = sub.add_parser(
        "make-scale",
        help="tile the relational testdata N x with per-replica key remap "
             "(PKs stay unique, FK edges stay in-replica) for scale benches",
    )
    ms.add_argument("src_dir"), ms.add_argument("dst_dir")
    ms.add_argument("--factor", type=int, default=10)
    ms.add_argument(
        "--shard", action="store_true",
        help="write each fact table as a directory of one part file per "
             "replica (parallel reads; single files serialize the scan)",
    )

    pn = sub.add_parser(
        "pins", help="recompute every pinned oracle constant and rewrite it in-place"
    )
    pn.add_argument("--tokens-sf", default="sf0.01")
    pn.add_argument("--data-dir", default="/root/testdata/sf0.01")
    pn.add_argument(
        "--check", action="store_true",
        help="recompute only; exit 1 if any pin would change (no writes)",
    )

    args = ap.parse_args(argv)

    if args.cmd == "stats":  # no Ray needed
        with open(os.path.join(args.out_dir, "manifest.json")) as f:
            man = json.load(f)
        print(json.dumps(man.get("totals", {}), indent=1, sort_keys=True))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 0)) or None,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "fsck":
            from tokenzip.errors import ChunkFormatError
            from tokenzip.pipeline import fsck

            try:
                print(
                    json.dumps(
                        fsck(args.out_dir, sample=args.sample), sort_keys=True
                    )
                )
            except ChunkFormatError as e:
                print(json.dumps({"ok": False, "error": str(e)[:2000]}))
                return 1
        elif args.cmd == "compress":
            from tokenzip.pipeline import compress

            totals = compress(
                _paths(args.input),
                args.out_dir,
                tokens_codec=args.tokens_codec,
                resume=not args.no_resume,
                shared_tables=args.shared_tables,
                shuffle_by_source=args.shuffle_by_source,
                cluster_by=args.cluster_by,
            )
            print(json.dumps(totals, sort_keys=True))
        elif args.cmd == "decompress":
            from tokenzip.pipeline import decompress

            srcs = args.sources.split(",") if args.sources else None
            rng = tuple(args.doc_range.split(":", 1)) if args.doc_range else None
            ids = args.doc_ids.split(",") if args.doc_ids else None
            cols = args.columns.split(",") if args.columns else None
            ds = decompress(
                args.out_dir, sources=srcs, doc_id_range=rng, doc_ids=ids,
                columns=cols,
            )
            ds.write_parquet(args.restored_dir)
            print(json.dumps({"rows": "written", "dir": args.restored_dir}))
        elif args.cmd == "ingest":
            from tokenzip.sources import read_tokens_csv, read_tokens_jsonl

            if os.path.isdir(args.input):
                paths = sorted(
                    os.path.join(args.input, f)
                    for f in os.listdir(args.input)
                    if f.endswith((".jsonl", ".json", ".csv"))
                )
            elif "*" in args.input:
                paths = sorted(globmod.glob(args.input))
            else:
                paths = [args.input]
            if not paths:
                raise SystemExit(
                    f"tokenzip: no jsonl/csv files found at {args.input!r}"
                )
            csvs = [p for p in paths if p.endswith(".csv")]
            if csvs and len(csvs) != len(paths):
                raise SystemExit("tokenzip: mixed csv and jsonl inputs")
            reader = read_tokens_csv if csvs else read_tokens_jsonl
            reader(paths).write_parquet(args.dst_dir)
            print(json.dumps({"rows": "written", "dir": args.dst_dir}))
        elif args.cmd == "recode":
            from tokenzip.pipeline import recode

            res = recode(
                args.in_dir, args.out_dir,
                tokens_codec=args.codec,
                resume=not args.no_resume,
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "delete":
            from tokenzip.pipeline import delete_docs

            ids: list[str] = []
            if args.ids:
                ids.extend(s for s in args.ids.split(",") if s)
            if args.ids_file:
                with open(args.ids_file) as fh:
                    ids.extend(ln.strip() for ln in fh if ln.strip())
            res = delete_docs(
                args.in_dir, args.out_dir, ids, resume=not args.no_resume
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "upsert":
            from tokenzip.pipeline import upsert_docs

            res = upsert_docs(
                args.in_dir, args.out_dir, args.new_paths,
                tokens_codec=args.codec, resume=not args.no_resume,
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "table-recode":
            from tokenzip.table import recode_table

            res = recode_table(
                args.in_dir, args.out_dir, resume=not args.no_resume
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "compact":
            from tokenzip.pipeline import compact

            res = compact(
                args.out_dir, args.dst_dir,
                target_bytes=args.target_mb << 20,
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "verify":
            from tokenzip.pipeline import verify_roundtrip

            df = verify_roundtrip(_paths(args.input)).to_pandas()
            ok = bool((df["n_docs"] == df["n_equal"]).all())
            print(df.to_string(index=False))
            print(json.dumps({"all_equal": ok}))
            return 0 if ok else 1
        elif args.cmd == "verify-sink":
            from tokenzip.pipeline import verify_sink_roundtrip

            df = verify_sink_roundtrip(_paths(args.input), args.out_dir)
            ok = bool((df["n_docs"] == df["n_equal"]).all())
            print(df.to_string(index=False))
            print(json.dumps({"all_equal": ok}))
            return 0 if ok else 1
        elif args.cmd == "table-compress":
            from tokenzip.table import compress_table

            totals = compress_table(
                _paths(args.input), args.out_dir, resume=not args.no_resume
            )
            print(json.dumps(totals, sort_keys=True))
        elif args.cmd == "table-decompress":
            from tokenzip.table import decompress_table

            where = None
            if args.where:
                col, lo, hi = args.where.rsplit(":", 2)
                try:
                    where = (col, int(lo), int(hi))
                except ValueError:
                    where = (col, lo, hi)  # string zone maps
            cols = args.columns.split(",") if args.columns else None
            decompress_table(args.out_dir, where=where, columns=cols).write_parquet(
                args.restored_dir
            )
            print(json.dumps({"rows": "written", "dir": args.restored_dir}))
        elif args.cmd == "table-delete":
            from tokenzip.table import delete_rows

            col, lo, hi = args.where.rsplit(":", 2)
            try:
                where = (col, int(lo), int(hi))
            except ValueError:
                where = (col, lo, hi)  # string zone maps
            res = delete_rows(
                args.in_dir, args.out_dir, where, resume=not args.no_resume
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "table-drop-column":
            from tokenzip.table import drop_column

            res = drop_column(
                args.in_dir, args.out_dir, args.col, resume=not args.no_resume
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "table-rename-column":
            from tokenzip.table import rename_column

            res = rename_column(
                args.in_dir, args.out_dir, args.old, args.new,
                resume=not args.no_resume,
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "table-add-column":
            from tokenzip.table import add_column

            res = add_column(
                args.in_dir, args.out_dir, args.col, args.dtype,
                args.default, resume=not args.no_resume,
            )
            print(json.dumps(res, sort_keys=True))
        elif args.cmd == "audit":
            from tokenzip.audit import run_audit

            summary = run_audit(
                sf_dir=args.sf_dir, names=args.query, out_path=args.out
            )
            print(
                json.dumps(
                    {k: v for k, v in summary.items() if k != "results"},
                    indent=1,
                    sort_keys=True,
                )
            )
            return 1 if summary["bad"] else 0
        elif args.cmd == "make-scale":
            from tokenzip.scale import replicate_tables

            counts = replicate_tables(
                args.src_dir, args.dst_dir, args.factor, shard=args.shard
            )
            print(json.dumps({"factor": args.factor, "rows": counts}, sort_keys=True))
        elif args.cmd == "pins":
            from tokenzip.pins import regenerate

            res = regenerate(
                tokens_sf=args.tokens_sf,
                data_dir=args.data_dir,
                write=not args.check,
            )
            print(json.dumps(res, sort_keys=True))
            if args.check and any(v["changed"] for v in res.values()):
                return 1
        elif args.cmd == "pack":
            import shutil
            import tempfile

            from tokenzip.training import pack_sequences

            # own the offset-sidecar workdir so repeated CLI runs don't
            # accumulate unbounded /tmp scratch (the returned Dataset is
            # lazy, so pack_sequences itself can't self-clean)
            workdir = tempfile.mkdtemp(prefix="tokenzip_pack_cli_")
            try:
                ds = pack_sequences(
                    args.sf_dir, seq_len=args.seq_len, workdir=workdir
                )
                ds.write_parquet(args.out_dir)
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
            print(json.dumps({"dir": args.out_dir, "seq_len": args.seq_len}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

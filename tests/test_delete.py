"""Targeted sink deletion (pipeline.delete_docs): content equality,
fragment-touch minimality (clean fragments byte-copied, never re-encoded),
manifest lineage, the new = old - deleted drift guard, and error paths."""

import os

import pyarrow.parquet as pq
import pytest

from tokenzip.corpus import corpus_paths
from tokenzip.pipeline import compress, decompress, delete_docs


@pytest.fixture(scope="module")
def paths(ray_session):
    return corpus_paths("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def src_sink(ray_session, paths, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("delsrc") / "sink")
    compress(paths, out, concurrency=2)
    return out


def _frag_bytes(sink: str) -> dict[str, dict[str, bytes]]:
    """frag -> {filename: raw bytes} of a sink's chunk files."""
    chunks = os.path.join(sink, "chunks")
    out = {}
    for d in sorted(os.listdir(chunks)):
        if not d.startswith("frag="):
            continue
        fdir = os.path.join(chunks, d)
        out[d.split("=", 1)[1]] = {
            n: open(os.path.join(fdir, n), "rb").read()
            for n in sorted(os.listdir(fdir))
            if n.endswith(".parquet")
        }
    return out


def test_delete_content_and_lineage(ray_session, paths, src_sink, tmp_path):
    orig = decompress(src_sink).to_pandas()
    ids = sorted(orig["doc_id"])[::13][:30]
    dst = str(tmp_path / "dst")
    t = delete_docs(src_sink, dst, ids, resume=False)
    assert t["n_docs_deleted"] == len(ids)
    want = orig[~orig["doc_id"].isin(ids)].sort_values("doc_id").reset_index(drop=True)
    got = decompress(dst).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) == len(orig) - len(ids)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["source"] == want["source"]).all()
    assert (got["n_tok"] == want["n_tok"]).all()
    for a, b in zip(got["tokens"], want["tokens"]):
        assert len(a) == len(b) and (a == b).all()
    assert t["n_tokens_deleted"] == int(
        orig[orig["doc_id"].isin(ids)]["n_tok"].sum()
    )
    assert t["n_rows"] == len(orig) - len(ids)
    # per-fragment lineage recorded
    import json

    man = json.load(open(os.path.join(dst, "manifest.json")))
    fr = man["fragments"]
    assert sum(s.get("n_docs_deleted", 0) for s in fr.values()) == len(ids)
    assert all(s.get("deleted_from") == src_sink for s in fr.values())


def test_delete_clean_fragments_byte_copied(ray_session, paths, src_sink, tmp_path):
    """Ids clustered in ONE input shard: only that fragment's files may
    differ; every other fragment must be a byte-identical copy (the
    100-TB claim: deletion is priced at the fragments touched)."""
    t0 = pq.read_table(paths[0], columns=["doc_id"])
    ids = [str(d) for d in t0["doc_id"].to_pylist()[:5]]
    dst = str(tmp_path / "dst")
    t = delete_docs(src_sink, dst, ids, resume=False)
    assert t["n_docs_deleted"] == 5
    src_b = _frag_bytes(src_sink)
    dst_b = _frag_bytes(dst)
    assert set(src_b) == set(dst_b)
    changed = [f for f in src_b if src_b[f] != dst_b[f]]
    # the bloom has a tiny fpr, so "exactly one" could rarely be "a few";
    # the claim under test is that a 1-shard deletion never touches most
    # of a 32-fragment sink
    assert len(changed) <= 2, changed
    for f in src_b:
        if f not in changed:
            assert src_b[f] == dst_b[f]  # byte-for-byte copy


def test_delete_absent_ids_is_a_copy(ray_session, paths, src_sink, tmp_path):
    dst = str(tmp_path / "dst")
    t = delete_docs(src_sink, dst, ["doc-zzz-not-there"], resume=False)
    assert t["n_docs_deleted"] == 0 and t["n_tokens_deleted"] == 0
    src_b = _frag_bytes(src_sink)
    dst_b = _frag_bytes(dst)
    # zone maps may range-hit but blooms prove absence: everything copies
    assert src_b == dst_b
    orig = decompress(src_sink).to_pandas()
    got = decompress(dst).to_pandas()
    assert len(got) == len(orig)


def test_delete_resume_is_noop(ray_session, paths, src_sink, tmp_path):
    orig = decompress(src_sink).to_pandas()
    ids = sorted(orig["doc_id"])[:3]
    dst = str(tmp_path / "dst")
    t1 = delete_docs(src_sink, dst, ids, resume=False)
    before = _frag_bytes(dst)
    t2 = delete_docs(src_sink, dst, ids, resume=True)
    assert t2["n_docs_deleted"] == t1["n_docs_deleted"] == 3
    assert t2["n_rows"] == t1["n_rows"]
    assert _frag_bytes(dst) == before


def test_delete_error_paths(ray_session, src_sink, tmp_path):
    from tokenzip.errors import ChunkFormatError

    with pytest.raises(ValueError, match="empty doc_ids"):
        delete_docs(src_sink, str(tmp_path / "x"), [])
    with pytest.raises(ChunkFormatError):
        delete_docs(str(tmp_path / "nosink"), str(tmp_path / "y"), ["a"])


def test_delete_from_compacted_sink_and_compact_after_delete(
    ray_session, paths, src_sink, tmp_path
):
    """delete_docs composes with compaction in both orders: deleting from a
    compacted sink (fragment names are synthetic there) and compacting a
    deleted sink both decode to corpus-minus-ids."""
    from tokenzip.pipeline import compact

    orig = decompress(src_sink).to_pandas()
    ids = sorted(orig["doc_id"])[5:25:2]
    want = set(orig["doc_id"]) - set(ids)

    cmp_sink = str(tmp_path / "cmp")
    compact(src_sink, cmp_sink, target_bytes=64 << 10)
    d1 = str(tmp_path / "d1")
    t1 = delete_docs(cmp_sink, d1, ids, resume=False)
    assert t1["n_docs_deleted"] == len(ids)
    got1 = set(decompress(d1).to_pandas()["doc_id"])
    assert got1 == want

    d2 = str(tmp_path / "d2")
    delete_docs(src_sink, d2, ids, resume=False)
    c2 = str(tmp_path / "c2")
    compact(d2, c2, target_bytes=64 << 10)
    got2 = set(decompress(c2).to_pandas()["doc_id"])
    assert got2 == want


def test_delete_from_shared_tables_sink(ray_session, paths, tmp_path):
    """Deleting from a shared-tables (srank sidecar) sink: pass-through
    chunks still decode against the copied sidecar, rewritten chunks fall
    back to self-contained codecs, and content equals corpus-minus-ids."""
    src = str(tmp_path / "st")
    compress(paths, src, shared_tables=True, concurrency=2)
    orig = decompress(src).to_pandas()
    ids = sorted(orig["doc_id"])[10:40:3]
    dst = str(tmp_path / "st_del")
    t = delete_docs(src, dst, ids, resume=False)
    assert t["n_docs_deleted"] == len(ids)
    assert os.path.exists(os.path.join(dst, "symbols.json"))
    got = decompress(dst).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        orig[~orig["doc_id"].isin(ids)].sort_values("doc_id").reset_index(drop=True)
    )
    assert (got["doc_id"] == want["doc_id"]).all()
    for a, b in zip(got["tokens"], want["tokens"]):
        assert len(a) == len(b) and (a == b).all()


def test_delete_resume_after_partial_failure(ray_session, paths, src_sink, tmp_path):
    """Simulated mid-run failure: wipe one fragment's output and its
    manifest record; resume re-does ONLY that fragment (other fragments'
    files untouched, byte-identical) and converges to the same sink."""
    import json
    import shutil

    orig = decompress(src_sink).to_pandas()
    ids = sorted(orig["doc_id"])[::11][:20]
    dst = str(tmp_path / "dst")
    t1 = delete_docs(src_sink, dst, ids, resume=False)
    full = _frag_bytes(dst)
    victim = sorted(full)[0]
    shutil.rmtree(os.path.join(dst, "chunks", f"frag={victim}"))
    mpath = os.path.join(dst, "manifest.json")
    man = json.load(open(mpath))
    del man["fragments"][victim]
    json.dump(man, open(mpath, "w"))
    before = {f: b for f, b in _frag_bytes(dst).items()}
    t2 = delete_docs(src_sink, dst, ids, resume=True)
    after = _frag_bytes(dst)
    assert set(after) == set(full)  # the victim fragment came back
    for f in before:  # untouched fragments were not rewritten
        assert after[f] == before[f]
    # content converges exactly (chunk file bytes of a REWRITTEN fragment
    # may legally differ across runs: chunk boundaries follow batch
    # composition, and the resume run batches only the victim's rows)
    want = orig[~orig["doc_id"].isin(ids)]
    got = decompress(dst).to_pandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert t2["n_rows"] == t1["n_rows"]
    assert t2["n_docs_deleted"] == t1["n_docs_deleted"]


# ---------------------------------------------------------------------------
# MERGE (pipeline.upsert_docs): latest-wins replace-or-insert
# ---------------------------------------------------------------------------


def _write_update(tmp_path, orig, upd_ids, new_rows):
    """Parquet update fragment: existing ids with token 99 appended,
    plus brand-new (doc_id, tokens, source) rows."""
    import numpy as np
    import pyarrow as pa

    dids, toks, srcs = [], [], []
    for _, r in orig[orig["doc_id"].isin(upd_ids)].iterrows():
        dids.append(r["doc_id"])
        toks.append(list(np.asarray(r["tokens"], np.int32)) + [99])
        srcs.append(r["source"])
    for d, t, s in new_rows:
        dids.append(d)
        toks.append(t)
        srcs.append(s)
    tab = pa.table(
        {
            "doc_id": pa.array(dids, pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": pa.array(srcs, pa.string()),
        }
    )
    p = str(tmp_path / "update-0000.parquet")
    pq.write_table(tab, p)
    return p


def test_upsert_replace_and_insert(ray_session, paths, src_sink, tmp_path):
    from tokenzip.pipeline import upsert_docs

    orig = decompress(src_sink).to_pandas()
    upd_ids = sorted(orig["doc_id"])[::17][:10]
    new_rows = [("zzz-new-1", [1, 2, 3], "web"), ("zzz-new-2", [5], "code")]
    p = _write_update(tmp_path, orig, upd_ids, new_rows)
    dst = str(tmp_path / "dst")
    t = upsert_docs(src_sink, dst, [p])
    assert t["n_docs_replaced"] == len(upd_ids)
    assert t["n_docs_inserted"] == len(new_rows)
    assert t["n_rows"] == len(orig) + len(new_rows)
    got = decompress(dst).to_pandas().set_index("doc_id")
    # replaced docs carry the sentinel, exactly once
    for d in upd_ids:
        old = orig[orig["doc_id"] == d]["tokens"].iloc[0]
        new = got.loc[d, "tokens"]
        assert len(new) == len(old) + 1 and new[-1] == 99
    # inserted docs exist with their content
    assert list(got.loc["zzz-new-1", "tokens"]) == [1, 2, 3]
    assert got.loc["zzz-new-2", "source"] == "code"
    # untouched docs are bit-identical
    keep = orig[~orig["doc_id"].isin(upd_ids)]
    sample = keep.sample(20, random_state=7)
    for _, r in sample.iterrows():
        assert (got.loc[r["doc_id"], "tokens"] == r["tokens"]).all()


def test_upsert_rerun_is_noop_and_changed_batch_raises(
    ray_session, paths, src_sink, tmp_path
):
    from tokenzip.pipeline import upsert_docs

    orig = decompress(src_sink).to_pandas()
    upd_ids = sorted(orig["doc_id"])[:4]
    p = _write_update(tmp_path, orig, upd_ids, [("zzz-n", [8, 9], "web")])
    dst = str(tmp_path / "dst")
    t1 = upsert_docs(src_sink, dst, [p])
    t2 = upsert_docs(src_sink, dst, [p])  # identical rerun: clean no-op
    assert t1["n_rows"] == t2["n_rows"]
    assert t2["n_docs_replaced"] == t1["n_docs_replaced"]
    # same path, changed content: resume would keep stale rows -> loud
    p2 = _write_update(
        tmp_path, orig, upd_ids, [("zzz-n", [8, 9], "web"), ("zzz-m", [1], "web")]
    )
    assert p2 == p  # same filename, new content
    with pytest.raises(ValueError, match="fresh out_dir"):
        upsert_docs(src_sink, dst, [p])


def test_upsert_rejects_duplicate_ids_and_empty(ray_session, src_sink, tmp_path):
    import pyarrow as pa

    from tokenzip.pipeline import upsert_docs

    tab = pa.table(
        {
            "doc_id": pa.array(["a", "a"], pa.string()),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], pa.int32()),
            "source": pa.array(["web", "web"], pa.string()),
        }
    )
    p = str(tmp_path / "dup.parquet")
    pq.write_table(tab, p)
    with pytest.raises(ValueError, match="duplicate doc_id"):
        upsert_docs(src_sink, str(tmp_path / "d1"), [p])
    with pytest.raises(ValueError, match="empty new_paths"):
        upsert_docs(src_sink, str(tmp_path / "d2"), [])


def test_upsert_insert_only_and_replace_only(ray_session, paths, src_sink, tmp_path):
    from tokenzip.pipeline import upsert_docs

    orig = decompress(src_sink).to_pandas()
    # insert-only: no stale versions anywhere -> pure append, delete is a copy
    p = _write_update(tmp_path, orig, [], [("zzz-i", [4, 4], "web")])
    t = upsert_docs(src_sink, str(tmp_path / "ins"), [p])
    assert t["n_docs_replaced"] == 0 and t["n_docs_inserted"] == 1
    assert t["n_rows"] == len(orig) + 1
    # replace-only: every incoming id exists
    upd_ids = sorted(orig["doc_id"])[:3]
    os.remove(p)
    p = _write_update(tmp_path, orig, upd_ids, [])
    t = upsert_docs(src_sink, str(tmp_path / "rep"), [p])
    assert t["n_docs_replaced"] == 3 and t["n_docs_inserted"] == 0
    assert t["n_rows"] == len(orig)


def test_upsert_model_differential(ray_session, paths, src_sink, tmp_path):
    """Model-based differential: seeded random update batches (replace a
    random id subset with mutated tokens + insert random new docs) applied
    via upsert_docs must decode to exactly the pandas latest-wins model —
    the engine analog of the reference's fuzz differential, at the MERGE
    level."""
    import numpy as np
    import pyarrow as pa

    from tokenzip.pipeline import upsert_docs

    orig = decompress(src_sink).to_pandas()
    for trial in range(3):
        rng = np.random.default_rng(trial)
        n_upd = int(rng.integers(1, 40))
        upd_ids = list(rng.choice(orig["doc_id"].to_numpy(), n_upd, replace=False))
        n_new = int(rng.integers(1, 10))
        dids, toks, srcs = [], [], []
        for d in upd_ids:
            old = np.asarray(
                orig[orig["doc_id"] == d]["tokens"].iloc[0], np.int32
            )
            mut = old[::-1].copy() if len(old) else np.array([0], np.int32)
            dids.append(d)
            toks.append(mut.tolist())
            srcs.append("mut")
        for j in range(n_new):
            dids.append(f"new-{trial}-{j}")
            toks.append(rng.integers(0, 1000, rng.integers(1, 30)).astype(int).tolist())
            srcs.append("ins")
        tab = pa.table(
            {
                "doc_id": pa.array(dids, pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array([len(t) for t in toks], pa.int32()),
                "source": pa.array(srcs, pa.string()),
            }
        )
        p = str(tmp_path / f"upd-{trial}.parquet")
        pq.write_table(tab, p)
        dst = str(tmp_path / f"dst-{trial}")
        t = upsert_docs(src_sink, dst, [p])
        assert t["n_docs_replaced"] == n_upd
        assert t["n_docs_inserted"] == n_new
        # pandas latest-wins model
        model = orig[~orig["doc_id"].isin(upd_ids)][
            ["doc_id", "tokens", "n_tok", "source"]
        ].copy()
        batch = tab.to_pandas()
        model = (
            __import__("pandas")
            .concat([model, batch], ignore_index=True)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = (
            decompress(dst)
            .to_pandas()[["doc_id", "tokens", "n_tok", "source"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["doc_id"] == model["doc_id"]).all()
        assert (got["source"] == model["source"]).all()
        assert (got["n_tok"].astype(int) == model["n_tok"].astype(int)).all()
        for a, b in zip(got["tokens"], model["tokens"]):
            assert len(a) == len(b) and (np.asarray(a) == np.asarray(b)).all()

"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, processed by actor-pool map_batches stages.

The image/audio decode libraries are NOT in this container, so the decode
kernel itself is stubbed: ``MediaDecodeStage`` raises ``NotImplementedError``
in ``strict`` mode, or produces a *deterministic fake decode* (seeded by the
payload bytes) in ``fake`` mode. Everything around the stub is real and
tested: the schema, the small-batch sizing for large binary rows, the actor
signature (decoder state loaded once per actor), and the output layout
(fixed-shape ``list<float>`` features + dims).

At 100 TB the same stages run with real decoders: payload rows are MBs, so
``batch_size`` stays small (16-64) and ``DataContext.target_max_block_size``
is raised so Ray doesn't split blocks absurdly small.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from tokenzip.pipeline import _default_concurrency

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),      # declared dims (metadata, may be 0=unknown)
        ("height", pa.int32()),
        ("source", pa.string()),
    ]
)

FEATURE_DIM = 16


def synthesize_media_table(sf_dir: str, out_path: str | None = None) -> str:
    """Deterministic media table derived from documents.text bytes (no
    external data): payload = utf8 bytes, mime alternates image/audio."""
    import pyarrow.parquet as pq

    out_path = out_path or os.path.join(
        "/tmp/tokenzip_media", os.path.basename(os.path.normpath(sf_dir)), "media-v2.parquet"
    )
    if os.path.exists(out_path):
        return out_path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )
    payloads = [t.encode() for t in docs["text"].to_pylist()]
    ids = [f"media-{int(d):08d}" for d in docs["doc_id"].to_pylist()]
    mimes = ["image/fake" if i % 2 == 0 else "audio/fake" for i in range(len(ids))]
    dims = [(len(p) % 640 + 1, len(p) % 480 + 1) for p in payloads]
    table = pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array([d[0] for d in dims], pa.int32()),
            "height": pa.array([d[1] for d in dims], pa.int32()),
            "source": docs["source"],
        },
        schema=MEDIA_SCHEMA,
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


class MediaDecodeStage:
    """Actor-pool decode/feature-extract stage.

    ``mode='strict'``: raises NotImplementedError (the honest stub — the
    container has no PIL/av/soundfile).
    ``mode='fake'``: deterministic pseudo-decode — per payload, a seeded
    16-dim float feature (byte histogram moments) and decoded dims. Keeps
    every piece of Ray plumbing executable and testable.
    """

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        # real build: heavyweight decoder/model init happens HERE, once per
        # actor (e.g. PIL plugin registry, torchaudio backend, ONNX session)
        self.have_pil = False
        try:  # pragma: no cover - not present in this container
            import PIL.Image  # noqa: F401

            self.have_pil = True
        except ImportError:
            pass

    def _fake_decode(self, payload: bytes) -> tuple[np.ndarray, int, int]:
        b = np.frombuffer(payload, dtype=np.uint8)
        if len(b) == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32), 0, 0
        hist = np.bincount(b % 16, minlength=FEATURE_DIM).astype(np.float32)
        feat = hist / max(1.0, float(hist.sum()))
        # dims seeded from md5(payload) — md5 is DuckDB-native, so the SQL
        # oracle recomputes the identical decoded dims from the source text
        h = hashlib.md5(payload).digest()
        return (
            feat,
            int.from_bytes(h[:2], "little") % 640 + 1,
            int.from_bytes(h[2:4], "little") % 480 + 1,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict" and not self.have_pil:
            raise NotImplementedError(
                "media decode requires PIL/av which are not available in this "
                "container; run with mode='fake' for the deterministic stub"
            )
        import pyarrow.compute as pc

        feats, ws, hs = [], [], []
        for payload in batch["payload"].to_pylist():
            f, w, h = self._fake_decode(payload)
            feats.append(f)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "source": batch["source"],
                "decoded_w": pa.array(ws, pa.int32()),
                "decoded_h": pa.array(hs, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32(), FEATURE_DIM)
                ),
                "payload_bytes": pc.binary_length(batch["payload"]).cast(pa.int64()),
            }
        )


def media_feature_pipeline(sf_dir: str, mode: str = "fake"):
    """read media parquet -> actor-pool decode/extract -> features Dataset.
    Small batch_size: binary payload rows are large; a batch x pool must fit
    worker heaps."""
    path = synthesize_media_table(sf_dir)
    ds = ray.data.read_parquet(path)
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=max(2, _default_concurrency() // 2),
        fn_constructor_kwargs={"mode": mode},
    )


def q_media_features_by_source(sf_dir: str):
    """Per-source media feature aggregates. Oracle-checked: the fake decode
    dims are md5(payload)-seeded and payload == utf8(documents.text), so the
    DuckDB oracle recomputes identical sums from the source table."""
    from ray.data.aggregate import Count, Sum

    feats = media_feature_pipeline(sf_dir)
    out = (
        feats.groupby("source")
        .aggregate(
            Count(alias_name="n_media"),
            Sum("payload_bytes", alias_name="sum_payload_bytes"),
            Sum("decoded_w", alias_name="sum_w"),
            Sum("decoded_h", alias_name="sum_h"),
        )
        .sort("source")
        .to_pandas()
    )
    for c in ("n_media", "sum_payload_bytes", "sum_w", "sum_h"):
        out[c] = out[c].astype("int64")
    return out

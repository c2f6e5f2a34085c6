"""Multimodal column plumbing: opaque ``binary`` payload columns with typed
metadata, processed by actor-pool map_batches stages.

``MediaDecodeStage`` has three modes. ``mode='real'`` decodes ACTUAL bytes:
PNG via the builtin zlib-inflate + scanline-unfilter parser (PIL takes over
when importable — import-guarded; not in this container) and PCM16 WAV via
the stdlib ``wave`` module; dims and value sums are extracted from the
payload, never from metadata, and are oracle-checked end to end
(q_media_real_stats). ``mode='fake'`` is the deterministic pseudo-decode
retained for formats that genuinely need PIL/av/soundfile (JPEG, MP3, ...);
``mode='strict'`` raises for those instead. The Ray plumbing is identical in
all modes: schema, small-batch sizing for large binary rows, actor pool with
per-actor decoder init, fixed-shape ``list<float>`` feature output.

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

    def _real_decode(self, payload: bytes) -> tuple[np.ndarray, int, int, int]:
        """(16-bin value histogram, w, h, value sum) from REAL bytes: PNG via
        PIL when importable (import-guarded) else the builtin zlib+numpy
        parser; WAV via the stdlib wave module. For audio, (w, h) carries
        (n_samples, n_channels)."""
        if payload[:8] == _PNG_SIG:
            if self.have_pil:  # pragma: no cover - PIL absent in container
                import io

                import PIL.Image

                img = np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("L"))
            else:
                img = decode_png_gray(bytes(payload))
            h, w = img.shape
            hist = np.bincount(img.ravel() >> 4, minlength=FEATURE_DIM).astype(
                np.float32
            )
            return hist / max(1.0, hist.sum()), w, h, int(img.sum(dtype=np.int64))
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            s, _rate, ch = decode_wav_pcm16(bytes(payload))
            hist = np.bincount(
                (s.astype(np.int64) + 32768) >> 12, minlength=FEATURE_DIM
            ).astype(np.float32)
            n = len(s) // max(1, ch)
            return hist / max(1.0, hist.sum()), n, ch, int(s.sum(dtype=np.int64))
        raise NotImplementedError(
            "real decode supports PNG and PCM16 WAV in this container; other "
            "formats need PIL/av/soundfile (import-guarded, not installed)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict" and not self.have_pil:
            raise NotImplementedError(
                "media decode requires PIL/av which are not available in this "
                "container; run with mode='fake' for the deterministic stub"
            )
        import pyarrow.compute as pc

        if self.mode == "real":
            feats, ws, hs, sums = [], [], [], []
            for payload in batch["payload"].to_pylist():
                f, w, h, vs = self._real_decode(payload)
                feats.append(f)
                ws.append(w)
                hs.append(h)
                sums.append(vs)
            return pa.table(
                {
                    "media_id": batch["media_id"],
                    "mime": batch["mime"],
                    "source": batch["source"],
                    "decoded_w": pa.array(ws, pa.int32()),
                    "decoded_h": pa.array(hs, pa.int32()),
                    "val_sum": pa.array(sums, pa.int64()),
                    "feature": pa.array(
                        [f.tolist() for f in feats],
                        pa.list_(pa.float32(), FEATURE_DIM),
                    ),
                    "payload_bytes": pc.binary_length(batch["payload"]).cast(
                        pa.int64()
                    ),
                }
            )

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


# ---------------------------------------------------------------------------
# REAL decode kernels (round-5): this container has no PIL/soundfile, but
# the stdlib is enough for two honest formats — PNG (zlib inflate + scanline
# unfilter, pure numpy) and WAV PCM16 (the ``wave`` module). ``mode='real'``
# decodes actual bytes end to end; PIL, when importable, takes over the
# image path (import-guarded), with the builtin parser as the fallback.
# ---------------------------------------------------------------------------

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png_gray(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal standards-conformant grayscale 8-bit PNG writer (used by the
    deterministic media synthesizer and the planted-fixture tests).
    ``filter_type`` applies ONE filter to every scanline — types 1-4 exist
    so the tests can exercise the decoder's full unfilter ladder."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("encode_png_gray expects a (h, w) uint8 array")
    h, w = img.shape
    prev = np.zeros(w, dtype=np.int64)
    rows = []
    for r in range(h):
        cur = img[r].astype(np.int64)
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([[0], cur[:-1]])
            filt = cur - left
        elif filter_type == 2:  # Up
            filt = cur - prev
        elif filter_type == 3:  # Average
            left = np.concatenate([[0], cur[:-1]])
            filt = cur - (left + prev) // 2
        elif filter_type == 4:  # Paeth
            left = np.concatenate([[0], cur[:-1]])
            upleft = np.concatenate([[0], prev[:-1]])
            p = left + prev - upleft
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        rows.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> np.ndarray:
    """Grayscale 8-bit PNG decoder: chunk walk (CRC-checked), zlib inflate,
    full scanline unfilter ladder (None/Sub/Up/Average/Paeth). Sub and the
    sequential halves of Average/Paeth are prefix dependencies; Sub is a
    cumsum, the other two run a per-row loop — decode cost is dominated by
    inflate either way. Returns a (h, w) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise NotImplementedError(
                    "decoder supports non-interlaced 8-bit grayscale PNG"
                )
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("PNG scanline payload size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, w + 1)
    ftypes, rows = scan[:, 0], scan[:, 1:].astype(np.int64)
    out = np.zeros((h, w), dtype=np.int64)
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        ft, cur = int(ftypes[r]), rows[r]
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: recon[c] = raw[c] + recon[c-1] -> mod-256 cumsum
            rec = np.cumsum(cur) % 256
        elif ft == 2:  # Up
            rec = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential left dependency
            rec = np.empty(w, dtype=np.int64)
            left = upleft = 0
            for c in range(w):
                up = prev[c]
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else upleft)
                left = (cur[c] + pred) % 256
                rec[c] = left
                upleft = up
        else:
            raise ValueError(f"PNG filter type {ft} out of range")
        out[r] = rec
        prev = rec
    return out.astype(np.uint8)


def encode_wav_pcm16(
    samples: np.ndarray, rate: int = 16000, channels: int = 1
) -> bytes:
    """PCM16 WAV writer via the stdlib ``wave`` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int, int]:
    """(samples int16, rate, channels) via the stdlib ``wave`` module."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("decoder supports PCM16 WAV")
        frames = f.readframes(f.getnframes())
        return (
            np.frombuffer(frames, dtype="<i2").astype(np.int16),
            f.getframerate(),
            f.getnchannels(),
        )


def _real_media_params(L: int, odd: bool) -> dict:
    """Closed-form media geometry per document, shared between the
    synthesizer (encode side) and the SQL oracle (recompute side); the
    ENGINE side never uses these — it decodes the actual bytes."""
    if not odd:  # PNG: pixel(r, c) = v + r, v <= 199 + 47 < 256 (no mod)
        return {
            "kind": "image/png",
            "w": L % 64 + 1,
            "h": L % 48 + 1,
            "v": L % 200,
        }
    return {  # WAV: s_i = (i % 17) - 8, one channel, 16 kHz
        "kind": "audio/wav",
        "n": L % 2000 + 100,
        "rate": 16000,
    }


def synthesize_real_media_table(sf_dir: str, out_path: str | None = None) -> str:
    """Deterministic media table with REAL payload bytes: each document
    becomes a PNG (even doc_id) or a WAV (odd doc_id) whose geometry and
    content are closed-form functions of length(text) — so the SQL oracle
    can recompute what only a real decoder can extract from the bytes."""
    import pyarrow.parquet as pq

    out_path = out_path or os.path.join(
        "/tmp/tokenzip_media",
        os.path.basename(os.path.normpath(sf_dir)),
        "media-real-v1.parquet",
    )
    if os.path.exists(out_path):
        return out_path
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    payloads, mimes, ws, hs = [], [], [], []
    for d, t in zip(ids, texts):
        p = _real_media_params(len(t), bool(int(d) % 2))
        if p["kind"] == "image/png":
            img = (
                np.full((p["h"], p["w"]), p["v"], dtype=np.int64)
                + np.arange(p["h"], dtype=np.int64)[:, None]
            ).astype(np.uint8)
            payloads.append(encode_png_gray(img))
            ws.append(p["w"])
            hs.append(p["h"])
        else:
            s = (np.arange(p["n"], dtype=np.int64) % 17 - 8).astype(np.int16)
            payloads.append(encode_wav_pcm16(s, p["rate"]))
            ws.append(p["n"])
            hs.append(1)
        mimes.append(p["kind"])
    table = pa.table(
        {
            "media_id": pa.array([f"media-{int(d):08d}" for d in ids], pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "source": docs["source"],
        },
        schema=MEDIA_SCHEMA,
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


def media_real_pipeline(sf_dir: str):
    """read real-bytes media parquet -> actor-pool REAL decode (PNG/WAV) ->
    features Dataset. Same sizing rationale as media_feature_pipeline."""
    path = synthesize_real_media_table(sf_dir)
    ds = ray.data.read_parquet(path)
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=max(2, _default_concurrency() // 2),
        fn_constructor_kwargs={"mode": "real"},
    )


def q_media_real_stats(sf_dir: str):
    """Per-(source, mime) aggregates over REAL decoded media: dims and the
    decoded pixel/sample value sum come out of actual PNG inflate+unfilter /
    WAV frame reads, while the DuckDB oracle recomputes them in closed form
    from length(documents.text) — the differential proves the decoder
    inverts the encoder on every byte that matters."""
    from ray.data.aggregate import Count, Sum

    feats = media_real_pipeline(sf_dir)
    out = (
        feats.groupby(["source", "mime"])
        .aggregate(
            Count(alias_name="n_media"),
            Sum("decoded_w", alias_name="sum_w"),
            Sum("decoded_h", alias_name="sum_h"),
            Sum("val_sum", alias_name="sum_val"),
        )
        .sort(["source", "mime"])
        .to_pandas()
    )
    for c in ("n_media", "sum_w", "sum_h", "sum_val"):
        out[c] = out[c].astype("int64")
    return out


def media_real_sql() -> str:
    """Closed-form oracle of q_media_real_stats over the documents table
    (see _real_media_params): PNG val_sum = w*(h*v + h*(h-1)/2) with
    pixel(r,c) = v + r; WAV val_sum over s_i = (i%17)-8 telescopes to the
    final partial cycle r = n%17: r*(r-1)/2 - 8r."""
    return """
WITH d AS (
  SELECT source, CAST(doc_id AS BIGINT) % 2 AS odd,
         CAST(length(text) AS BIGINT) AS L
  FROM documents
), g AS (
  SELECT source,
         CASE WHEN odd = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
         CASE WHEN odd = 0 THEN L % 64 + 1 ELSE L % 2000 + 100 END AS w,
         CASE WHEN odd = 0 THEN L % 48 + 1 ELSE 1 END AS h,
         CASE WHEN odd = 0
              THEN (L % 64 + 1) * ((L % 48 + 1) * (L % 200)
                   + (L % 48 + 1) * (L % 48) // 2)
              ELSE ((L % 2000 + 100) % 17) * (((L % 2000 + 100) % 17) - 1) // 2
                   - 8 * ((L % 2000 + 100) % 17)
         END AS val
  FROM d
)
SELECT source, mime, CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(SUM(h) AS BIGINT) AS sum_h,
       CAST(SUM(val) AS BIGINT) AS sum_val
FROM g GROUP BY source, mime ORDER BY source, mime
"""

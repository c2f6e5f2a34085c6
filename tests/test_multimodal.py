"""Real multimodal decode: planted-fixture PNG/WAV codec tests plus the
engine-vs-oracle differential for the real media pipeline (the decoder must
invert the synthesizer on actual bytes — dims and value sums come out of
zlib inflate + scanline unfilter / WAV frame reads, never metadata)."""

import hashlib

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_png_roundtrip_all_filters():
    from tokenzip.multimodal import decode_png_gray, encode_png_gray

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(23, 37)).astype(np.uint8)
    for ft in range(5):  # None / Sub / Up / Average / Paeth
        back = decode_png_gray(encode_png_gray(img, filter_type=ft))
        assert back.dtype == np.uint8
        assert back.shape == img.shape and (back == img).all(), f"filter {ft}"
    # degenerate shapes
    for shape in [(1, 1), (1, 64), (64, 1)]:
        im2 = rng.integers(0, 256, size=shape).astype(np.uint8)
        assert (decode_png_gray(encode_png_gray(im2, filter_type=4)) == im2).all()


def test_png_corruption_detected():
    from tokenzip.multimodal import decode_png_gray, encode_png_gray

    data = bytearray(encode_png_gray(np.zeros((4, 4), np.uint8)))
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"nope" + bytes(data[4:]))
    data[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png_gray(bytes(data))


def test_wav_roundtrip():
    from tokenzip.multimodal import decode_wav_pcm16, encode_wav_pcm16

    rng = np.random.default_rng(6)
    s = rng.integers(-32768, 32768, size=501).astype(np.int16)
    back, rate, ch = decode_wav_pcm16(encode_wav_pcm16(s, 22050))
    assert (back == s).all() and rate == 22050 and ch == 1


def test_real_decode_stage_planted():
    """The stage extracts dims and value sums from the BYTES, ignoring any
    (deliberately wrong) metadata columns."""
    import pyarrow as pa

    from tokenzip.multimodal import (
        MEDIA_SCHEMA,
        MediaDecodeStage,
        encode_png_gray,
        encode_wav_pcm16,
    )

    img = (np.arange(6 * 9).reshape(6, 9) % 256).astype(np.uint8)
    wav = (np.arange(50) % 17 - 8).astype(np.int16)
    batch = pa.table(
        {
            "media_id": pa.array(["a", "b"], pa.string()),
            "payload": pa.array(
                [encode_png_gray(img), encode_wav_pcm16(wav)], pa.large_binary()
            ),
            "mime": pa.array(["image/png", "audio/wav"], pa.string()),
            "width": pa.array([999, 999], pa.int32()),  # wrong on purpose
            "height": pa.array([999, 999], pa.int32()),
            "source": pa.array(["s", "s"], pa.string()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = MediaDecodeStage(mode="real")(batch).to_pandas()
    assert list(out["decoded_w"]) == [9, 50]
    assert list(out["decoded_h"]) == [6, 1]
    assert list(out["val_sum"]) == [int(img.sum()), int(wav.sum())]
    feat = np.asarray(out["feature"][0])
    assert feat.shape == (16,) and abs(feat.sum() - 1.0) < 1e-6


def test_real_decode_unknown_format_raises():
    from tokenzip.multimodal import MediaDecodeStage

    with pytest.raises(NotImplementedError, match="PIL"):
        MediaDecodeStage(mode="real")._real_decode(b"GIF89a....")


def test_media_real_stats_matches_oracle(ray_session):
    from tokenzip.multimodal import media_real_sql, q_media_real_stats

    got = q_media_real_stats(SF)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(media_real_sql()).fetchdf()

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    def vh(df):
        return hashlib.md5(
            df.to_csv(index=False, float_format="%.9g").encode()
        ).hexdigest()

    r, o = norm(got), norm(exp)
    assert len(r) == len(o)
    assert list(r.columns) == list(o.columns)
    assert vh(r) == vh(o)

"""Multimodal binary-column operators (operators/multimodal.py).

Decode for image/video is a deterministic fake (no codecs in the
container, clearly flagged in the module); the Spark-side contract —
schemas, mapInPandas batch shapes, fan-out counts, determinism, payload
pruning — is what these tests pin down. Audio PCM16 decode is real NumPy
and is checked against a single-process oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from deepee_spark.operators.multimodal import (
    audio_features,
    decode_pcm16,
    image_features,
    image_resize,
    synth_media_df,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media_df(spark, 60)
    df.cache().count()
    return df


def test_media_schema_and_kinds(media):
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter("kind = 'image'").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["width"] > 0 and row["meta"]["height"] > 0


def test_image_features_shape_and_determinism(media):
    f1 = image_features(media).orderBy("media_id").collect()
    f2 = image_features(media).orderBy("media_id").collect()
    assert len(f1) == 20  # one row per image
    assert f1 == f2  # fake decode is payload-deterministic
    for r in f1:
        assert 0.0 <= r["mean_r"] <= 255.0
        assert len(r["luma_hist"]) == 8
        assert sum(r["luma_hist"]) == (
            media.filter(f"media_id = {r['media_id']}").first()["meta"]["width"]
            * media.filter(f"media_id = {r['media_id']}").first()["meta"]["height"]
        )


def test_image_resize_bytes(media):
    out = {r["media_id"]: r for r in image_resize(media, 4, 3).collect()}
    assert len(out) == 20
    for r in out.values():
        assert r["width"] == 4 and r["height"] == 3
        assert len(r["rgb"]) == 4 * 3 * 3  # H x W x C uint8


def test_audio_features_match_oracle(spark, media):
    rows = media.filter("kind = 'audio'").collect()
    feats = {r["media_id"]: r for r in audio_features(media).collect()}
    assert len(feats) == len(rows) == 20
    for row in rows:
        x = decode_pcm16(bytes(row["payload"]))
        got = feats[row["media_id"]]
        assert got["n_samples"] == len(x)
        assert abs(got["rms"] - float(np.sqrt(np.mean(x * x)))) < 1e-6
        assert abs(got["peak"] - float(np.abs(x).max())) < 1e-6


def test_video_frame_sample_fanout(media):
    frames = video_frame_sample(media, k=4)
    rows = frames.collect()
    assert len(rows) == 20 * 4
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        assert sorted(x["frame_idx"] for x in rs) == [0, 1, 2, 3]
        dur = [x for x in rs if x["frame_idx"] == 3][0]["frame_ms"]
        assert 0 <= dur  # evenly spaced within duration
        assert len({x["frame_hash"] for x in rs}) == 4  # distinct stub frames


def test_payload_pruned_for_metadata_only_query(media, tmp_path):
    """A metadata-only projection must not read the payload bytes column
    (column pruning through the parquet scan)."""
    p = str(tmp_path / "media")
    media.write.parquet(p)
    spark = media.sparkSession
    scan = spark.read.parquet(p).select("media_id", "kind", "meta.width")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "payload" not in read_schema[0]
    assert "media_id" in read_schema[0]


def test_real_codec_path_guard_or_roundtrip(monkeypatch):
    """The real-codec branch (DETERMINISTIC_FAKE_DECODE=False): where
    Pillow exists, a PNG round-trips through decode_image with the
    metadata shape enforced; where it doesn't (this container), the
    documented NotImplementedError guard fires."""
    import numpy as np
    import pytest

    from deepee_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "DETERMINISTIC_FAKE_DECODE", False)
    try:
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG\r\n", 4, 3)
        return

    import io

    rng = np.random.default_rng(20260817)
    pixels = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pixels, "RGB").save(buf, format="PNG")
    decoded = mm.decode_image(buf.getvalue(), width=4, height=3)
    assert np.array_equal(decoded, pixels)
    with pytest.raises(ValueError):
        mm.decode_image(buf.getvalue(), width=3, height=4)  # meta mismatch


def test_wav_container_roundtrip_and_decode_dispatch():
    # r3 verdict task 9: an honest WAV container path beside raw PCM16
    import numpy as np
    import pytest as _pytest

    from deepee_spark.operators.multimodal import (
        decode_pcm16,
        parse_wav,
        write_wav_bytes,
    )

    wave = (np.sin(np.arange(400) * 0.05) * 12000).astype("<i2")
    buf = write_wav_bytes(wave, sample_rate=8000)
    sr, nch, samples = parse_wav(buf)
    assert (sr, nch) == (8000, 1)
    np.testing.assert_array_equal(
        samples, wave.astype(np.float32) / 32768.0
    )
    # decode_pcm16 dispatches on the RIFF magic: container and raw
    # payloads of the same samples decode identically
    np.testing.assert_array_equal(decode_pcm16(buf), samples)
    np.testing.assert_array_equal(decode_pcm16(wave.tobytes()), samples)
    # odd-sized data chunk gets a pad byte and still roundtrips
    odd = write_wav_bytes(wave[:3], 8000)
    assert len(parse_wav(odd)[2]) == 3
    # loud failures, never a silent wrong decode
    with _pytest.raises(ValueError):
        parse_wav(b"OggS" + bytes(40))
    float_fmt = bytearray(buf)
    float_fmt[20] = 3  # IEEE float format tag
    with _pytest.raises(ValueError):
        parse_wav(bytes(float_fmt))


def test_audio_features_accepts_wav_payloads(spark):
    import numpy as np

    from deepee_spark.operators.multimodal import (
        audio_features,
        write_wav_bytes,
    )

    wave = (np.sin(np.arange(800) * 0.03) * 9000).astype("<i2")
    meta = (None, None, 8000, 100, "pcm_s16le")
    rows = [
        (1, "u1", "audio", bytearray(wave.tobytes()), meta),
        (2, "u2", "audio", bytearray(write_wav_bytes(wave, 8000)),
         (None, None, 8000, 100, "wav")),
    ]
    from deepee_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_features(df).collect()}
    assert got[1].n_samples == got[2].n_samples == 800
    assert got[1].rms == got[2].rms and got[1].zcr == got[2].zcr


def test_avi_header_roundtrip_and_frame_timing(spark):
    # video sibling of the WAV test: real RIFF/AVI metadata parse,
    # pixel decode still stubbed
    import pytest as _pytest

    from deepee_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        parse_avi_header,
        video_frame_sample,
        write_avi_bytes,
    )

    buf = write_avi_bytes(
        n_frames=120, width=320, height=240, usec_per_frame=33333,
        movi=b"\x01\x02junkframes",
    )
    h = parse_avi_header(buf)
    assert h == {
        "n_frames": 120, "width": 320, "height": 240,
        "usec_per_frame": 33333, "duration_ms": 120 * 33333 // 1000,
    }
    with _pytest.raises(ValueError):
        parse_avi_header(b"RIFF\x00\x00\x00\x00WAVE")  # not AVI
    with _pytest.raises(ValueError):
        parse_avi_header(b"RIFF\x04\x00\x00\x00AVI ")  # no hdrl
    # video_frame_sample trusts the container's own timing for AVI
    rows = [
        (1, "u1", "video", bytearray(buf), (320, 240, None, 9999, "avi")),
        (2, "u2", "video", bytearray(b"rawjunk"), (8, 8, None, 2000, "fake/video")),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r.media_id, r.frame_idx): r.frame_ms
           for r in video_frame_sample(df, k=4).collect()}
    dur_avi = 120 * 33333 // 1000  # 3999 ms from the container, not meta
    assert got[(1, 3)] == dur_avi * 3 // 4
    assert got[(2, 3)] == 2000 * 3 // 4


def test_avi_movi_frame_parse_roundtrip():
    """parse_avi_movi_frames walks the real movi LIST: chunks written
    by write_avi_movi_chunks come back byte-identical and in order,
    odd-length frames are padded per RIFF, non-frame chunks and
    header-only files are ignored cleanly."""
    from deepee_spark.operators.multimodal import (
        parse_avi_movi_frames,
        write_avi_bytes,
        write_avi_movi_chunks,
    )

    frames = [b"\xff\xd8AAA\xff\xd9", b"\xff\xd8BB\xff\xd9"]  # odd + even
    payload = write_avi_bytes(
        n_frames=2, width=8, height=6, usec_per_frame=40_000,
        movi=write_avi_movi_chunks(frames),
    )
    assert parse_avi_movi_frames(payload) == frames
    header_only = write_avi_bytes(1, 8, 6, 40_000)
    assert parse_avi_movi_frames(header_only) == []
    import pytest

    with pytest.raises(ValueError):
        parse_avi_movi_frames(b"RIFFxxxxWAVE")


def test_mjpeg_frame_real_codec_guard_or_roundtrip(monkeypatch):
    """r4 verdict task 6 — video decode honesty parity with images:
    where Pillow exists, a REAL MJPEG-AVI fixture (JPEG frames packed
    as 00dc chunks) decodes through the container walk +
    decode_mjpeg_frame with the hdrl shape enforced; where it doesn't
    (this container), the documented NotImplementedError guard fires.
    The fake path stays shape-true and deterministic either way."""
    import numpy as np
    import pytest

    from deepee_spark.operators import multimodal as mm

    # fake path: shape + determinism (flag on, no codec needed)
    fake = mm.decode_mjpeg_frame(b"\xff\xd8xx\xff\xd9", 4, 3)
    assert fake.shape == (3, 4, 3) and fake.dtype == np.uint8
    assert np.array_equal(fake, mm.decode_mjpeg_frame(b"\xff\xd8xx\xff\xd9", 4, 3))

    monkeypatch.setattr(mm, "DETERMINISTIC_FAKE_DECODE", False)
    try:
        from PIL import Image
        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        with pytest.raises(NotImplementedError):
            mm.decode_mjpeg_frame(b"\xff\xd8xx\xff\xd9", 4, 3)
        return

    import io

    w, h = 8, 6
    jpegs = []
    for shade in (40, 200):
        buf = io.BytesIO()
        Image.fromarray(
            np.full((h, w, 3), shade, dtype=np.uint8), "RGB"
        ).save(buf, format="JPEG", quality=95)
        jpegs.append(buf.getvalue())
    payload = mm.write_avi_bytes(
        n_frames=2, width=w, height=h, usec_per_frame=40_000,
        movi=mm.write_avi_movi_chunks(jpegs),
    )
    hdr = mm.parse_avi_header(payload)
    frames = mm.parse_avi_movi_frames(payload)
    assert hdr["n_frames"] == len(frames) == 2
    for raw, shade in zip(frames, (40, 200)):
        arr = mm.decode_mjpeg_frame(raw, hdr["width"], hdr["height"])
        assert arr.shape == (h, w, 3)
        assert abs(int(arr.mean()) - shade) <= 3  # JPEG-lossy tolerance
    with pytest.raises(ValueError):
        mm.decode_mjpeg_frame(frames[0], hdr["width"] + 1, hdr["height"])

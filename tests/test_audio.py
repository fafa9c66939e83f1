"""Golden parity for the distributed audio layer: the overlap-chunked
mapInPandas mel extraction must equal a single-pass numpy STFT over the
full waveform (SURVEY §7: 'distributed overlap-chunked STFT correctness
at chunk edges' is the named hard part)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from big_data_audio_classification_spark.operators import audio, multimodal


def test_chunked_mel_equals_single_pass(spark):
    recs = audio.recordings(spark, n_recordings=2, seconds=2.0)
    out = (
        audio.mel_frames_distributed(recs)
        .orderBy("rec_id", "frame_id")
        .collect()
    )
    n_samples = int(2.0 * audio.SR)
    for rec_id in (0, 1):
        got = np.array([r.mel for r in out if r.rec_id == rec_id])
        exp = audio.expected_mel_single_pass(rec_id, n_samples)
        assert got.shape == exp.shape, f"rec {rec_id}: {got.shape} vs {exp.shape}"
        assert np.allclose(got, exp, rtol=1e-10, atol=1e-10)


def test_frame_count_matches_formula(spark):
    recs = audio.recordings(spark, n_recordings=3, seconds=1.5)
    n = int(1.5 * audio.SR)
    per_rec = (
        audio.mel_frames_distributed(recs)
        .groupBy("rec_id")
        .count()
        .collect()
    )
    for r in per_rec:
        assert r["count"] == audio.total_frames(n)


def test_power_to_db_bounds_and_max(spark):
    recs = audio.recordings(spark, n_recordings=2, seconds=1.0)
    db = audio.power_to_db(audio.mel_frames_distributed(recs))
    rows = db.select(
        F.array_max("mel_db").alias("mx"), F.array_min("mel_db").alias("mn")
    ).collect()
    global_max = max(r.mx for r in rows)
    assert abs(global_max) < 1e-9  # ref=max → peak is exactly 0 dB
    assert all(r.mn >= audio.DB_FLOOR - 1e-9 for r in rows)


def test_blob_concat_ordered(spark):
    """R7 audio concat: ordered collect_list + flatten reassembles the
    byte stream (single-group fan-in, data_generator.py:14,20)."""
    rows = [(i, bytes([i] * 3)) for i in range(5)]
    df = spark.createDataFrame(rows, "seq int, chunk binary")
    out = (
        df.orderBy("seq")
        .agg(F.concat(*[]).alias("x") if False else F.collect_list("chunk").alias("chunks"))
        .select(F.concat_ws("", F.transform("chunks", lambda c: F.base64(c))).alias("b64"))
        .first()
    )
    import base64

    expected = "".join(base64.b64encode(bytes([i] * 3)).decode() for i in range(5))
    assert out.b64 == expected


def test_fake_decode_deterministic_and_normalized():
    f1 = multimodal.fake_decode(b"hello world")
    f2 = multimodal.fake_decode(b"hello world")
    assert np.array_equal(f1, f2)
    assert abs(f1.sum() - 1.0) < 1e-12


def test_feature_extract_batch_shape(spark, sf_dir):
    m = multimodal.media_table(spark, sf_dir)
    feats = multimodal.extract_features(m, dim=16)
    rows = feats.limit(10).collect()
    assert all(len(r.feature) == 16 for r in rows)
    assert feats.count() == m.count()


def test_real_decode_is_gated():
    import numpy as np
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_blob(np.array([1, 2]))


def test_ref_e2e_train_separates_speakers(spark, sf_dir):
    """End-to-end R48 pipeline: the two-harmonic corpus is separable in
    mel space, so the trained model must classify the holdout nearly
    perfectly and the split must cover every frame."""
    from big_data_audio_classification_spark.operators.audio import (
        recordings,
        ref_e2e_train,
        total_frames,
    )

    row = ref_e2e_train(spark, sf_dir).first()
    n_frames = sum(
        total_frames(r.n_samples) for r in recordings(spark).collect()
    )
    assert row.n_train + row.n_test == n_frames
    assert row.accuracy >= 0.95
    assert row.c01 + row.c10 <= 0.05 * row.n_test  # off-diagonal ≈ 0


def test_frame_sample_cardinality_and_determinism(spark, sf_dir):
    """mm_frame_sample fans one doc into ceil(len/256) frames; the
    kernel is deterministic (md5 of char slices)."""
    from big_data_audio_classification_spark.operators.multimodal import mm_frame_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = (
        d.selectExpr("CAST(ceil(length(text) / 256.0) AS BIGINT) AS nf")
        .groupBy()
        .sum("nf")
        .first()[0]
    )
    out = mm_frame_sample(spark, sf_dir)
    assert out.count() == expected
    h1 = out.orderBy("media_id", "frame_no").limit(5).collect()
    h2 = mm_frame_sample(spark, sf_dir).orderBy("media_id", "frame_no").limit(5).collect()
    assert h1 == h2


def test_resize_pool_preserves_l1_mass(spark, sf_dir):
    """Mean-pooling an L1-normalized 16-vector into 4 buckets keeps
    total mass 1/4 per-bucket-scale: the four per-origin pooled-bucket
    means (r05 output: p0..p3, each the mean of 4 mass-1-total raw
    buckets) must sum to ~0.25 for every origin."""
    from big_data_audio_classification_spark.operators.multimodal import mm_resize_pool

    rows = mm_resize_pool(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs((r.p0 + r.p1 + r.p2 + r.p3) - 0.25) < 1e-5  # 4x round(,6)


def test_wav_codec_roundtrip_lossless():
    """encode (stdlib wave writer) -> decode (hand-rolled RIFF parser)
    must be byte-faithful for any int16 signal, including extremes."""
    import numpy as np

    rng = np.random.default_rng(7)
    for samples in (
        rng.integers(-32768, 32768, size=501).astype(np.int16),
        np.array([-32768, 32767, 0, 1, -1], dtype=np.int16),
        np.zeros(0, dtype=np.int16),
    ):
        blob = multimodal.encode_wav_pcm16(samples, sr=44100)
        sr, decoded = multimodal.decode_wav_pcm16(blob)
        assert sr == 44100
        assert np.array_equal(decoded, samples)


def test_wav_decode_rejects_non_riff():
    import numpy as np
    import pytest

    with pytest.raises(ValueError):
        multimodal.decode_wav_pcm16(b"\x00" * 64)
    # stereo / non-PCM16 rejected explicitly, not silently mis-decoded
    blob = bytearray(multimodal.encode_wav_pcm16(np.zeros(4, dtype=np.int16)))
    blob[22] = 2  # n_channels = 2
    with pytest.raises(ValueError):
        multimodal.decode_wav_pcm16(bytes(blob))


def test_synth_samples_deterministic_and_bounded():
    import numpy as np

    a = multimodal.synth_samples(123)
    b = multimodal.synth_samples(123)
    assert np.array_equal(a, b)
    assert a.dtype == np.int16
    assert len(a) == 200 + 123 % 57
    assert a.min() >= -1024 and a.max() <= 1023


def test_wav_resample_kernel_is_exact_decimation():
    """The 2:1 resample kernel (decode -> [::2] -> re-encode at 4 kHz)
    must keep exactly the even-index samples, byte-faithfully."""
    import numpy as np

    for doc_id in (0, 7, 56, 123, 499):
        smp = multimodal.synth_samples(doc_id)
        wav8 = multimodal.encode_wav_pcm16(smp, multimodal.WAV_SR)
        sr8, dec8 = multimodal.decode_wav_pcm16(wav8)
        wav4 = multimodal.encode_wav_pcm16(dec8[::2], multimodal.WAV_SR_OUT)
        sr4, dec4 = multimodal.decode_wav_pcm16(wav4)
        assert sr8 == multimodal.WAV_SR and sr4 == multimodal.WAV_SR_OUT
        assert np.array_equal(dec4, smp[::2])
        assert len(dec4) == (len(smp) + 1) // 2


def test_phash_neardup_matches_bruteforce_replay(spark, sf_dir):
    """mm_phash_banded_neardup: an independent pure-Python dHash +
    all-pairs Hamming replay at sf0.001 must reproduce the banded join's
    candidate set exactly (every emitted pair collides on >=1 band) and
    the top-200 ordering."""
    import pyarrow.parquet as pq

    from big_data_audio_classification_spark.operators.multimodal import (
        mm_phash_banded_neardup,
    )

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {}
    for did, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        if len(text) > 1:
            docs.setdefault(text, min(docs.get(text, did), did))

    def dhash(text):
        L = len(text)
        h = 0
        for i in range(64):
            p1 = (i * (L - 1)) // 65
            p2 = ((i + 1) * (L - 1)) // 65
            if ord(text[p1]) > ord(text[p2]):
                h |= 1 << i
        return h

    reps = {mid: dhash(t) for t, mid in docs.items()}

    def bands(h):
        return [(b, (h >> (16 * b)) & 0xFFFF) for b in range(4)]

    ids = sorted(reps)
    expected = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if set(bands(reps[a])) & set(bands(reps[b])):
                expected.append((bin(reps[a] ^ reps[b]).count("1"), a, b))
    expected.sort()
    expected = expected[:200]

    got = [
        (r.hamming, r.id_a, r.id_b)
        for r in mm_phash_banded_neardup(spark, sf_dir).collect()
    ]
    assert got == expected


def test_vad_segments_reconstruct_gate_schedule(spark, sf_dir):
    """Segments must tile exactly the md5-gate on-periods, and the RMS
    separation must be wide (0 vs ~0.74) — no knife-edge frames."""
    from big_data_audio_classification_spark.operators.audio import (
        VAD_FRAMES_PER_REC,
        VAD_PERIOD_FRAMES,
        VAD_RECS,
        _vad_gate,
        audio_vad_segments,
    )

    active = {
        (rec, f)
        for rec in range(VAD_RECS)
        for f in range(VAD_FRAMES_PER_REC)
        if _vad_gate(rec, f // VAD_PERIOD_FRAMES)
    }
    covered = set()
    for r in audio_vad_segments(spark, sf_dir).collect():
        for f in range(r.seg_start, r.seg_end + 1):
            assert (r.rec_id, f) in active
            covered.add((r.rec_id, f))
        assert r.n_frames == r.seg_end - r.seg_start + 1
        # maximality: the frames flanking each segment are gated off
        if r.seg_start > 0:
            assert (r.rec_id, r.seg_start - 1) not in active
        if r.seg_end < VAD_FRAMES_PER_REC - 1:
            assert (r.rec_id, r.seg_end + 1) not in active
    assert covered == active


def test_scene_segments_tile_and_cut_correctly(spark, sf_dir):
    """Scenes must tile each media's frame range exactly; every
    interior boundary must be a real >threshold luminance jump and
    every interior non-boundary must not be."""
    import hashlib

    import pandas as pd

    from big_data_audio_classification_spark.operators.multimodal import (
        SCENE_CUT_THRESHOLD,
        mm_scene_segments,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    rows = mm_scene_segments(spark, sf_dir).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)

    def lum(text, k):
        return int(
            hashlib.md5(text[k * 256 : k * 256 + 64].encode()).hexdigest()[:2],
            16,
        )

    for mid, segs in list(by_media.items())[:50]:
        text = docs.loc[mid, "text"]
        n_frames = -(-len(text) // 256)
        segs.sort(key=lambda r: r.scene_id)
        assert segs[0].start_frame == 0
        assert sum(s.n_frames for s in segs) == n_frames
        for prev, cur in zip(segs, segs[1:]):
            assert cur.start_frame == prev.start_frame + prev.n_frames
            k = cur.start_frame
            assert abs(lum(text, k) - lum(text, k - 1)) > SCENE_CUT_THRESHOLD
        for s in segs:
            for k in range(s.start_frame + 1, s.start_frame + s.n_frames):
                assert abs(lum(text, k) - lum(text, k - 1)) <= SCENE_CUT_THRESHOLD

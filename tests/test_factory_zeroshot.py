import numpy as np
import pytest

from vidchapters_tpu.factory.analysis import (
    detect_language,
    gender_stats,
    language_stats,
    toxicity_stats,
)
from vidchapters_tpu.factory.asr import (
    merge_and_process,
    normalize_video_id,
    proc_asr,
    run_sharded_asr,
)
from vidchapters_tpu.factory.chapters import (
    clean_title,
    description_to_chapters,
    extract_timestamp,
    mine_chapters,
)
from vidchapters_tpu.factory.features import preprocess_frames
from vidchapters_tpu.factory.preproc import (
    chapters_to_dvc,
    chapters_to_vmr,
    vitt_to_dvc,
    youcook_to_dvc,
)
from vidchapters_tpu.zeroshot.grounding import (
    clip_grounding_spans,
    evaluate_predictions,
    random_grounding_spans,
)
from vidchapters_tpu.zeroshot.speech_vcg import (
    first_sentence_titler,
    speech_chapters,
)
from vidchapters_tpu.zeroshot.texttiling import TextTilingTokenizer
from vidchapters_tpu.zeroshot.visual_vcg import (
    feature_shot_detection,
    shots_from_boundaries,
    visual_chapters,
)


# --------------------------------------------------------------- chapters

def test_extract_timestamp_formats():
    assert extract_timestamp("0:00 Intro")[1] == 0
    assert extract_timestamp("1:23 Part one")[1] == 83
    assert extract_timestamp("01:02:03 Deep dive")[1] == 3723
    assert extract_timestamp("12:34:56:78 broken")[1] == -1
    assert extract_timestamp("123:45 broken")[1] == -1
    assert extract_timestamp("no timestamp here")[1] == -1


def test_clean_title():
    assert clean_title(" - Intro! ") == "Intro"
    assert clean_title("***") == ""
    assert clean_title("a") == "a"


def test_description_to_chapters():
    desc = "Check it out!\n0:00 Intro\n1:30 Main part\n3:45 Outro\nhttps://x.co"
    chapters = description_to_chapters(desc)
    assert [c["time"] for c in chapters] == [0, 90, 225]
    assert chapters[0]["label"] == "Intro"
    # non-monotonic -> rejected
    assert description_to_chapters("0:00 A\n2:00 B\n1:00 C") is None
    # single timestamp -> rejected
    assert description_to_chapters("0:00 only one") is None


def test_mine_chapters():
    out = mine_chapters({"v1": "0:00 Intro\n1:00 Body", "v2": "no chapters",
                         "v3": "0:00 A\n1:00 B"})  # all-1-char titles dropped
    assert set(out) == {"v1"}


# --------------------------------------------------------------- preproc

CHAPTER_DATA = {
    "vidA": {"duration": 300.0,
             "chapters": [{"label": "Intro", "time": 0},
                          {"label": "Body", "time": 100},
                          {"label": "End", "time": 200}]},
    "vidB": {"chapters": [{"label": "X", "time": 0}]},  # no duration
}


def test_chapters_to_dvc():
    out = chapters_to_dvc(CHAPTER_DATA)["all"]
    assert "vidA" in out and "vidB" not in out
    assert out["vidA"]["timestamps"] == [[0.0, 100.0], [100.0, 200.0],
                                         [200.0, 300.0]]
    assert out["vidA"]["sentences"] == ["Intro", "Body", "End"]


def test_chapters_to_vmr():
    splits = {"train": {"vidA"}, "val": set(), "test": set()}
    rows = chapters_to_vmr(CHAPTER_DATA, splits)
    assert len(rows["train"]) == 1
    row = rows["train"][0]
    assert row["query"] == ["Intro", "Body", "End"]
    assert row["relevant_windows"][0] == [[0.0, 100.0]]
    # val split: one row per query with prefixed vid
    splits = {"train": set(), "val": {"vidA"}, "test": set()}
    rows = chapters_to_vmr(CHAPTER_DATA, splits)
    assert len(rows["val"]) == 3
    assert rows["val"][0]["vid"] == "0vidA"


def test_vitt_and_youcook_converters():
    rows = [{"id": "v1", "annotations": [
        {"timestamp_ms": 0, "tag": "Start"},
        {"timestamp_ms": 60000, "tag": "Middle"}]},
        {"id": "v1", "annotations": [{"timestamp_ms": 0, "tag": "dup"}]}]
    out = vitt_to_dvc(rows, {"v1": 120.0})
    assert out["v1"]["timestamps"] == [[0.0, 60.0], [60.0, 120.0]]
    assert out["v1"]["sentences"] == ["Start", "Middle"]

    yc = youcook_to_dvc({"v2": {"duration": 100.0, "annotations": [
        {"segment": [0, 30], "sentence": "chop onions"}]}})
    assert yc["v2"]["sentences"] == ["chop onions"]


# --------------------------------------------------------------- asr

def test_run_sharded_asr_idempotent(tmp_path):
    calls = []

    def fake_transcribe(path):
        calls.append(path)
        return {"segments": [{"text": "hi", "start": 0.0, "end": 1.0}]}

    videos = [str(tmp_path / f"{c}aaaaaaaaaa.mp4") for c in "xyz"]
    n1 = run_sharded_asr(videos, str(tmp_path / "asr"), fake_transcribe)
    n2 = run_sharded_asr(videos, str(tmp_path / "asr"), fake_transcribe)
    assert n1 == 3 and n2 == 0  # second job skips everything
    merged = merge_and_process(str(tmp_path / "asr"), str(tmp_path / "m.pkl"))
    assert len(merged) == 3
    first = next(iter(merged.values()))
    assert first == {"text": ["hi"], "start": [0.0], "end": [1.0]}


def test_normalize_video_id():
    assert normalize_video_id("v_abcdefghijk.pkl") == "v_abcdefghijk"
    assert normalize_video_id("xxxxdQw4w9WgXcQ.pkl") == "dQw4w9WgXcQ"


# --------------------------------------------------------------- analysis

def test_language_detection():
    assert detect_language("the cat is on the mat and it is happy") == "en"
    assert detect_language("el gato es un animal que vive en la casa") == "es"
    stats = language_stats({"v": {"text": ["the quick brown fox is here"]}})
    assert stats.get("en", 0) == 1.0


def test_gender_and_toxicity_stats():
    g = gender_stats(["she is a woman", "he is a man", "the dog runs"])
    assert g["female_fraction"] == pytest.approx(0.5)
    t = toxicity_stats(["nice video", "lovely day"])
    assert t["toxic_fraction"] == 0.0


# --------------------------------------------------------------- features

def test_preprocess_frames_shapes():
    frames = (np.random.default_rng(0).uniform(0, 255, (2, 120, 160, 3))
              .astype(np.uint8))
    out = preprocess_frames(frames, size=64)
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == np.float32
    assert abs(out.mean()) < 3.0  # roughly normalized


# --------------------------------------------------------------- texttiling

def test_texttiling_segments_topic_shift():
    part1 = "the cat sat on the mat . cats like milk and fish . " * 8
    part2 = "rockets burn fuel in space . orbital mechanics govern satellites . " * 8
    text = part1.replace(" . ", " .\n") + part2.replace(" . ", " .\n")
    segments = TextTilingTokenizer(w=8, k=4).tokenize(text)
    assert len(segments) >= 2
    assert "".join(segments).replace("\n", " ").split() == text.replace("\n", " ").split()


def test_texttiling_short_text_single_segment():
    assert TextTilingTokenizer().tokenize("too short") == ["too short"]


# --------------------------------------------------------------- zero-shot

def test_speech_chapters():
    sub = {"text": [f"line about cooking {i}" for i in range(4)]
           + [f"line about racing cars {i}" for i in range(4)],
           "start": [float(10 * i) for i in range(8)],
           "end": [float(10 * i + 8) for i in range(8)]}
    chapters = speech_chapters(sub, duration=100.0,
                               titler=first_sentence_titler,
                               tiler=TextTilingTokenizer(w=4, k=2))
    assert len(chapters) >= 1
    assert chapters[0]["timestamp"][0] == 0.0
    assert all(c["timestamp"][1] <= 100.0 for c in chapters)


def test_clip_grounding_plateau():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(10, 8)).astype(np.float32)
    frames /= np.linalg.norm(frames, axis=-1, keepdims=True)
    text = frames[3:4] + 0.01 * rng.normal(size=(1, 8)).astype(np.float32)
    spans = clip_grounding_spans(text, frames, [float(i) for i in range(10)],
                                 duration=10.0, threshold=0.0001)
    assert spans[0][0] == 3.0
    assert spans[0][1] > spans[0][0]


def test_random_grounding_and_metrics(rng):
    spans = random_grounding_spans(2, 100.0, rng=rng)
    assert len(spans) == 2
    results = {"v": {"pred": [[0, 10]], "gt": [[0, 10]]}}
    m = evaluate_predictions(results)
    assert m["Recall@0.9"] == 1.0
    assert m["Recall@1s"] == 1.0


def test_feature_shot_detection():
    a = np.tile(np.array([1.0, 0.0, 0.0, 0.0]), (5, 1))
    b = np.tile(np.array([0.0, 1.0, 0.0, 0.0]), (5, 1))
    feats = np.concatenate([a, b]).astype(np.float32)
    times = [float(i) for i in range(10)]
    bounds = feature_shot_detection(feats, times, threshold=0.5)
    assert bounds == [5.0]
    shots = shots_from_boundaries(bounds, 10.0)
    assert shots == [(0.0, 5.0), (5.0, 10.0)]
    chapters = visual_chapters(shots, captioner=lambda t: f"shot at {t}")
    assert len(chapters) == 2


# ---------------------------------------------------------------------------
# audio loading + demo_asr jax backend
# ---------------------------------------------------------------------------


def test_load_audio_wav_resample_and_npy(tmp_path):
    import wave

    import numpy as np

    from vidchapters_tpu.factory.audio import SAMPLE_RATE, load_audio

    sr0 = 22050
    t = np.arange(sr0) / sr0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = (np.stack([sig, sig], 1) * 32767).astype(np.int16)
    wav = tmp_path / "tone.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr0)
        w.writeframes(pcm.tobytes())
    audio = load_audio(str(wav))
    assert audio.dtype == np.float32
    assert abs(len(audio) - SAMPLE_RATE) < 2  # resampled to 16 kHz
    assert abs(float(np.max(audio)) - 0.5) < 0.01

    npy = tmp_path / "tone.npy"
    np.save(npy, sig)
    assert load_audio(str(npy)).shape == sig.shape


def test_load_audio_needs_ffmpeg_message(tmp_path):
    import shutil

    import pytest as _pytest

    from vidchapters_tpu.factory.audio import load_audio

    if shutil.which("ffmpeg"):
        _pytest.skip("ffmpeg present; error path not reachable")
    with _pytest.raises(RuntimeError, match="ffmpeg"):
        load_audio(str(tmp_path / "clip.mp4"))


def test_demo_asr_cli_jax_backend(tmp_path, monkeypatch):
    """Drive the demo_asr CLI with a tiny random model standing in for the
    HF checkpoint (weights are not downloadable here)."""
    import pickle
    import wave

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidchapters_tpu.demo import demo_asr
    from vidchapters_tpu.factory.whisper_transcribe import TIMESTAMP_BEGIN
    from vidchapters_tpu.models.whisper import Whisper, WhisperConfig

    cfg = WhisperConfig(vocab_size=TIMESTAMP_BEGIN + 1501, num_mel_bins=80,
                        d_model=32, encoder_layers=1, decoder_layers=1,
                        num_heads=4, d_ff=64, max_source_positions=1500,
                        max_target_positions=64, dtype="float32")
    model = Whisper(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 80, 3000), jnp.float32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    monkeypatch.setattr("vidchapters_tpu.models.whisper.load_hf_whisper",
                        lambda name: (model, params))

    class _Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    import transformers

    monkeypatch.setattr(transformers.WhisperTokenizer, "from_pretrained",
                        staticmethod(lambda name: _Tok()))

    wav = tmp_path / "in.wav"
    sig = (np.random.default_rng(0).normal(size=16000 * 2) * 0.05
           ).astype(np.float32)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((sig * 32767).astype(np.int16).tobytes())
    out = tmp_path / "out.pkl"
    demo_asr.main(["--video_path", str(wav), "--out", str(out),
                   "--backend", "jax"])
    result = pickle.load(open(out, "rb"))
    assert "segments" in result
    for seg in result["segments"]:
        assert set(seg) == {"text", "start", "end"}


def test_extract_features_sharded_pipelined(tmp_path):
    """Sharded extraction with background decode prefetch: idempotent,
    correct outputs, decode overlaps compute."""
    import threading
    import time

    from vidchapters_tpu.factory.features import extract_features_sharded

    decoded = []
    lock = threading.Lock()

    def decode(path):
        time.sleep(0.05)
        with lock:
            decoded.append(path)
        i = int(path[-5])
        return np.full((3, 4), i, np.float32)

    overlapped = []

    def extractor(frames):
        # by the time video i encodes, video i+1 (or further) should have
        # been decoded by the prefetch thread after a short wait
        time.sleep(0.08)
        with lock:
            overlapped.append(len(decoded))
        return frames * 2.0

    paths = [f"/fake/vid{i}.mp4" for i in range(4)]
    done = extract_features_sharded(paths, str(tmp_path), extractor,
                                    decode_fn=decode, prefetch=2)
    assert done == 4
    for i in range(4):
        arr = np.load(tmp_path / f"vid{i}.npy")
        np.testing.assert_array_equal(arr, np.full((3, 4), 2.0 * i))
    # during the LAST extractor call all 4 videos must already be decoded
    # (prefetch ran ahead); strictly serial decode would give 4 only after
    assert overlapped[-1] == 4
    assert max(overlapped[:-1]) >= 3  # decode ran ahead of compute
    # idempotent: second run does nothing
    assert extract_features_sharded(paths, str(tmp_path), extractor,
                                    decode_fn=decode) == 0


def test_extract_features_sharded_sync_and_workers(tmp_path):
    """prefetch=0 reproduces the reference's synchronous
    decode-between-batches VideoLoader (bench contrast mode); multiple
    decode workers produce identical outputs."""
    import threading

    from vidchapters_tpu.factory.features import extract_features_sharded

    decoded = []
    lock = threading.Lock()

    def decode(path):
        with lock:
            decoded.append(path)
        i = int(path[-5])
        return np.full((3, 4), i, np.float32)

    order = []

    def extractor(frames):
        # synchronous mode: when video i encodes, exactly i+1 decodes ran
        with lock:
            order.append(len(decoded))
        return frames + 1.0

    paths = [f"/fake/vid{i}.mp4" for i in range(4)]
    done = extract_features_sharded(paths, str(tmp_path / "sync"), extractor,
                                    decode_fn=decode, prefetch=0)
    assert done == 4
    assert order == [1, 2, 3, 4]  # no decode ran ahead

    done = extract_features_sharded(paths, str(tmp_path / "mw"), extractor,
                                    decode_fn=decode, prefetch=2,
                                    decode_workers=3)
    assert done == 4
    for i in range(4):
        a = np.load(tmp_path / "sync" / f"vid{i}.npy")
        b = np.load(tmp_path / "mw" / f"vid{i}.npy")
        np.testing.assert_array_equal(a, np.full((3, 4), i + 1.0))
        np.testing.assert_array_equal(a, b)

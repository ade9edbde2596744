"""Chapter-generation server: engine bucketing + HTTP surface on a live
socket with a tiny random model."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import (
    DataConfig,
    GenerationConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
)
from vidchapters_tpu.data.tokenizer import build_tokenizer
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.serve import ChapterGenerator, _make_handler


def _tiny_engine(dtype="bfloat16"):
    cfg = Vid2SeqConfig(
        t5=T5Config(d_model=32, d_kv=8, d_ff=64, num_layers=1,
                    num_decoder_layers=1, num_heads=4, dtype=dtype),
        vit=TemporalViTConfig(num_features=8, embed_dim=16, depth=1,
                              num_heads=4, mlp_dim=32, dtype=dtype))
    d = DataConfig(max_feats=8, features_dim=16, max_input_tokens=64,
                   input_buckets=(32, 64, 512))
    model = Vid2Seq(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 8, 16), jnp.float32), jnp.ones((1, 4), jnp.int32),
        jnp.ones((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))["params"]
    tok = build_tokenizer("", num_bins=cfg.num_bins)
    gen = GenerationConfig(num_beams=1, max_length=8)
    return ChapterGenerator(model, params, tok, d, gen, cfg.num_bins)


def test_coalescing_batches_concurrent_requests():
    """8 concurrent requests with a slow constant-cost generate must land
    in far fewer device calls (and finish faster) than one-by-one serving
    — the decode loop's cost is per-call, not per-row (BENCH_NOTES.md)."""
    import time

    eng = _tiny_engine()
    eng._max_wait = 0.25  # batch reliably even when threads start slowly
    call_log = []
    real_generate = eng._generate

    def slow_generate(params, videos, tokens, rng):
        call_log.append(videos.shape[0])
        time.sleep(0.15)  # constant per-call cost, like dispatch-bound decode
        return real_generate(params, videos, tokens, rng)

    eng._generate = slow_generate
    feats = np.random.default_rng(0).normal(size=(20, 16)).astype(np.float32)
    asr = {"text": ["hello"], "start": [0.0], "end": [2.0]}
    # compile every (input bucket used, batch bucket) pair OUTSIDE the timed
    # region and start the dispatcher
    eng.warmup(batch_sizes=eng.batch_buckets)
    eng.generate_chapters(feats, 30.0, asr)
    call_log.clear()

    n = 8
    t0 = time.monotonic()
    threads = [threading.Thread(
        target=lambda: eng.generate_chapters(feats, 30.0, asr))
        for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    coalesced_time = time.monotonic() - t0
    coalesced_calls = len(call_log)
    assert coalesced_calls <= n // 2, call_log  # requests actually batched

    call_log.clear()
    t0 = time.monotonic()
    eng.coalesce = False
    for _ in range(n):
        eng.generate_chapters(feats, 30.0, asr)
    serial_time = time.monotonic() - t0
    assert len(call_log) == n
    # 8 serial 0.15 s calls vs <=4 coalesced ones (minus the batching wait)
    assert serial_time > 1.5 * coalesced_time, (serial_time, coalesced_time)
    eng.close()


def test_coalesced_results_match_serial():
    """Batched-with-padding results must equal one-by-one results
    (fp32 so batch-bucket padding can't flip greedy argmax ties)."""
    eng = _tiny_engine(dtype="float32")
    rng = np.random.default_rng(1)
    feats = [rng.normal(size=(20, 16)).astype(np.float32) for _ in range(4)]
    asr = [{"text": [f"line {i}"], "start": [0.0], "end": [2.0]}
           for i in range(4)]

    eng.coalesce = False
    serial = [eng.generate_chapters(f, 30.0, a) for f, a in zip(feats, asr)]

    eng.coalesce = True
    results = [None] * 4

    def work(i):
        results[i] = eng.generate_chapters(feats[i], 30.0, asr[i])

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == serial
    eng.close()


def test_buckets_clamped_to_max_input():
    eng = _tiny_engine()
    assert eng.buckets == [32, 64]  # 512 > max_input_tokens dropped
    assert eng._bucket(10) == 32
    assert eng._bucket(33) == 64
    assert eng._bucket(999) == 64  # overflow truncates to the largest


def test_pipelined_dispatch_overlaps_fetch():
    """Double-buffered dispatch (round 4): batch N+1 must LAUNCH while
    batch N's result fetch is still blocking — the chip-idle gap the
    round-3 engine paid between every pair of device calls. Non-pipelined
    mode serializes dispatch behind fetch (the contrast case)."""
    import time

    events = []

    class SlowFetchArray:
        """Stands in for an on-device result whose host fetch blocks."""

        def __init__(self, val):
            self.val = val

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.3)
            events.append(("fetch_done", time.monotonic()))
            return np.asarray(self.val)

    def run(pipeline: bool):
        eng = _tiny_engine()
        eng.pipeline = pipeline
        eng._max_wait = 0.02
        eng.warmup()  # compile with the real generate
        real_generate = eng._generate

        def generate(params, videos, tokens, rng):
            events.append(("dispatch", time.monotonic()))
            return SlowFetchArray(
                np.asarray(real_generate(params, videos, tokens, rng)))

        eng._generate = generate
        events.clear()
        feats = np.random.default_rng(0).normal(size=(20, 16)).astype(
            np.float32)
        asr = {"text": ["hello"], "start": [0.0], "end": [2.0]}
        t1 = threading.Thread(
            target=lambda: eng.generate_chapters(feats, 30.0, asr))
        t1.start()
        time.sleep(0.12)  # batch 1 is dispatched and mid-fetch by now
        t2 = threading.Thread(
            target=lambda: eng.generate_chapters(feats, 30.0, asr))
        t2.start()
        t1.join()
        t2.join()
        kinds = [k for k, _ in events]
        eng.close()
        return kinds

    assert run(pipeline=True)[:2] == ["dispatch", "dispatch"]
    assert run(pipeline=False)[:2] == ["dispatch", "fetch_done"]


def test_generate_chapters_shapes_and_schema():
    eng = _tiny_engine()
    feats = np.random.default_rng(0).normal(size=(20, 16)).astype(np.float32)
    asr = {"text": ["hello there"], "start": [0.5], "end": [3.0]}
    chapters = eng.generate_chapters(feats, duration=30.0, asr=asr)
    for ch in chapters:  # random model may emit none; schema must hold
        assert set(ch) == {"sentence", "timestamp"}
        s, e = ch["timestamp"]
        assert 0.0 <= s <= e <= 30.0
    # no-ASR path (video-only chapters, dvc_dataset eos-only input)
    assert isinstance(eng.generate_chapters(feats, 30.0, None), list)


@pytest.mark.slow
def test_http_surface_end_to_end():
    from http.server import ThreadingHTTPServer

    eng = _tiny_engine()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(eng))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def req(path, payload=None):
            data = (json.dumps(payload).encode()
                    if payload is not None else None)
            r = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                       data=data)
            try:
                with urllib.request.urlopen(r, timeout=120) as resp:
                    return resp.status, json.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, body = req("/healthz")
        assert code == 200 and body["ok"] and body["buckets"] == [32, 64]

        feats = np.zeros((10, 16)).tolist()
        code, body = req("/v1/chapters",
                         {"features": feats, "duration": 12.0,
                          "asr": {"text": ["hi"], "start": [0.0],
                                  "end": [2.0]}})
        assert code == 200 and isinstance(body["chapters"], list)

        code, body = req("/v1/chapters", {"features": [1.0], "duration": 5})
        assert code == 400 and "frames, dim" in body["error"]
        code, body = req("/v1/chapters", {"features": feats})
        assert code == 400
        code, body = req("/v1/nope", {})
        assert code == 404
    finally:
        httpd.shutdown()


def test_close_fails_stranded_requests_and_rejects_new(monkeypatch):
    """ADVICE r2: requests queued behind the shutdown sentinel must not
    block forever — close() drains them with an error — and enqueues after
    close() are rejected."""
    from vidchapters_tpu.serve import _Pending

    engine = _tiny_engine()
    engine.coalesce = True
    # strand a request deterministically: never start the dispatcher
    stranded = _Pending(np.zeros((8, 16), np.float32),
                        np.zeros(32, np.int32), 32)
    engine._queue.put(stranded)
    engine.close()
    assert stranded.event.is_set()
    assert isinstance(stranded.error, RuntimeError)
    with pytest.raises(RuntimeError, match="closed"):
        engine.generate_chapters(np.zeros((8, 16), np.float32), 10.0)


def test_close_during_inflight_device_call_still_wakes_requests():
    """Round-4 regression: with pipeline=True, a device call that OUTLIVES
    close()'s join timeout must still wake its requests. The completion
    thread therefore ends on the dispatcher's own sentinel (enqueued after
    its last in-flight result), never on one injected by close() while the
    dispatcher is mid-call — otherwise the late (group, seqs) has no
    consumer and every caller hangs forever in event.wait()."""
    import time

    eng = _tiny_engine()
    eng.pipeline = True
    eng._max_wait = 0.02
    eng._close_timeout = 0.1  # expire the join while the call is in flight
    eng.warmup()
    real_generate = eng._generate
    release = threading.Event()

    def slow_generate(params, videos, tokens, rng):
        release.wait(timeout=10.0)  # device call far longer than the join
        return real_generate(params, videos, tokens, rng)

    eng._generate = slow_generate
    feats = np.random.default_rng(0).normal(size=(20, 16)).astype(np.float32)
    asr = {"text": ["hello"], "start": [0.0], "end": [2.0]}
    result = {}
    t = threading.Thread(target=lambda: result.update(
        out=eng.generate_chapters(feats, 30.0, asr)))
    t.start()
    time.sleep(0.3)  # dispatcher is now blocked inside the device call
    eng.close()  # join times out; completer must stay alive
    release.set()
    t.join(timeout=10.0)
    assert not t.is_alive(), "request stranded after close()"
    assert "out" in result and isinstance(result["out"], list)


def test_get_raw_video_zero_frames_falls_back(monkeypatch):
    """ADVICE r2: ffmpeg succeeding with zero decoded frames must return the
    zeros fallback, not a zero-length array."""
    import subprocess as sp

    from vidchapters_tpu.data import vc_dataset as vc

    real_run = sp.run

    def fake_run(cmd, **kw):
        if cmd[0] == "ffprobe":
            return type("R", (), {"stdout": "64,64"})()
        return type("R", (), {"stdout": b""})()  # ffmpeg: zero frames

    monkeypatch.setattr(vc.subprocess, "run", fake_run)
    frames = vc.get_raw_video("whatever.mp4", resolution=32)
    assert frames.shape == (1, 32, 32, 3)
    assert (frames == 0).all()


def test_load_serving_params_torch_and_orbax(tmp_path):
    """serve --ckpt accepts a released reference .pth (torch_import) or an
    orbax best/last dir (production deployments serve released weights)."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import numpy as np

    from tests.test_checkpoint_import_fullscale import (
        _synth_reference_state_dict,
    )
    from vidchapters_tpu.config import (
        DataConfig,
        ExperimentConfig,
        T5Config,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.serve import load_serving_params

    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64, num_layers=1,
                  num_decoder_layers=1, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=1, num_heads=2,
                            mlp_dim=16, dtype="float32")
    cfg = ExperimentConfig(
        model=Vid2SeqConfig(t5=t5, vit=vit, num_bins=100),
        data=DataConfig(max_feats=8, features_dim=8))
    model = Vid2Seq(cfg.model)

    rng1 = np.random.default_rng(1)
    sd = _synth_reference_state_dict(
        rng1, vocab=32200, d=32, heads=4, dkv=8, dff=64, layers=1,
        rel_buckets=8, vit_mlp=16, vit_depth=1, vit_d=8, vit_feats=8)
    sd["proj_v2t.weight"] = rng1.normal(scale=0.02, size=(32, 8)
                                        ).astype(np.float32)
    sd["proj_v2t.bias"] = np.zeros(32, np.float32)
    pth = tmp_path / "released.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(pth))

    params = load_serving_params(cfg, model, str(pth))
    np.testing.assert_array_equal(
        np.asarray(params["t5"]["shared"]["embedding"]),
        sd["t5_model.shared.weight"])

    # orbax round trip: save as (params,) like the vc/grounding mains
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save_last((params,), epoch=0)
    restored = load_serving_params(cfg, model, str(tmp_path / "ck"))
    np.testing.assert_array_equal(
        np.asarray(restored["t5"]["shared"]["embedding"]),
        sd["t5_model.shared.weight"])
    # random init path still works
    rnd = load_serving_params(cfg, model, None)
    assert jax.tree_util.tree_structure(rnd) == \
        jax.tree_util.tree_structure(params)


def test_load_serving_params_torch_scanned(tmp_path):
    """serve --ckpt <released .pth> under a scan_layers config restacks
    the imported tree to the scanned layout."""
    import pytest

    torch = pytest.importorskip("torch")
    import numpy as np

    from tests.test_checkpoint_import_fullscale import (
        _synth_reference_state_dict,
    )
    from vidchapters_tpu.config import (
        DataConfig,
        ExperimentConfig,
        T5Config,
        TemporalViTConfig,
        Vid2SeqConfig,
    )
    from vidchapters_tpu.models.vid2seq import Vid2Seq
    from vidchapters_tpu.serve import load_serving_params

    t5 = T5Config(vocab_size=32200, d_model=32, d_kv=8, d_ff=64,
                  num_layers=2, num_decoder_layers=2, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dtype="float32",
                  dropout_rate=0.0, scan_layers=True)
    vit = TemporalViTConfig(num_features=8, embed_dim=8, depth=2,
                            num_heads=2, mlp_dim=16, dtype="float32",
                            scan_layers=True)
    cfg = ExperimentConfig(
        model=Vid2SeqConfig(t5=t5, vit=vit, num_bins=100),
        data=DataConfig(max_feats=8, features_dim=8))
    model = Vid2Seq(cfg.model)
    rng1 = np.random.default_rng(1)
    sd = _synth_reference_state_dict(
        rng1, vocab=32200, d=32, heads=4, dkv=8, dff=64, layers=2,
        rel_buckets=8, vit_mlp=16, vit_depth=2, vit_d=8, vit_feats=8)
    sd["proj_v2t.weight"] = rng1.normal(scale=0.02, size=(32, 8)
                                        ).astype(np.float32)
    sd["proj_v2t.bias"] = np.zeros(32, np.float32)
    pth = tmp_path / "released.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(pth))
    params = load_serving_params(cfg, model, str(pth))
    assert "blocks" in params["t5"]["encoder"]
    assert "blocks" in params["visual_encoder"]
    assert params["t5"]["encoder"]["blocks"]["self_attn"]["q"][
        "kernel"].shape[0] == 2
    # structure matches what the scanned model would init
    import jax

    rnd = load_serving_params(cfg, model, None)
    assert (jax.tree_util.tree_structure(rnd)
            == jax.tree_util.tree_structure(params))

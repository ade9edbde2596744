"""End-to-end learning proof: a tiny Vid2Seq overfits 4 synthetic videos
until jit beam-4 decode reproduces the exact time-token chapter sequences —
exercising tokenization, time quantization, the train step, beam search, and
regex chapter decoding as one loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidchapters_tpu.config import (
    GenerationConfig,
    OptimConfig,
    T5Config,
    TemporalViTConfig,
    Vid2SeqConfig,
)
from vidchapters_tpu.data.time_tokens import (
    build_time_text_sequence,
    decode_chapter_sequence,
)
from vidchapters_tpu.data.tokenizer import ByteLevelTokenizer
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.train.dvc_train import (
    TrainState,
    make_generate_fn,
    make_train_step,
)
from vidchapters_tpu.train.schedules import build_optimizer


@pytest.mark.slow
def test_vid2seq_learns_chapter_generation():
    tok = ByteLevelTokenizer()
    rng = np.random.default_rng(0)
    titles = ["alpha part", "beta part"]
    videos, outputs = [], []
    for i in range(4):
        f = rng.normal(size=(16, 16)).astype(np.float32)
        f[:8] *= 3.0 if i % 2 == 0 else 0.3
        videos.append(f)
        seq = build_time_text_sequence(
            [0.0, 50.0], [50.0, 100.0],
            [titles[i % 2], titles[(i + 1) % 2]], 100.0, tok, 100, 48)
        outputs.append(np.pad(seq, (0, 48 - len(seq))))
    videos = jnp.asarray(np.stack(videos))
    outputs = jnp.asarray(np.stack(outputs))
    inp = jnp.ones((4, 1), jnp.int32)

    t5 = T5Config(vocab_size=32200, d_model=64, d_kv=16, d_ff=128,
                  num_layers=2, num_decoder_layers=2, num_heads=4,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=32, dtype="float32",
                  dropout_rate=0.0, encoder_dropout=0.0, decoder_dropout=0.0,
                  label_smoothing=0.0)
    vit = TemporalViTConfig(num_features=16, embed_dim=16, depth=1,
                            num_heads=2, mlp_dim=32, dtype="float32")
    model = Vid2Seq(Vid2SeqConfig(t5=t5, vit=vit))
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, videos, inp,
                        jnp.ones_like(inp), outputs)["params"]
    tx = build_optimizer(OptimConfig(lr=3e-3, clip_max_norm=1.0,
                                     fraction_warmup_steps=0.0, schedule=""),
                         400)
    step = jax.jit(make_train_step(model, tx, denoising=0.0))
    state = TrainState(params, tx.init(params), jnp.array(0))
    batch = {"video": videos, "input_tokens": inp, "output_tokens": outputs}
    for _ in range(400):
        state, metrics = step(state, batch, key)
    assert float(metrics["total_loss"]) < 0.5

    generate = make_generate_fn(model, GenerationConfig(num_beams=4,
                                                        max_length=32))
    seqs = generate(state.params, videos, inp, key)
    texts = tok.batch_decode(np.asarray(seqs), skip_special_tokens=True)
    good = 0
    for i, text in enumerate(texts):
        events = decode_chapter_sequence(text, 100.0, 100)
        want = titles[i % 2].capitalize() + "."
        good += (len(events) == 2 and events[0]["sentence"] == want
                 and abs(events[0]["timestamp"][0]) < 2
                 and abs(events[0]["timestamp"][1] - 50.0) < 2)
    assert good >= 3, texts

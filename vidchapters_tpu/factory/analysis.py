"""Dataset analysis: language / gender / toxicity statistics.

Counterpart of analysis/ (language.py:55-74, gender.py:8-21, nsfw.py:60-121).
Language ID runs the char n-gram model in factory/langid.py (the
langdetect model family); gender metrics the GenBit implementation in
factory/genbit.py; toxicity/NSFW the Flax BERT / CLIP-MLP classifiers
below — all fully offline.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Dict, Iterable, Optional


def detect_language(text: str) -> str:
    """Char n-gram language id (factory/langid.py — the langdetect-model
    equivalent of analysis/language.py:8,67); 'unknown' on empty or
    featureless text."""
    from vidchapters_tpu.factory import langid

    try:
        return langid.detect(text)
    except ValueError:
        return "unknown"


def language_stats(asr: Dict[str, dict],
                   detector: Optional[Callable[[str], str]] = None
                   ) -> Dict[str, float]:
    """Fraction of videos per detected ASR language (language.py:55-74).
    Pass ``detector=langdetect.detect`` for the reference behavior when the
    package is installed."""
    detector = detector or detect_language
    counts: Counter = Counter()
    for vid, sub in asr.items():
        text = " ".join(sub.get("text", []))[:2000]
        if not text.strip():
            counts["empty"] += 1
            continue
        try:
            counts[detector(text)] += 1
        except Exception:
            counts["unknown"] += 1
    total = max(sum(counts.values()), 1)
    return {lang: n / total for lang, n in counts.most_common()}


_GENDERED = {
    "female": {"she", "her", "hers", "herself", "woman", "women", "girl",
               "girls", "mother", "mom", "sister", "daughter", "wife",
               "queen", "lady", "ladies", "actress"},
    "male": {"he", "him", "his", "himself", "man", "men", "boy", "boys",
             "father", "dad", "brother", "son", "husband", "king",
             "gentleman", "gentlemen", "actor"},
}


def gender_stats(texts: Iterable[str]) -> Dict[str, float]:
    """Gendered-term frequencies (GenBit-style aggregate, gender.py:8-21)."""
    counts = {"female": 0, "male": 0, "total_words": 0}
    for text in texts:
        words = text.lower().split()
        counts["total_words"] += len(words)
        for w in words:
            if w in _GENDERED["female"]:
                counts["female"] += 1
            elif w in _GENDERED["male"]:
                counts["male"] += 1
    total_gendered = counts["female"] + counts["male"]
    return {
        "female_fraction": counts["female"] / max(total_gendered, 1),
        "male_fraction": counts["male"] / max(total_gendered, 1),
        "gendered_word_rate": total_gendered / max(counts["total_words"], 1),
    }


def toxicity_stats(texts: Iterable[str],
                   scorer: Optional[Callable[[str], float]] = None,
                   threshold: float = 0.5) -> Dict[str, float]:
    """Fraction of texts flagged toxic; ``scorer`` wraps Detoxify when
    installed (nsfw.py:60-121); without one, a minimal blocklist heuristic."""
    if scorer is None:
        blocklist = {"fuck", "shit", "bitch", "asshole", "bastard", "dick"}

        def scorer(t: str) -> float:
            words = set(t.lower().split())
            return 1.0 if words & blocklist else 0.0

    scores = [scorer(t) for t in texts]
    n = max(len(scores), 1)
    return {
        "toxic_fraction": sum(s > threshold for s in scores) / n,
        "mean_score": sum(scores) / n,
    }


def build_toxicity_scorer(model_dir: str, max_length: int = 256):
    """Detoxify-equivalent scorer: an HF ``BertForSequenceClassification``
    checkpoint directory (e.g. unitary/toxic-bert, what Detoxify wraps —
    analysis/nsfw.py:60-121) run through the in-repo Flax BERT
    (models/bert.py) plus the pooler + classification head.  Returns
    ``scorer(text) -> float`` (sigmoid of the first/toxic label)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from transformers import AutoConfig, AutoTokenizer

    from vidchapters_tpu.models.bert import (
        BertConfig,
        BertModel,
        convert_hf_bert,
    )

    tok = AutoTokenizer.from_pretrained(model_dir)
    hf_cfg = AutoConfig.from_pretrained(model_dir)
    from transformers import BertForSequenceClassification

    hf = BertForSequenceClassification.from_pretrained(
        model_dir, torch_dtype=torch.float32)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    del hf
    cfg = BertConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        type_vocab_size=hf_cfg.type_vocab_size)
    params = jax.tree_util.tree_map(jnp.asarray, convert_hf_bert(
        {k.removeprefix("bert."): v for k, v in sd.items()
         if k.startswith("bert.")}))
    wp = jnp.asarray(np.asarray(sd["bert.pooler.dense.weight"]).T)
    bp = jnp.asarray(sd["bert.pooler.dense.bias"])
    wc = jnp.asarray(np.asarray(sd["classifier.weight"]).T)
    bc = jnp.asarray(sd["classifier.bias"])
    model = BertModel(cfg)

    @jax.jit
    def score(ids, mask):
        h = model.apply({"params": params}, ids, attention_mask=mask)
        pooled = jnp.tanh(h[:, 0] @ wp + bp)
        return jax.nn.sigmoid(pooled @ wc + bc)

    def scorer(text: str) -> float:
        enc = tok([text], truncation=True, max_length=max_length,
                  padding="max_length", return_tensors="np")
        out = score(jnp.asarray(enc["input_ids"], jnp.int32),
                    jnp.asarray(enc["attention_mask"], jnp.int32))
        return float(out[0, 0])  # first label = toxic (toxic-bert layout)

    return scorer


def build_nsfw_scorer(weights_npz: str):
    """CLIP-NSFW head (analysis/nsfw.py:60-93): a small MLP over
    L2-normalized CLIP image embeddings.  ``weights_npz`` holds the
    LAION detector's dense layers converted to
    ``w0, b0, w1, b1, ...`` (ReLU between layers, sigmoid output).
    Returns ``scorer(embeddings [B, D]) -> [B] scores``."""
    import numpy as np

    data = np.load(weights_npz)
    layers = []
    i = 0
    while f"w{i}" in data:
        layers.append((np.asarray(data[f"w{i}"], np.float32),
                       np.asarray(data[f"b{i}"], np.float32)))
        i += 1
    if not layers:
        raise ValueError(f"no dense layers (w0/b0...) in {weights_npz}")

    def scorer(embeddings: "np.ndarray") -> "np.ndarray":
        x = np.asarray(embeddings, np.float32)
        x = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
        for j, (w, b) in enumerate(layers):
            x = x @ w + b
            if j < len(layers) - 1:
                x = np.maximum(x, 0.0)
        return 1.0 / (1.0 + np.exp(-x[..., 0]))

    return scorer


# ---------------------------------------------------------------------------
# Idempotent sharded analysis jobs + CLI (the reference's standalone
# analysis scripts, run manually per README)
# ---------------------------------------------------------------------------


def analyze_language_job(asr_dir: str, out_dir: str, shuffle_seed: int = 0
                         ) -> int:
    """Per-video ASR language detection (analysis/language.py:55-74):
    reads ``<vid>.pkl`` ASR files, writes ``{"asr_lang": code}`` pickles,
    skips existing outputs so concurrent shards cooperate (the reference's
    idempotent-resumable job pattern). Returns videos processed."""
    import pickle
    import random
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = sorted(Path(asr_dir).glob("*.pkl"))
    random.Random(shuffle_seed).shuffle(files)
    done = 0
    for f in files:
        target = out / f.name
        if target.exists():
            continue
        with open(f, "rb") as fh:
            asr = pickle.load(fh)
        text = " ".join(t for t in asr.get("text", []) if t.strip())
        if not text:
            lang = None
        else:
            try:
                lang = detect_language(text)
            except Exception:
                lang = "error"  # language.py:68-69
        with open(target, "wb") as fh:
            pickle.dump({"asr_lang": lang}, fh)
        done += 1
    return done


def analyze_gender_job(chapters_pkl: str, out_json: str,
                       context_window: int = 5, distance_weight: float = 0.95,
                       percentile_cutoff: int = 80) -> dict:
    """GenBit-style gender metrics over all chapter titles
    (analysis/gender.py:8-21); writes the metrics json and returns it."""
    import json
    import pickle

    from vidchapters_tpu.factory.genbit import GenBitMetrics

    with open(chapters_pkl, "rb") as f:
        data = pickle.load(f)
    titles = [c["label"] for vid in sorted(data)
              for c in data[vid].get("chapters", [])]
    g = GenBitMetrics("en", context_window=context_window,
                      distance_weight=distance_weight,
                      percentile_cutoff=percentile_cutoff)
    g.add_data(titles, tokenized=False)
    metrics = g.get_metrics(output_statistics=True, output_word_list=True)
    with open(out_json, "w") as f:
        json.dump(metrics, f, default=float)
    return metrics


def _main() -> None:
    import argparse
    import json

    p = argparse.ArgumentParser(
        description="dataset analysis jobs (language / gender)")
    sub = p.add_subparsers(dest="job", required=True)
    pl_ = sub.add_parser("language")
    pl_.add_argument("--asr-dir", required=True)
    pl_.add_argument("--out-dir", required=True)
    pg = sub.add_parser("gender")
    pg.add_argument("--chapters-pkl", required=True)
    pg.add_argument("--out-json", required=True)
    a = p.parse_args()
    if a.job == "language":
        n = analyze_language_job(a.asr_dir, a.out_dir)
        print(json.dumps({"processed": n}))
    else:
        m = analyze_gender_job(a.chapters_pkl, a.out_json)
        print(json.dumps({k: m[k] for k in (
            "genbit_score",
            "percentage_of_male_gender_definition_words",
            "percentage_of_female_gender_definition_words",
            "percentage_of_non_binary_gender_definition_words")}))


if __name__ == "__main__":
    _main()

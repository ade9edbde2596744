"""Single-video ASR demo: transcribe + align -> pickle.

Counterpart of demo_asr.py:16-26 (whisper large-v2 transcribe -> whisperx
align -> pickle). Backends:
- ``jax`` (default): HF whisper weights converted to the JAX model,
  chunked transcription with temperature fallback
  (factory.whisper_transcribe), segments produced directly;
- ``whisperx``: upstream whisper + whisperx when installed (reference
  behavior);
- ``hf``: transformers pipeline with chunk timestamps.

Usage: python -m vidchapters_tpu.demo.demo_asr --video_path v.wav --out v.pkl
"""

from __future__ import annotations

import argparse

from vidchapters_tpu.utils.io import save_pickle


def align_segments(model, params, tokenizer, audio, segments) -> dict:
    """Word-level timings for transcribed segments via cross-attention DTW
    (factory/align.py) — the role whisperx.align plays in the reference
    demo (demo_asr.py:21-26). Output mirrors whisperx's schema: each
    segment gains ``words`` and a flat ``word_segments`` list is added."""
    import numpy as np

    from vidchapters_tpu.factory.align import align_words_batch
    from vidchapters_tpu.factory.audio import (
        N_SAMPLES,
        SAMPLE_RATE,
        log_mel_spectrogram,
    )
    from vidchapters_tpu.factory.whisper_transcribe import (
        LANG_EN,
        NO_TIMESTAMPS,
        SOT,
        TRANSCRIBE,
    )

    # teacher-force the decoder's training-time prefix (whisper
    # find_alignment does the same); toy test configs with tiny vocabs
    # drop the out-of-range ids and still exercise the slicing
    vocab = int(model.cfg.vocab_size)
    prefix = tuple(t for t in (SOT, LANG_EN, TRANSCRIBE, NO_TIMESTAMPS)
                   if t < vocab)

    todo = []  # (segment, mel, ids, token_words, seconds)
    for seg in segments:
        seg["words"] = []
        ids = tokenizer.encode(seg["text"], add_special_tokens=False)
        # window trimmed to the SEGMENT's bounds: an untrimmed 30 s window
        # made the complete DTW stamp each segment's last word with
        # end ~= start + 30 s, overlapping every following segment
        s0 = int(seg["start"] * SAMPLE_RATE)
        s1 = int(min(seg["end"] * SAMPLE_RATE, s0 + N_SAMPLES, len(audio)))
        window = audio[s0:s1]
        if not ids or len(window) < SAMPLE_RATE // 10:
            continue  # empty text, or start at/past end of audio
        # group BPE pieces into words: the word's full text rides its
        # first token, continuations pass "" (align_words merge rule)
        pieces = [tokenizer.decode([t]) for t in ids]
        token_words = []
        widx = []  # indices of word-initial tokens
        for i, piece in enumerate(pieces):
            if piece.startswith(" ") or not widx:
                widx.append(i)
                token_words.append(piece.strip())
            else:
                token_words[-1] += piece
        tw = [""] * len(ids)
        for k, i in enumerate(widx):
            tw[i] = token_words[k]
        todo.append((seg, np.asarray(log_mel_spectrogram(window)), ids, tw,
                     len(window) / SAMPLE_RATE))

    # one batched encoder + decoder call across all segments
    aligned = align_words_batch(
        model, params, [t[1] for t in todo], [t[2] for t in todo],
        [t[3] for t in todo], [t[4] for t in todo], prefix_ids=prefix)
    word_segments = []
    for (seg, _, _, _, _), words in zip(todo, aligned):
        for w in words:
            w["start"] = round(w["start"] + seg["start"], 3)
            w["end"] = round(w["end"] + seg["start"], 3)
        seg["words"] = words
        word_segments.extend(words)
    return {"segments": segments, "word_segments": word_segments}


def jax_transcribe(audio_path: str, model_name: str = "large-v2",
                   vad: bool = False, align: bool = False,
                   language: str | None = None) -> dict:
    """TPU-native path: HF weights -> JAX Whisper -> chunked decode."""
    from transformers import WhisperTokenizer

    from vidchapters_tpu.factory.audio import load_audio
    from vidchapters_tpu.factory.whisper_transcribe import JaxWhisperTranscriber
    from vidchapters_tpu.models.whisper import load_hf_whisper

    hf_name = (model_name if "/" in model_name
               else f"openai/whisper-{model_name}")
    model, params = load_hf_whisper(hf_name)
    tok = WhisperTokenizer.from_pretrained(hf_name)
    # language=None auto-detects per video (openai-whisper semantics,
    # the reference demo's behavior via model.transcribe)
    tr = JaxWhisperTranscriber(model, params, decode_tokens=tok.decode,
                               vad=vad, language=language)
    audio = load_audio(audio_path)
    out = tr.transcribe(audio)
    segments = [{"text": t, "start": s, "end": e}
                for t, s, e in zip(out["text"], out["start"], out["end"])]
    if align:
        aligned = align_segments(model, tr.params, tok, audio, segments)
        aligned.setdefault("language", out.get("language", "en"))
        return aligned
    # ``language`` matches openai-whisper's result schema
    # (whisper_inference.py:48; whisper_align.py:30-41 groups on it)
    return {"segments": segments, "language": out.get("language", "en")}


def transcribe(video_path: str, model_name: str = "large-v2",
               device: str = "cpu", backend: str = "jax",
               vad: bool = False, align: bool = False,
               language: str | None = None) -> dict:
    if backend == "whisperx":
        import whisper
        import whisperx

        model = whisper.load_model(model_name, device)
        # language=None keeps openai-whisper's per-video auto-detection
        result = model.transcribe(video_path, language=language)
        align_model, metadata = whisperx.load_align_model(
            language_code=result["language"], device=device)
        return whisperx.align(result["segments"], align_model, metadata,
                              video_path, device)
    if backend == "hf":
        from vidchapters_tpu.factory.asr import make_hf_whisper_transcribe

        return make_hf_whisper_transcribe(f"openai/whisper-{model_name}",
                                          device,
                                          language=language)(video_path)
    return jax_transcribe(video_path, model_name, vad=vad, align=align,
                          language=language)


def main(args=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="large-v2")
    p.add_argument("--device", default="cpu")
    p.add_argument("--backend", default="jax",
                   choices=["jax", "whisperx", "hf"])
    p.add_argument("--vad", action="store_true",
                   help="energy-VAD silence skipping (the role whisperx's "
                        "pyannote VAD plays in the reference --faster path)")
    p.add_argument("--align", action="store_true",
                   help="word-level timings via cross-attention DTW (the "
                        "whisperx.align step of the reference demo)")
    p.add_argument("--language", default=None,
                   help="pin the spoken language code (e.g. en); default "
                        "auto-detects per video like the reference's bare "
                        "model.transcribe")
    a = p.parse_args(args)
    result = transcribe(a.video_path, a.model, a.device, a.backend,
                        vad=a.vad, align=a.align, language=a.language)
    save_pickle(result, a.out)
    print(f"wrote {a.out} ({len(result['segments'])} segments)")


if __name__ == "__main__":
    main()

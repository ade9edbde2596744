"""Single-video ASR demo: transcribe + align -> pickle.

Counterpart of demo_asr.py:16-26 (whisper large-v2 transcribe -> whisperx
align -> pickle). Backends, in priority order:
- ``whisperx``/``whisper`` when installed (reference behavior);
- HF transformers whisper pipeline with chunk timestamps;
(the planned JAX whisper decoder will slot in here).

Usage: python -m vidchapters_tpu.demo.demo_asr --video_path v.mp4 --out v.pkl
"""

from __future__ import annotations

import argparse

from vidchapters_tpu.utils.io import save_pickle


def transcribe(video_path: str, model_name: str = "large-v2",
               device: str = "cpu") -> dict:
    try:  # reference path: whisper + whisperx alignment
        import whisper
        import whisperx

        model = whisper.load_model(model_name, device)
        result = model.transcribe(video_path)
        align_model, metadata = whisperx.load_align_model(
            language_code=result["language"], device=device)
        aligned = whisperx.align(result["segments"], align_model, metadata,
                                 video_path, device)
        return aligned
    except ImportError:
        pass
    from vidchapters_tpu.factory.asr import make_hf_whisper_transcribe

    return make_hf_whisper_transcribe(f"openai/whisper-{model_name}",
                                      device)(video_path)


def main(args=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model", default="large-v2")
    p.add_argument("--device", default="cpu")
    a = p.parse_args(args)
    result = transcribe(a.video_path, a.model, a.device)
    save_pickle(result, a.out)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()

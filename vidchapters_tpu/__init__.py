"""vidchapters_tpu — a TPU-native framework for video chapter generation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
antoyang/VidChapters (NeurIPS 2023): video chapter generation, dense video
captioning, chapter generation with ground-truth boundaries, and video chapter
grounding, plus the evaluation stack, data factory, and zero-shot baselines.

Layers (one unified framework instead of the reference's three silos):

- ``config``    — dataclass configs + dataset registry (replaces args.py / PDVC/opts.py /
                  moment_detr config.py in the reference).
- ``runtime``   — mesh/distributed init, checkpointing (orbax), meters/logging, profiling.
- ``data``      — tokenizer (T5 sentencepiece + time tokens), host-side dataset pipelines,
                  static-shape collation for XLA.
- ``models``    — Flax models: Vid2Seq (T5 + temporal ViT), Moment-DETR-style grounding,
                  PDVC-style deformable dense captioner, CLIP towers.
- ``ops``       — Pallas TPU kernels + jit-safe algorithmic ops (deformable attention,
                  beam search, Hungarian matching, span math).
- ``parallel``  — sharding rules over jax.sharding.Mesh (dp/tp), collective helpers.
- ``train``     — jit'd train/eval steps and the task entry points.
- ``evals``     — metric stack: CIDEr/METEOR/BLEU/ROUGE, tIoU-matched DVC eval, SODA,
                  moment-retrieval mAP/R@1.
- ``factory``   — offline data factory: chapter mining, ASR, feature extraction, preproc.
- ``zeroshot``  — zero-shot baselines (TextTiling, shot-detect, CLIP/BERT grounding).
"""

__version__ = "0.1.0"

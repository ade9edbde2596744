from vidchapters_tpu.ops.decoding import beam_search, greedy_decode, nucleus_sample

__all__ = ["beam_search", "greedy_decode", "nucleus_sample"]

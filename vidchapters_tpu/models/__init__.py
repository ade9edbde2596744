from vidchapters_tpu.models.vid2seq import Vid2Seq, build_vid2seq_model

__all__ = ["Vid2Seq", "build_vid2seq_model"]

from whisper_tpu.pipeline.chunk import chunk_starts, slice_mel_chunks, mel_frame_bucket
from whisper_tpu.pipeline.stitch import stitch_texts, word_overlap
from whisper_tpu.pipeline.longform import transcribe_longform
from whisper_tpu.pipeline.sequential import transcribe_sequential

__all__ = [
    "chunk_starts",
    "slice_mel_chunks",
    "mel_frame_bucket",
    "stitch_texts",
    "word_overlap",
    "transcribe_longform",
    "transcribe_sequential",
]

from .csvio import read_csv_2d, write_csv_2d
from .formats import to_srt, to_text, to_vtt
from .debug import (
    log,
    profiler_trace,
    start_profiler,
    step_timer,
    stop_profiler,
    tensor_dbg,
)
from .wer import edit_distance, iter_librispeech, wer

__all__ = [
    "edit_distance",
    "iter_librispeech",
    "log",
    "profiler_trace",
    "read_csv_2d",
    "start_profiler",
    "step_timer",
    "stop_profiler",
    "tensor_dbg",
    "to_srt",
    "to_text",
    "to_vtt",
    "wer",
    "write_csv_2d",
]

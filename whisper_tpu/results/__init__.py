from whisper_tpu.results.timelog import parse_time_log
from whisper_tpu.results.summarize import build_rows, write_summary_table

__all__ = ["parse_time_log", "build_rows", "write_summary_table"]

from whisper_tpu.bench.writers import write_per_file_csv, write_per_file_json, build_summary

__all__ = ["write_per_file_csv", "write_per_file_json", "build_summary"]

from whisper_tpu.utils.stats import percentile, stat_block
from whisper_tpu.utils.timing import Timing

__all__ = ["percentile", "stat_block", "Timing"]

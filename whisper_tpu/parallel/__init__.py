from whisper_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "replicated"]

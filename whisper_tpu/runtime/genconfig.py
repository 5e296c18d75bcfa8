"""generation_config.json loading (ref src/main.rs:102-106, 650-657).

Reads ``suppress_tokens`` / ``begin_suppress_tokens`` from the model dir's
generation_config.json; a missing file yields empty lists, exactly like the
reference.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List


@dataclass
class GenerationCfg:
    suppress_tokens: List[int] = field(default_factory=list)
    begin_suppress_tokens: List[int] = field(default_factory=list)


def load_generation_cfg(path: str) -> GenerationCfg:
    if not os.path.isfile(path):
        return GenerationCfg()
    with open(path) as f:
        data = json.load(f)
    return GenerationCfg(
        suppress_tokens=list(data.get("suppress_tokens") or []),
        begin_suppress_tokens=list(data.get("begin_suppress_tokens") or []),
    )

"""Model-id resolution (models/registry.py get_dims).

The reference passes model ids through as plain strings
(/root/reference/src/main.rs CLI); our registry also accepts the bare
shorthands scripts use ('base', 'large-v3') — queue step 4 failed on
exactly those before the alias existed (results/tpu_r5/tpu_round5c.log
07:26Z).
"""

import pytest

from whisper_tpu.models.registry import MODEL_REGISTRY, get_dims


@pytest.mark.parametrize("alias, full", [
    ("openai/whisper-base", "openai/whisper-base"),
    ("whisper-base", "openai/whisper-base"),
    ("base", "openai/whisper-base"),
    ("large-v3", "openai/whisper-large-v3"),
    ("large-v3-turbo", "openai/whisper-large-v3-turbo"),
    ("distil-large-v3", "distil-whisper/distil-large-v3"),
    ("small.en", "openai/whisper-small.en"),
])
def test_shorthand_aliases(alias, full):
    assert get_dims(alias) is MODEL_REGISTRY[full]


def test_unknown_id_lists_known_models():
    with pytest.raises(KeyError, match="openai/whisper-base"):
        get_dims("no-such-model")

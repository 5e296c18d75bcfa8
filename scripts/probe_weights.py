#!/usr/bin/env python
"""Start-of-round real-weights probe.

The #1 unproven claim (docs/REAL_WEIGHTS.md) is transcript quality on real
pretrained weights — blocked only by the zero-egress environment.  This
probe keeps the one-command path warm: run it at round start; the moment
ANY checkpoint source appears (an HF cache, a mounted weights dir, a
safetensors tree), it converts the weights into a framework model dir and
prints what to run next.

Sources checked, in order:
  1. $WHISPER_WEIGHTS_DIR — explicit pointer to an HF-format model dir
     (config.json + *.safetensors / pytorch_model.bin).
  2. HF hub cache ($HF_HOME / ~/.cache/huggingface/hub):
     models--openai--whisper-* snapshots.
  3. Shallow scan of common mount roots (/data, /mnt, /models, /weights)
     for HF-format Whisper dirs.
  4. Live egress: a cheap DNS check for huggingface.co; if it resolves,
     report that `convert_cli --model-id openai/whisper-base` should work.

Exit code 0 always (a probe, not a gate).  Prints one JSON line with the
outcome so round logs capture it:
  {"found": bool, "source": ..., "converted": [...], "next": "..."}

Usage: python scripts/probe_weights.py [--out-root models] [--convert]
  --convert actually runs the conversion (default: report only).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

MODEL_IDS = (
    "openai/whisper-base",
    "openai/whisper-small",
    "openai/whisper-medium",
    "openai/whisper-large-v3",
    "distil-whisper/distil-large-v3",
)


def _is_hf_model_dir(d: str) -> bool:
    if not os.path.isfile(os.path.join(d, "config.json")):
        return False
    try:
        with open(os.path.join(d, "config.json")) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    if cfg.get("model_type") != "whisper":
        return False
    return bool(
        glob.glob(os.path.join(d, "*.safetensors"))
        or os.path.isfile(os.path.join(d, "pytorch_model.bin"))
    )


def _hub_cache_snapshots() -> list[tuple[str, str]]:
    """(model_id, snapshot_dir) pairs from the HF hub cache, newest first
    (same cache layout resolve_tokenizer scans, ref src/main.rs:574-635)."""
    roots = []
    if os.environ.get("HF_HOME"):
        roots.append(os.path.join(os.environ["HF_HOME"], "hub"))
    roots.append(os.path.expanduser("~/.cache/huggingface/hub"))
    out = []
    for root in roots:
        for d in sorted(glob.glob(os.path.join(root, "models--*whisper*"))):
            name = os.path.basename(d)[len("models--"):].replace("--", "/")
            snaps = sorted(
                glob.glob(os.path.join(d, "snapshots", "*")),
                key=os.path.getmtime, reverse=True,
            )
            for s in snaps:
                if _is_hf_model_dir(s):
                    out.append((name, s))
                    break
    return out


def _scan_mount_roots() -> list[str]:
    hits = []
    for root in ("/data", "/mnt", "/models", "/weights", "/checkpoints"):
        if not os.path.isdir(root):
            continue
        # Shallow (depth <= 3) scan — this is a probe, not a crawler.
        for depth in ("*", "*/*", "*/*/*"):
            for d in glob.glob(os.path.join(root, depth)):
                if os.path.isdir(d) and _is_hf_model_dir(d):
                    hits.append(d)
    return hits


def _egress_available() -> bool:
    import socket

    try:
        socket.setdefaulttimeout(3)
        socket.getaddrinfo("huggingface.co", 443)
        return True
    except OSError:
        return False


def _convert(src: str, out_dir: str) -> bool:
    from whisper_tpu.models.convert import convert_hf_model_dir

    try:
        convert_hf_model_dir(src, out_dir)
        return True
    except Exception as e:  # report, keep probing other sources
        print(f"[probe] conversion failed for {src}: {e}", file=sys.stderr)
        return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out-root", default="models")
    ap.add_argument("--convert", action="store_true",
                    help="convert found checkpoints (default: report only)")
    args = ap.parse_args(argv)

    sources: list[tuple[str, str, str]] = []  # (kind, model_id/name, path)
    env_dir = os.environ.get("WHISPER_WEIGHTS_DIR", "")
    if env_dir and _is_hf_model_dir(env_dir):
        sources.append(("env", os.path.basename(env_dir.rstrip("/")), env_dir))
    for model_id, snap in _hub_cache_snapshots():
        sources.append(("hf-cache", model_id, snap))
    for d in _scan_mount_roots():
        sources.append(("mount", os.path.basename(d.rstrip("/")), d))

    converted = []
    if args.convert:
        for kind, name, path in sources:
            out_dir = os.path.join(args.out_root,
                                   name.replace("/", "--"))
            if os.path.isfile(os.path.join(out_dir, "params.safetensors")):
                converted.append(out_dir)  # already converted
                continue
            if _convert(path, out_dir):
                converted.append(out_dir)

    egress = _egress_available()
    if sources:
        nxt = (f"python -m whisper_tpu.bench --audio-dir audio/ --onnx-dir "
               f"{converted[0] if converted else 'models/<converted>'} "
               f"--write-txt  # then results/compare.py parity + wer")
    elif egress:
        nxt = ("python -m whisper_tpu.models.convert_cli --model-id "
               "openai/whisper-base --out models/whisper-base")
    else:
        nxt = "no weight source found (docs/REAL_WEIGHTS.md)"
    print(json.dumps({
        "found": bool(sources) or egress,
        "egress": egress,
        "sources": [{"kind": k, "name": n, "path": p}
                    for k, n, p in sources],
        "converted": converted,
        "next": nxt,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

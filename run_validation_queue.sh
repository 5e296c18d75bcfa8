#!/usr/bin/env bash
# One-shot runner for the queued TPU validations (S4 wrapper).
exec bash "$(dirname "$0")/scripts/tpu_validation_queue.sh" "$@"

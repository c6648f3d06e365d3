#!/bin/bash
# Regenerate tests/cache_seed.tar.zst: the committed XLA:CPU compile-cache
# seed that lets `pytest -m "not slow"` fit a 10-minute budget from an
# empty ~/.cache (cold compiles of the big split-complex programs take
# minutes each on this 1-core box).
#
# Run after kernel/solver changes that retrace the big programs:
#   bash scripts/make_test_cache_seed.sh
set -eu
cd "$(dirname "$0")/.."
cache="$HOME/.cache/ddalphaamg_tpu/xla-cpu-tests"
rm -rf "$cache"
mkdir -p "$cache"
time python -m pytest tests/ -q -m "not slow" -x
tar --zstd -cf tests/cache_seed.tar.zst -C "$cache" .
du -sh tests/cache_seed.tar.zst "$cache"

#!/bin/bash
# On-TPU validation round-up: run when the chip/relay is reachable.
# Usage: bash scripts/tpu_validate.sh [outdir]
# Covers the /verify surfaces that need real hardware:
#   1. headline benchmark (Dslash + 16^4 3-level solve)
#   2. batched multi-RHS throughput (B=4)
#   3. 32^4-class solve (BASELINE ladder step 5, single chip)
set -u
cd "$(dirname "$0")/.."
out="${1:-/tmp/tpu_validate}"
mkdir -p "$out"

echo "=== 1. headline bench ==="
timeout 1200 python bench.py 2>"$out/bench.err" | tee "$out/bench.json"

echo "=== 2. multi-RHS bench (B=4) ==="
DDAAMG_BENCH_MULTI=4 timeout 1800 python bench.py \
    2>"$out/bench_multi.err" | tee "$out/bench_multi.json"

echo "=== 3. 32^4 solve ==="
DDAAMG_BENCH_LAT=32,32,32,32 timeout 3000 python bench.py \
    2>"$out/bench_32.err" | tee "$out/bench_32.json"

echo "stderr logs in $out"

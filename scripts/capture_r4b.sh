#!/bin/bash
# Round-4 capture suite, part 2 — run sequentially on the real chip after
# capture_r4.sh. Most valuable first.
set -x
cd "$(dirname "$0")/.."

R4=benchmarks/results_r4.jsonl

# 1. trained-weights RECOGNITION serving operating curve (the VERDICT #1
#    pivot evidence: early exits on the e2e surface, recall vs img/s)
timeout 3600 python -u cli/run_cascade_serving.py

# 2. the noise-sweep tail that OOMed before the per-point frees
timeout 3600 python -u bench.py --noise-sweep 0.95,1.1,1.5 >> "$R4"

# 3. pooled cascade at a production pool (8 buckets amortize the per-level
#    host fetch that the tunnel RTT charges at batch 1024)
timeout 2400 python -u bench.py --config cascade --cascade-mode pooled \
  --batch 8192 >> "$R4"

# 4. the fail-closed audit: cascade-extract on random weights at 1M must
#    agree with the exact path (zero exits fire)
timeout 2400 python -u bench.py --extract cascade >> "$R4"

# 5. headline probe: does batch 2048 move the exact e2e?
timeout 2400 python -u bench.py --batch 2048 >> "$R4"

echo CAPTURE_B_DONE

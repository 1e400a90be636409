#!/bin/bash
# Round-4 capture suite (VERDICT r3 items #4, #6, #3, #8): run on the real
# chip, sequentially (the tunnel's compile service degrades under
# concurrency). Appends JSON lines to benchmarks/.
set -x
cd "$(dirname "$0")/.."

R4=benchmarks/results_r4.jsonl
CROSS=benchmarks/ann_crossover_r4.jsonl

# 1. the flagship (InceptionResNetV2 299^2, 1536-d) on the round-3 path
timeout 3600 python -u bench.py --variant inception_resnet_v2 >> "$R4"

# 2. the int8 e2e line
timeout 2400 python -u bench.py --match int8 >> "$R4"

# 3. the pooled cascade line (the self-declared production shape)
timeout 2400 python -u bench.py --config cascade --cascade-mode pooled >> "$R4"

# 4. the accuracy-margin noise sweep
timeout 3600 python -u bench.py --noise-sweep 0.2,0.5,0.8,0.95,1.1,1.5 >> "$R4"

# 5. small_world crossover recapture: PCA-124 walk, isotropic AND
#    intrinsic-dim-64 workloads, with DEM/BF comparators for the latter
timeout 3600 python -u scripts/sweep_ann.py --galleries 102400 --batches 1,32 \
  --budgets "" --small-world --sw-budgets 0.02,0.05,0.1,0.25 \
  --sw-pca-dim 124 --out "$CROSS"
timeout 3600 python -u scripts/sweep_ann.py --galleries 102400 --batches 1,32 \
  --budgets "" --small-world --sw-budgets 0.02,0.05,0.1,0.25 \
  --sw-pca-dim 124 --intrinsic-dim 64 --out "$CROSS"
timeout 3600 python -u scripts/sweep_ann.py --galleries 102400 --batches 1,32 \
  --budgets 0.005,0.01,0.02 --intrinsic-dim 64 --out "$CROSS"

# 6. chi2 streamed-scan cost at 100k rows (the documented-exclusion number)
timeout 1800 python -u - <<'EOF' >> "$R4"
import json, time, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from fast_image_recognition_tpu.ops.distances import streamed_topk
rng = np.random.default_rng(0)
n, d, b = 102400, 1536, 128
g = jnp.asarray(np.abs(rng.standard_normal((n, d))), jnp.float32)
q = jnp.asarray(np.abs(rng.standard_normal((b, d))), jnp.float32)
fn = jax.jit(lambda q, g: streamed_topk(q, g, k=1, kind="chi2"))
out = fn(q, g); _ = np.asarray(out[0])
t0 = time.perf_counter()
for _ in range(5):
    out = fn(q, g)
_ = np.asarray(out[0])
sec = (time.perf_counter() - t0) / 5
print(json.dumps({
    "metric": "queries/sec/chip (chi2 streamed jnp scan, D=1536, 102400 gallery)",
    "value": round(b / sec, 1), "unit": "queries/sec/chip",
    "sec_per_batch": round(sec, 4), "batch": b,
}))
EOF

echo CAPTURE_DONE

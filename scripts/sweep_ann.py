#!/usr/bin/env python
"""DEM-gather vs brute-force crossover sweep (and small_world at scale).

For each (gallery N, batch B, budget) writes one JSON line with queries/sec
for `dem-gather` and for the fused brute-force kernel `topk_l2` at the SAME
batch, plus error_pct (label accuracy on the synthetic near-duplicate
probes) and checked_pct — the accuracy/%checked operating point the
reference prints next to every latency (qt_cpp/ann.cpp:106-107, sweep at
:61-70).

Run on the real chip:
  python scripts/sweep_ann.py --out benchmarks/ann_crossover_r3.jsonl
Timing is tunnel-safe: N dispatches queued, one fetch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _time_queued(fn, fetch, iters: int) -> float:
    """Queue `iters` dispatches, fetch once; returns sec/dispatch."""
    import numpy as np

    out = fn()  # warm/compile
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks/ann_crossover_r3.jsonl")
    parser.add_argument("--galleries", default="100000,1000000")
    parser.add_argument("--batches", default="1,32,128")
    parser.add_argument("--budgets", default="0.001,0.005,0.01,0.02")
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--small-world", action="store_true",
                        help="also sweep the small_world graph matcher")
    args = parser.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.data import make_gallery_and_probes
    from fast_image_recognition_tpu.ops.distance_kernel import (
        pad_gallery,
        topk_l2,
    )
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher

    lines = []
    for n in [int(x) for x in args.galleries.split(",")]:
        n_classes = max(n // 100, 10)
        g, gl, p, pl = make_gallery_and_probes(
            n_classes, max(n // n_classes, 2), 1, args.dim, seed=0
        )
        n_actual = g.shape[0]
        gal_bf = pad_gallery(jnp.asarray(g, jnp.bfloat16))
        matcher = DirectedEnumerationMatcher(g, gl, probe_mode="gather", seed=0)
        sw = None
        if args.small_world:
            from fast_image_recognition_tpu.search.small_world import (
                SmallWorldMatcher,
            )

            t0 = time.perf_counter()
            sw = SmallWorldMatcher(g, seed=0, beam=12)
            sw_build_s = time.perf_counter() - t0

        for b in [int(x) for x in args.batches.split(",")]:
            probes = jnp.asarray(p[:b], jnp.float32)
            truth = pl[:b]

            # brute force at this batch (budget-independent)
            import jax

            bf_fn = jax.jit(
                lambda q: topk_l2(q, gal_bf, k=1, n_valid=n_actual)
            )
            bf_sec = _time_queued(
                lambda: bf_fn(probes), lambda o: o[1], args.iters
            )
            bf_idx = np.asarray(bf_fn(probes)[1])[:, 0]
            bf_err = 100.0 * float(np.mean(gl[bf_idx] != truth))

            for frac in [float(x) for x in args.budgets.split(",")]:
                budget = max(1, int(frac * n_actual))
                matcher.set_budget(budget)
                dem_sec = _time_queued(
                    lambda: matcher.search_device(probes),
                    lambda o: o[0],
                    args.iters,
                )
                idx, _, checked = (
                    np.asarray(x) for x in matcher.search_device(probes)
                )
                rec = {
                    "method": "dem-gather",
                    "gallery": n_actual,
                    "batch": b,
                    "budget_frac": frac,
                    "dem_qps": round(b / dem_sec, 1),
                    "bf_qps": round(b / bf_sec, 1),
                    "dem_over_bf": round(bf_sec / dem_sec, 3),
                    "dem_error_pct": round(
                        100.0 * float(np.mean(gl[idx] != truth)), 2
                    ),
                    "bf_error_pct": round(bf_err, 2),
                    "checked_pct": round(
                        100.0 * float(checked.mean()) / n_actual, 3
                    ),
                }
                lines.append(rec)
                print(json.dumps(rec), flush=True)
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")

            if sw is not None:
                for frac in [float(x) for x in args.budgets.split(",")]:
                    sw.set_budget(max(1, int(frac * n_actual)))
                    sw_sec = _time_queued(
                        lambda: sw.search(probes).indices,
                        lambda o: o,
                        max(2, args.iters // 4),
                    )
                    r = sw.search(probes)
                    rec = {
                        "method": "small_world",
                        "gallery": n_actual,
                        "batch": b,
                        "budget_frac": frac,
                        "sw_qps": round(b / sw_sec, 1),
                        "bf_qps": round(b / bf_sec, 1),
                        "sw_error_pct": round(
                            100.0 * float(np.mean(gl[r.indices] != truth)), 2
                        ),
                        "checked_pct": round(
                            100.0 * float(r.checked_fraction.mean()), 3
                        ),
                        "build_s": round(sw_build_s, 1),
                    }
                    lines.append(rec)
                    print(json.dumps(rec), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

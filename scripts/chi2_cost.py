"""Measure the chi2/KL streamed-scan cost at production scale.

The reference compiles chi2 in as an alternative distance
(qt_cpp/db_features.h:12 USE_L2_DISTANCE, db_features.cpp:27-32). Our L2
path runs on the MXU via the norm expansion; chi2/KL have no matmul form
((a-b)^2/(a+b) does not factor into a contraction), so they run through
``ops/distances.py::streamed_topk`` — a lax.scan over gallery tiles with
the [B, tile, D] elementwise distance fused into a running top-k.

This script captures that cost honestly (VERDICT r3 item #8): q/s at
100k x 1536, the achieved VPU elementwise rate, and the ratio to the L2
MXU scan on identical shapes — the measurement behind ARCHITECTURE.md §1's
chi2 exclusion paragraph (or, if the rate lands far from the VPU bound,
the case for a fused Pallas kernel).

Timing uses the queued-dispatch + one-host-transfer pattern (the axon
tunnel's block_until_ready does not synchronize).

Usage: python scripts/chi2_cost.py [--gallery 102400] [--batch 1024]
       [--iters 5] [--out -]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--gallery", type=int, default=102_400)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--dim", type=int, default=1536)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--kinds", default="chi2,l2")
    p.add_argument("--out", default="-", help="'-' = stdout, else append path")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.config import DistanceKind
    from fast_image_recognition_tpu.ops.distances import (
        oracle_pairwise,
        streamed_topk,
    )

    n, b, d = args.gallery, args.batch, args.dim

    # Non-negative rows (chi2's natural domain is histogram-like features),
    # L1-normalized, built on device.
    @jax.jit
    def mkdata(key):
        kg, kq = jax.random.split(key)
        g = jax.random.uniform(kg, (n, d), jnp.float32)
        g = g / jnp.sum(g, axis=1, keepdims=True)
        q = g[:b] + 0.05 * jax.random.uniform(kq, (b, d), jnp.float32) / d
        q = q / jnp.sum(q, axis=1, keepdims=True)
        return g, q

    gallery, queries = mkdata(jax.random.PRNGKey(0))

    lines = []
    for kind_name in args.kinds.split(","):
        if kind_name.startswith("chi2_pallas"):
            # the streamed Pallas kernel (ops/chi2_kernel.py): gallery
            # read once at storage width, VMEM-resident intermediates
            from fast_image_recognition_tpu.ops.chi2_kernel import chi2_nn

            kind = DistanceKind.CHI2
            gal = (
                gallery.astype(jnp.bfloat16)
                if kind_name.endswith("bf16")
                else gallery
            )
            fn = jax.jit(
                lambda q, g: tuple(
                    x[:, None] for x in chi2_nn(q, g, n_valid=n)
                )
            )
            gal_arg = gal
        else:
            kind = {"chi2": DistanceKind.CHI2, "l2": DistanceKind.L2,
                    "kl": DistanceKind.KL}[kind_name]
            fn = jax.jit(
                lambda q, g, k=kind: streamed_topk(q, g, k=1, kind=k)
            )
            gal_arg = gallery
        gallery_run = gal_arg
        dist, idx = fn(queries, gallery_run)
        idx_h = np.asarray(idx)[:, 0]

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(queries, gallery_run)
        _ = np.asarray(out[0])
        sec = (time.perf_counter() - t0) / args.iters
        qps = b / sec

        # Parity on a small probe set vs the float64 oracle (4096-row
        # slice: the oracle materializes the [B, N, D] broadcast).
        nprobe = 8
        oracle = oracle_pairwise(
            np.asarray(queries[:nprobe]),
            np.asarray(gallery[:4096], np.float32),
            kind=kind,
        )
        fast = np.asarray(fn(queries[:nprobe], gallery_run[:4096])[1])[:, 0]
        agree = float(np.mean(fast == oracle.argmin(axis=1)))

        # Achieved elementwise rate: ~6 VPU ops per (q, g, feature) triple
        # for chi2 (sub, mul, add, recip-mul, select, accum); 2 FLOPs
        # (MXU) per triple for L2.
        triples = float(b) * n * d
        elem_rate = triples / sec
        line = {
            "metric": f"queries/sec/chip ({kind_name} streamed scan, "
            f"D={d}, {n} gallery, B={b})",
            "value": round(qps, 1),
            "unit": "queries/sec/chip",
            "sec_per_batch": round(sec, 4),
            "elem_triples_per_sec": f"{elem_rate:.3e}",
            "probe_agreement": agree,
        }
        lines.append(line)
        print(json.dumps(line))
        sys.stdout.flush()

    if args.out != "-":
        with open(args.out, "a") as f:
            for line in lines:
                f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()

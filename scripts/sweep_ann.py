#!/usr/bin/env python
"""DEM-gather vs brute-force crossover sweep (and small_world at scale).

For each (gallery N, batch B, budget) writes one JSON line with queries/sec
for `dem-gather` and for the fused brute-force kernel `topk_l2` at the SAME
batch, plus error_pct (planted-truth accuracy) and checked_pct — the
accuracy/%checked operating point the reference prints next to every
latency (qt_cpp/ann.cpp:106-107, budget sweep at :61-70).

Workload: the gallery is built ON DEVICE (a host upload at 1M x 1536 costs
minutes over the tunneled link) as class-clustered identities — 4 enrolled
images per identity, probe j a fresh sample of a known identity — so
error_pct is the label error the reference reports. Gallery sizes are
1024-multiples so the padded brute-force view and the DEM gather view
share ONE device array. The DEM index is also built on device
(`DirectedEnumerationMatcher.from_device`).

Run on the real chip:
  python scripts/sweep_ann.py --out benchmarks/ann_crossover_r3.jsonl
  python scripts/sweep_ann.py --galleries 102400 --small-world \
      --out benchmarks/ann_crossover_r3.jsonl
Timing is tunnel-safe: N dispatches queued, one tiny fetch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# gathered candidate block cap: B * budget * D * 2 bytes must fit alongside
# the gallery + likelihood matrix in HBM
GATHER_BYTES_CAP = 1.5e9


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


def _scan_searches(search_fn, pick, probes_stack, *operands):
    """One jit dispatch running K sequential searches (lax.scan) — the
    tunneled link costs ~10 ms of RPC per dispatch, which would floor every
    sub-10ms config at the same q/s; a production TPU host dispatches in
    ~100 us. Scanning K searches inside one dispatch amortizes the RPC so
    the measurement reflects device throughput. Returns a jitted
    () -> [K, B] int32 predictions thunk.

    ``operands`` are the big device arrays (gallery, index tables) the
    search touches: they MUST be threaded as jit arguments — a device
    array captured by closure is baked into the lowered HLO as a literal,
    and the tunneled remote-compile endpoint rejects gallery-sized request
    bodies (HTTP 413)."""
    import jax

    @jax.jit
    def run(pstack, *ops):
        def body(carry, p):
            return carry, pick(search_fn(p, *ops))

        _, idxs = jax.lax.scan(body, 0, pstack)
        return idxs

    return lambda: run(probes_stack, *operands)


def _inner_for(batch: int) -> int:
    return min(256, max(1, 2048 // batch))


def _device_workload(
    n: int,
    dim: int,
    b_max: int,
    seed: int = 0,
    per_class: int = 4,
    sigma: float = 0.25,
    intrinsic_dim: int = 0,
):
    """Class-clustered recognition workload, built ON DEVICE in one dispatch
    (nothing big crosses the link): n/per_class identities, each a random
    center with `per_class` noisy enrolled images; probe j is a fresh noisy
    sample of a known identity. Intra-class window-mean L2 ~ 2*sigma^2,
    inter-class ~ 2 + 2*sigma^2 — the well-separated regime the reference's
    face-embedding galleries live in.

    ``intrinsic_dim > 0`` draws the class centers from an intrinsic_dim-
    dimensional random subspace of the ambient space (scaled so pairwise
    center distances keep the same expectation). Real CNN embeddings live on
    a low-dimensional manifold — that structure is what makes graph-walk
    methods (small_world) navigable; isotropic 1536-d centers are their
    degenerate worst case (greedy neighbor steps make no progress, so the
    walk decays to random sampling). 0 = isotropic (the DEM/BF default).

    Returns (gallery [n, dim] bf16 device, labels [n] np.int32,
    probe_classes [b_max] np.int32, probes [b_max, dim] fp32 device)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n_classes = n // per_class
    labels = np.repeat(np.arange(n_classes, dtype=np.int32), per_class)
    probe_cls = np.random.default_rng(seed).choice(
        n_classes, size=b_max, replace=False
    )
    cls_d = jnp.asarray(probe_cls, jnp.int32)
    # kc/k1/k2 keep the historical split(key, 3) stream so isotropic
    # workloads reproduce pre-r3 captured JSONLs bit-for-bit; kp (only used
    # by the intrinsic-dim branch) is derived out-of-stream via fold_in.
    kc, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
    kp = jax.random.fold_in(jax.random.PRNGKey(seed), 3)

    @jax.jit
    def build():
        if intrinsic_dim and intrinsic_dim < dim:
            lat = jax.random.normal(kc, (n_classes, intrinsic_dim), jnp.float32)
            proj = jax.random.normal(
                kp, (intrinsic_dim, dim), jnp.float32
            ) / jnp.sqrt(jnp.float32(intrinsic_dim))
            centers = (lat @ proj).astype(jnp.bfloat16)
        else:
            centers = jax.random.normal(kc, (n_classes, dim), jnp.bfloat16)
        g = jnp.repeat(centers, per_class, axis=0) + sigma * jax.random.normal(
            k1, (n, dim), jnp.bfloat16
        )
        probes = centers[cls_d].astype(jnp.float32) + sigma * jax.random.normal(
            k2, (b_max, dim), jnp.float32
        )
        return g, probes

    g, probes = build()
    return g, labels, probe_cls, probes


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="benchmarks/ann_crossover_r3.jsonl")
    parser.add_argument("--galleries", default="102400,1048576")
    parser.add_argument("--batches", default="1,32,128")
    parser.add_argument("--budgets", default="0.001,0.005,0.01,0.02")
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument(
        "--intrinsic-dim", type=int, default=0,
        help="draw class centers from a random subspace of this dimension "
        "(0 = isotropic). Graph-walk methods need low intrinsic dimension "
        "to navigate — see _device_workload",
    )
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--small-world", action="store_true",
                        help="also sweep the small_world graph matcher "
                             "(O(N^2) device build — 100k-scale only)")
    parser.add_argument("--sw-budgets", default="0.05,0.1,0.25,0.5",
                        help="small_world budget grid — the graph search "
                             "needs enough evaluations to walk the beam to "
                             "the target's neighborhood (the reference runs "
                             "small_world_rand at checked ~25-50%%, "
                             "ann.cpp:61-70); the DEM grid's 0.1-2%% stalls "
                             "it at the random entry points")
    parser.add_argument("--sw-pca-dim", type=int, default=0,
                        help="small_world: build + walk the graph in a PCA "
                             "projection of this dim (full-D exact rescore "
                             "of the final beam; budget in full-D-"
                             "equivalent units buys D/P more walk probes)")
    args = parser.parse_args()
    if args.intrinsic_dim and args.intrinsic_dim >= args.dim:
        parser.error(
            f"--intrinsic-dim ({args.intrinsic_dim}) must be < --dim "
            f"({args.dim}); the subspace branch would silently fall back "
            "to isotropic while result rows still claimed intrinsic_dim"
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_image_recognition_tpu.ops.distance_kernel import topk_l2
    from fast_image_recognition_tpu.search.dem import DirectedEnumerationMatcher

    b_max = max(int(x) for x in args.batches.split(","))
    for n in [int(x) for x in args.galleries.split(",")]:
        g, labels, probe_cls, probes_all = _device_workload(
            n, args.dim, b_max, intrinsic_dim=args.intrinsic_dim
        )
        matcher = DirectedEnumerationMatcher.from_device(
            g, labels, probe_mode="gather", seed=0
        )
        sw = None
        if args.small_world:
            from fast_image_recognition_tpu.search.small_world import (
                SmallWorldMatcher,
            )

            t0 = time.perf_counter()
            sw = SmallWorldMatcher(
                g.astype(jnp.float32), seed=0, beam=12,
                pca_dim=args.sw_pca_dim,
            )
            sw_build_s = time.perf_counter() - t0
            print(f"small_world build at N={n} ({sw.name}): "
                  f"{sw_build_s:.1f}s", flush=True)

        for b in [int(x) for x in args.batches.split(",")]:
            inner = _inner_for(b)
            # K shifted views of the planted probe pool -> [K, b, dim]
            rows = (
                np.arange(inner)[:, None] + np.arange(b)[None, :]
            ) % b_max
            pstack = probes_all[jnp.asarray(rows, jnp.int32)]
            truth = probe_cls[rows]  # [K, b] true identity of each probe
            iters = max(2, args.iters)

            def err_pct(pred_rows) -> float:
                return 100.0 * float(
                    np.mean(labels[np.asarray(pred_rows)] != truth)
                )

            # brute force at this batch (budget-independent)
            bf_run = _scan_searches(
                lambda q, gal: topk_l2(q, gal, k=1, n_valid=n),
                lambda o: o[1][:, 0],
                pstack,
                g,
            )
            bf_sec = _time_queued(bf_run, lambda o: o, iters) / inner
            bf_err = err_pct(bf_run())

            for frac in [float(x) for x in args.budgets.split(",") if x]:
                budget = max(1, int(frac * n))
                gather_bytes = b * budget * args.dim * 2
                base = {
                    "method": "dem-gather",
                    "gallery": n,
                    "batch": b,
                    "budget_frac": frac,
                    "inner": inner,
                }
                if args.intrinsic_dim:
                    base["intrinsic_dim"] = args.intrinsic_dim
                if gather_bytes > GATHER_BYTES_CAP:
                    base["skipped"] = (
                        f"gather block {gather_bytes / 1e9:.1f} GB > cap "
                        "(large-batch + large-budget is brute force's regime)"
                    )
                    print(json.dumps(base), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(base) + "\n")
                    continue
                matcher.set_budget(budget)
                from fast_image_recognition_tpu.search.dem import (
                    _dem_search_gather,
                )

                thr = float(matcher.index.threshold)
                bdg = matcher.budget
                dem_run = _scan_searches(
                    lambda q, gal, pf, pm, pi, _t=thr, _b=bdg: (
                        _dem_search_gather(q, gal, pf, pm, pi, jnp.float32(_t), _b)
                    ),
                    lambda o: o[0],
                    pstack,
                    matcher.gallery,
                    matcher._pivot_feats,
                    matcher._p_matrix,
                    matcher._pivot_idx,
                )
                dem_sec = _time_queued(dem_run, lambda o: o, iters) / inner
                dem_err = err_pct(dem_run())
                _, _, checked = (
                    np.asarray(x)
                    for x in matcher.search_device(probes_all[:b])
                )
                rec = dict(
                    base,
                    dem_qps=round(b / dem_sec, 1),
                    bf_qps=round(b / bf_sec, 1),
                    dem_over_bf=round(bf_sec / dem_sec, 3),
                    dem_error_pct=round(dem_err, 2),
                    bf_error_pct=round(bf_err, 2),
                    checked_pct=round(100.0 * float(checked.mean()) / n, 3),
                )
                print(json.dumps(rec), flush=True)
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")

            if sw is not None:
                from fast_image_recognition_tpu.search.small_world import (
                    _sw_search_routed,
                    rescore_full_d,
                )

                beam = min(sw.beam, sw._n)
                for frac in [float(x) for x in args.sw_budgets.split(",")]:
                    sw.set_budget(max(1, int(frac * n)))
                    if sw.pca_dim:
                        walk_budget = min(
                            n, max(1, sw.budget - beam - 1) * sw._budget_scale
                        )
                    else:
                        walk_budget = sw.budget
                    max_steps = (
                        walk_budget + beam * int(sw.neighbors.shape[1]) + 8
                    )
                    sample = sw._sample_pool[: sw._sample_size(walk_budget)]

                    def sw_search(q, wgal, wgsq, nbrs, smp, gal, gsq,
                                  _b=walk_budget, _m=max_steps):
                        q_walk = (
                            (q - sw._mu) @ sw._w if sw.pca_dim else q
                        )
                        bid, bd, chk, front = _sw_search_routed(
                            q_walk, wgal, wgsq, nbrs, smp,
                            beam=beam, budget=_b, max_steps=_m,
                        )
                        if not sw.pca_dim:
                            return bid
                        out_i, _, _ = rescore_full_d(
                            q, bid, front, chk, gal, gsq, sw.pca_dim
                        )
                        return out_i

                    sw_run = _scan_searches(
                        sw_search,
                        lambda o: o,
                        pstack,
                        sw._walk_gallery,
                        sw._walk_sqnorm,
                        sw.neighbors,
                        sample,
                        sw.gallery,
                        sw.gallery_sqnorm,
                    )
                    sw_sec = (
                        _time_queued(sw_run, lambda o: o, max(2, iters // 4))
                        / inner
                    )
                    sw_err = err_pct(sw_run())
                    _, _, checked = (
                        np.asarray(x)
                        for x in sw.search_device(probes_all[:b])
                    )
                    rec = {
                        "method": "small_world",
                        **({"pca_dim": sw.pca_dim} if sw.pca_dim else {}),
                        "gallery": n,
                        "batch": b,
                        "budget_frac": frac,
                        "inner": inner,
                        **(
                            {"intrinsic_dim": args.intrinsic_dim}
                            if args.intrinsic_dim
                            else {}
                        ),
                        "sw_qps": round(b / sw_sec, 1),
                        "bf_qps": round(b / bf_sec, 1),
                        "sw_error_pct": round(sw_err, 2),
                        "checked_pct": round(
                            100.0 * float(checked.mean()) / n, 3
                        ),
                        "build_s": round(sw_build_s, 1),
                    }
                    print(json.dumps(rec), flush=True)
                    with open(args.out, "a") as f:
                        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()

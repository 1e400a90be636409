"""Analytic FLOPs accounting from traced jaxprs.

Counts the matmul/conv FLOPs of any jittable function by walking its jaxpr
(`jax.make_jaxpr` — pure tracing, no compile, no device), so every zoo
family gets an exact MFU denominator without a per-family analytic model.
An XLA ``cost_analysis`` would need an AOT compile, which stalls on the
axon tunnel; the jaxpr walk is host-only and instant.

Counted primitives (the >99% terms of a convnet forward):
- ``conv_general_dilated``: 2 * prod(out_shape) * prod(rhs_spatial) *
  (C_in / groups) — the rhs input-feature dim is already per-group.
- ``dot_general``: 2 * prod(out_shape) * prod(contracted dims).
Sub-jaxprs (pjit/custom_jvp/remat/cond branches) are recursed; ``scan``
bodies are multiplied by trip count. Elementwise/reduction ops are excluded
(lower-order terms). Pallas calls are opaque — add their FLOPs analytically
at the call site (bench.py does for the match kernel).

Reference role: the denominator for the MFU figures the README/bench quote
(the reference reports only wall-clock; MFU is the TPU-native "are we at
speed-of-light" metric).
"""

from __future__ import annotations

import math

import jax
from jax.extend import core as jex_core


def _prod(xs) -> float:
    return float(math.prod(int(x) for x in xs))


def _eqn_flops(eqn) -> float:
    name = eqn.primitive.name
    if name == "conv_general_dilated":
        out = eqn.outvars[0].aval.shape
        rhs = eqn.invars[1].aval.shape
        dn = eqn.params["dimension_numbers"]
        rhs_spec = dn.rhs_spec  # (out_c, in_c, *spatial) positions
        in_c = rhs[rhs_spec[1]]  # per-group input features
        spatial = _prod(rhs[i] for i in rhs_spec[2:])
        return 2.0 * _prod(out) * spatial * in_c
    if name == "dot_general":
        (lhs_c, _), _ = eqn.params["dimension_numbers"]
        lhs = eqn.invars[0].aval.shape
        out = eqn.outvars[0].aval.shape
        k = _prod(lhs[i] for i in lhs_c)
        return 2.0 * _prod(out) * k
    return 0.0


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        # recurse into sub-jaxprs (pjit, remat, custom_jvp, cond, scan ...)
        mult = 1.0
        if eqn.primitive.name == "scan":
            mult = float(eqn.params.get("length", 1))
        for v in eqn.params.values():
            for sub in _iter_jaxprs(v):
                total += mult * _jaxpr_flops(sub)
    return total


def _iter_jaxprs(v):
    if isinstance(v, jex_core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jex_core.Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from _iter_jaxprs(x)


def fn_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of ``fn(*args, **kwargs)``."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)

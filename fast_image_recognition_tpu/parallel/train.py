"""Sharded multi-exit training — dp x model mesh over XLA collectives.

Reference semantics: the multi-head fine-tuning of
tf_keras/sequential_inference.py:1170-1232 — a Dense softmax head on every
exit tap plus the final embedding, loss weights ``len(preds) - i`` — which
the reference runs single-GPU, batch-at-a-time. Here the step is laid out
over a ``jax.sharding.Mesh``:

- batch over the ``data`` axis (gradient psum inserted by XLA),
- exit-head class dimensions over the ``model`` axis (each device holds a
  class shard of every head; logits/losses reduce over ICI),
- backbone parameters replicated.

The driver hook ``__graft_entry__.dryrun_multichip`` runs exactly this
step on a CPU-simulated mesh; ``tests/test_parallel_train.py`` covers the
8-device mesh, including parity of the sharded loss with a single-device
replay.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class ShardedTrainState:
    params: Any  # backbone params (replicated)
    heads: List[Dict[str, jax.Array]]  # per-exit Dense, class-sharded
    batch_stats: Any
    opt_state: Any


def init_multi_exit_heads(
    model,
    variables,
    taps: Sequence[str],
    num_classes: int,
    resolution: int,
    seed: int = 0,
) -> List[Dict[str, jax.Array]]:
    """Dense(softmax) head per tap + final (sequential_inference.py
    :1179-1188), Glorot-ish 0.02 init."""
    probe = model.apply(
        variables, jnp.zeros((1, resolution, resolution, 3)), taps=tuple(taps)
    )
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(dims))
    return [
        {
            "w": jax.random.normal(k, (d, num_classes), jnp.float32) * 0.02,
            "b": jnp.zeros((num_classes,), jnp.float32),
        }
        for k, d in zip(keys, dims)
    ]


def make_sharded_train_step(
    model,
    variables,
    taps: Sequence[str],
    num_classes: int,
    mesh: Mesh,
    resolution: int,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> Tuple[ShardedTrainState, Callable]:
    """Build (state, step) for the sharded multi-exit fine-tuning step.

    ``step(state, images, labels, key) -> (state, loss)`` is jitted; input
    batches should be placed with ``place_batch`` (or any layout — jit will
    reshard). The mesh must have axes ('data', 'model')."""
    taps = tuple(taps)
    heads = init_multi_exit_heads(
        model, variables, taps, num_classes, resolution, seed
    )

    repl = NamedSharding(mesh, P())
    head_sh = {
        "w": NamedSharding(mesh, P(None, "model")),
        "b": NamedSharding(mesh, P("model")),
    }
    variables = jax.device_put(variables, repl)
    heads = [
        {k: jax.device_put(v, head_sh[k]) for k, v in h.items()} for h in heads
    ]

    tx = optax.adam(learning_rate)
    opt_state = tx.init((variables["params"], heads))
    state = ShardedTrainState(
        params=variables["params"],
        heads=heads,
        batch_stats=variables["batch_stats"],
        opt_state=opt_state,
    )

    def loss_fn(params, heads, batch_stats, images, labels, rngs):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            taps=taps,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        embs = [out["taps"][t] for t in taps] + [out["embedding"]]
        total = 0.0
        n_heads = len(embs)
        for i, (e, h) in enumerate(zip(embs, heads)):
            logits = e @ h["w"] + h["b"]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            total = total + (n_heads - i) * ce.mean()  # weights = n - i (P11)
        return total, mutated["batch_stats"]

    def _step(params, heads, batch_stats, opt_state, images, labels, key):
        rngs = {
            "stochastic_depth": jax.random.fold_in(key, 0),
            "dropout": jax.random.fold_in(key, 1),
        }
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, heads, batch_stats, images, labels, rngs)
        updates, opt_state = tx.update(grads, opt_state)
        params, heads = optax.apply_updates((params, heads), updates)
        return params, heads, new_bs, opt_state, loss

    jitted = jax.jit(_step)

    def step(state: ShardedTrainState, images, labels, key):
        params, heads_, bs, opt_state_, loss = jitted(
            state.params,
            state.heads,
            state.batch_stats,
            state.opt_state,
            images,
            labels,
            key,
        )
        return (
            ShardedTrainState(params, heads_, bs, opt_state_),
            loss,
        )

    return state, step


def place_batch(mesh: Mesh, images: np.ndarray, labels: np.ndarray):
    """device_put a host batch with the step's expected shardings."""
    return (
        jax.device_put(
            jnp.asarray(images, jnp.float32),
            NamedSharding(mesh, P("data", None, None, None)),
        ),
        jax.device_put(
            jnp.asarray(labels, jnp.int32), NamedSharding(mesh, P("data"))
        ),
    )


def train_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """dp x model mesh over the available devices (model=2 when even)."""
    devices = list(devices or jax.devices())
    if n_devices:
        devices = devices[:n_devices]
    n = len(devices)
    if n % 2 == 0 and n > 1:
        dp, mp = n // 2, 2
    else:
        dp, mp = n, 1
    return Mesh(np.asarray(devices).reshape(dp, mp), axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Sharding-aware checkpoint / resume (orbax)
# ---------------------------------------------------------------------------

def save_train_state(path: str, state: ShardedTrainState) -> None:
    """Write the sharded state with orbax (each host writes its shards;
    single-host here, but the layout is the standard multi-host one). The
    reference's closest analog is ModelCheckpoint(save_best_only=True)
    (sequential_inference.py:1217-1219) — this adds the distributed-layout
    dimension the reference never had."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(path),
        {
            "params": state.params,
            "heads": state.heads,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        force=True,
    )
    ckptr.wait_until_finished()


def load_train_state(path: str, template: ShardedTrainState) -> ShardedTrainState:
    """Restore into the TEMPLATE's shardings (resume on the same mesh
    layout; orbax reshards on restore when the mesh changed)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        {
            "params": template.params,
            "heads": template.heads,
            "batch_stats": template.batch_stats,
            "opt_state": template.opt_state,
        },
    )
    return ShardedTrainState(**restored)

"""Fine-tuning and multi-exit-head training.

Reference flows reproduced:
- two-phase fine-tune — phase 1 trains only the new heads with the backbone
  frozen, phase 2 unfreezes everything at a lower LR
  (tf_keras/sequential_inference.py:1210-1231,
  keras_finetune_prune.py:943-982, train_model.ipynb cells 10-11);
- multi-exit heads: Dense softmax on the GAP of each tap + the final
  embedding, with loss weights ``len(preds) - i`` so earlier exits are
  weighted higher (sequential_inference.py:1179-1205);
- class weights for imbalanced data (train_model.ipynb cell 9);
- ModelCheckpoint(save_best_only) + EarlyStopping via utils/checkpoint.

TPU design: one jitted train step (donated state), optax with
``optax.masked`` implementing the freeze (phase 1 masks backbone gradients
instead of rebuilding the model), optional data-parallel sharding over the
mesh's ``data`` axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fast_image_recognition_tpu.models.efficientnet import EfficientNet
from fast_image_recognition_tpu.utils.checkpoint import BestCheckpoint, EarlyStopping


def init_heads(
    model: EfficientNet,
    variables,
    taps: Sequence[str],
    num_classes: int,
    resolution: int,
    seed: int = 0,
) -> List[Dict[str, jax.Array]]:
    """Dense softmax head per exit + final (sequential_inference.py:1179-1188)."""
    probe = model.apply(
        variables, jnp.zeros((1, resolution, resolution, 3)), taps=taps
    )
    dims = [int(probe["taps"][t].shape[-1]) for t in taps] + [
        int(probe["embedding"].shape[-1])
    ]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(dims))
    return [
        {
            "w": jax.random.normal(k, (d, num_classes), jnp.float32)
            * (1.0 / np.sqrt(d)),
            "b": jnp.zeros((num_classes,), jnp.float32),
        }
        for k, d in zip(keys, dims)
    ]


def class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Balanced class weights (train_model.ipynb cell 9 semantics):
    n_samples / (n_classes * class_count)."""
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    return (len(labels) / (num_classes * counts)).astype(np.float32)


@dataclasses.dataclass
class TrainConfig:
    num_classes: int
    taps: Tuple[str, ...]
    resolution: int
    batch_size: int = 32
    phase1_lr: float = 1e-3
    phase2_lr: float = 1e-4
    phase1_epochs: int = 3
    phase2_epochs: int = 3
    weight_decay: float = 0.0
    patience: int = 3
    loss_head_weights: bool = True  # len(preds)-i weights (:1205)
    # 'linear' = Dense softmax heads (sequential_inference.py:1179-1188);
    # 'cosine' = normalized-embedding x normalized-weight logits at fixed
    # scale — the metric-learning head of the face-recognition domain the
    # reference serves (gallery 1-NN on L2-normalized embeddings,
    # db_features.cpp:90-101, needs COSINE-clustered classes to transfer
    # to unseen identities; a plain softmax head does not constrain the
    # embedding norm direction geometry off-distribution)
    head: str = "linear"
    cosine_scale: float = 16.0
    seed: int = 0


class MultiExitTrainer:
    """Two-phase multi-head fine-tuning driver."""

    def __init__(
        self,
        model: EfficientNet,
        variables,
        config: TrainConfig,
        checkpoint_path: Optional[str] = None,
        preprocess=None,
    ):
        self.model = model
        self.config = config
        # optional on-device input map (e.g. uint8 -> (x-MEAN)/STD for a
        # fold-consistent serving contract); applied to every batch the
        # trainer sees. Device-resident datasets (jax uint8 arrays) are
        # batched by device gather — nothing crosses the host link.
        self.preprocess = preprocess
        self._prep_jit = jax.jit(self._prep_traced)
        self._gather_jit = jax.jit(
            lambda data, idx: self._prep_traced(jnp.take(data, idx, axis=0))
        )
        # copy: the jitted step donates its state buffers, which would
        # invalidate the caller's original variables on the first step.
        # ONE jitted copy of the whole tree — per-leaf jnp.array calls
        # compile ~one tiny program per leaf (~0.4 s each over the
        # tunneled device's compile service: minutes for a backbone)
        copy_tree = jax.jit(lambda t: jax.tree.map(jnp.asarray, t))
        copied = copy_tree(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        )
        self.params = copied["params"]
        self.batch_stats = copied["batch_stats"]
        self.heads = init_heads(
            model,
            variables,
            config.taps,
            config.num_classes,
            config.resolution,
            config.seed,
        )
        self.ckpt = BestCheckpoint(checkpoint_path) if checkpoint_path else None
        self._step_fns: Dict[Tuple[bool, float], Any] = {}

    def _prep_traced(self, images):
        x = jnp.asarray(images).astype(jnp.float32)
        return self.preprocess(x) if self.preprocess is not None else x

    def _batch(self, images, idx):
        """One training batch: device gather for device-resident data,
        host slice + upload otherwise — preprocessed either way."""
        if isinstance(images, jax.Array):
            return self._gather_jit(images, jnp.asarray(idx, jnp.int32))
        return self._prep_jit(jnp.asarray(images[idx]))

    def _head_logits_traced(self, e, h):
        """Head logits by ``config.head``: plain affine, or cosine
        (normalized embedding x normalized class weights, fixed scale)."""
        if self.config.head == "cosine":
            en = e / jnp.maximum(
                jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12
            )
            wn = h["w"] / jnp.maximum(
                jnp.linalg.norm(h["w"], axis=0, keepdims=True), 1e-12
            )
            return self.config.cosine_scale * (en @ wn)
        return e @ h["w"] + h["b"]

    # -- loss ---------------------------------------------------------------
    def _loss(self, params, heads, batch_stats, images, labels, cls_w, rngs):
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            taps=self.config.taps,
            rngs=rngs,
            mutable=["batch_stats"],
        )
        embs = [out["taps"][t] for t in self.config.taps] + [out["embedding"]]
        n_heads = len(embs)
        total = 0.0
        weight_sum = 0.0
        per_example_w = cls_w[labels]
        for i, (e, h) in enumerate(zip(embs, heads)):
            logits = self._head_logits_traced(e, h)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            w = float(n_heads - i) if self.config.loss_head_weights else 1.0
            total = total + w * jnp.mean(ce * per_example_w)
            weight_sum += w
        return total / weight_sum, mutated["batch_stats"]

    # -- jitted step --------------------------------------------------------
    def _make_step(self, train_backbone: bool, lr: float):
        if train_backbone:
            tx = optax.adam(lr)
        else:
            # phase 1: freeze the backbone — zero its updates
            # (sequential_inference.py:1210-1216 sets layer.trainable=False)
            tx = optax.multi_transform(
                {"train": optax.adam(lr), "freeze": optax.set_to_zero()},
                ("freeze", ["train"] * len(self.heads)),
            )
        # jitted init: one compile instead of one tiny zeros_like program
        # per optimizer-state leaf
        opt_state = jax.jit(tx.init)((self.params, self.heads))

        def step(params, heads, batch_stats, opt_state, images, labels, cls_w, key):
            rngs = {
                "stochastic_depth": jax.random.fold_in(key, 0),
                "dropout": jax.random.fold_in(key, 1),
            }
            (loss, new_bs), grads = jax.value_and_grad(
                self._loss, argnums=(0, 1), has_aux=True
            )(params, heads, batch_stats, images, labels, cls_w, rngs)
            updates, opt_state = tx.update(grads, opt_state)
            params, heads = optax.apply_updates((params, heads), updates)
            return params, heads, new_bs, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1, 2, 3)), opt_state

    def calibrate_batch_stats(self, images: np.ndarray) -> None:
        """Adopt the batch statistics of a calibration batch as the BN
        running stats. With momentum-0.99 BN, short fine-tunes leave running
        stats far from the activations the heads were trained on (train mode
        normalizes with batch stats), so eval-mode logits live at a different
        scale. One mutable pass gives ``new = m*old + (1-m)*batch``; solve
        for ``batch`` and assign it."""
        m = 0.99

        @jax.jit
        def _calib(params, batch_stats, x):
            mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                self._prep_traced(x),
                train=True,
                rngs={
                    "stochastic_depth": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1),
                },
                mutable=["batch_stats"],
            )[1]["batch_stats"]
            return jax.tree.map(
                lambda new, old: (new - m * old) / (1.0 - m),
                mutated,
                batch_stats,
            )

        self.batch_stats = _calib(self.params, self.batch_stats, images)

    # -- evaluation ---------------------------------------------------------
    def evaluate(self, images, labels: np.ndarray) -> float:
        """Final-head accuracy (one jitted dispatch per batch — the
        un-jitted apply would cross the device link per op)."""
        if not hasattr(self, "_eval_fn"):

            def _pred(params, batch_stats, w, b, x):
                out = self.model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    self._prep_traced(x),
                    train=False,
                )
                return jnp.argmax(
                    self._head_logits_traced(
                        out["embedding"], {"w": w, "b": b}
                    ),
                    1,
                )

            self._eval_fn = jax.jit(_pred)
        correct = 0
        bs = self.config.batch_size
        h = self.heads[-1]
        for s in range(0, len(images), bs):
            pred = self._eval_fn(
                self.params, self.batch_stats, h["w"], h["b"],
                images[s : s + bs],
            )
            correct += int((np.asarray(pred) == labels[s : s + bs]).sum())
        return correct / len(images)

    def head_logits(self, images: np.ndarray) -> List[np.ndarray]:
        """Per-exit logits for BranchyNet-style evaluation."""
        out = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            self._prep_jit(images),
            train=False,
            taps=self.config.taps,
        )
        embs = [out["taps"][t] for t in self.config.taps] + [out["embedding"]]
        return [
            np.asarray(self._head_logits_traced(e, h))
            for e, h in zip(embs, self.heads)
        ]

    # -- fit ----------------------------------------------------------------
    def fit(
        self,
        train_images: np.ndarray,
        train_labels: np.ndarray,
        val_images: Optional[np.ndarray] = None,
        val_labels: Optional[np.ndarray] = None,
        verbose: bool = True,
    ) -> Dict[str, list]:
        cfg = self.config
        cls_w = jnp.asarray(class_weights(train_labels, cfg.num_classes))
        history = {"loss": [], "val_acc": []}
        rng = np.random.default_rng(cfg.seed)
        key = jax.random.PRNGKey(cfg.seed)
        self.calibrate_batch_stats(train_images[: cfg.batch_size * 2])

        for phase, (train_backbone, lr, epochs) in enumerate(
            [
                (False, cfg.phase1_lr, cfg.phase1_epochs),
                (True, cfg.phase2_lr, cfg.phase2_epochs),
            ]
        ):
            if epochs == 0:
                continue
            step, opt_state = self._make_step(train_backbone, lr)
            stopper = EarlyStopping(patience=cfg.patience)
            for epoch in range(epochs):
                order = rng.permutation(len(train_images))
                n_batches = len(order) // cfg.batch_size
                losses = []
                for b in range(n_batches):
                    idx = order[b * cfg.batch_size : (b + 1) * cfg.batch_size]
                    key = jax.random.fold_in(key, b)
                    (
                        self.params,
                        self.heads,
                        self.batch_stats,
                        opt_state,
                        loss,
                    ) = step(
                        self.params,
                        self.heads,
                        self.batch_stats,
                        opt_state,
                        self._batch(train_images, idx),
                        jnp.asarray(train_labels[idx], jnp.int32),
                        cls_w,
                        key,
                    )
                    losses.append(loss)  # device scalar; no per-step sync
                # one host sync per epoch (per-step float() would stall the
                # dispatch pipeline on the TPU tunnel)
                epoch_loss = float(np.asarray(jnp.mean(jnp.stack(losses))))
                history["loss"].append(epoch_loss)
                msg = f"phase{phase+1} epoch {epoch}: loss={epoch_loss:.4f}"
                if val_images is not None:
                    acc = self.evaluate(val_images, val_labels)
                    history["val_acc"].append(acc)
                    msg += f" val_acc={acc:.4f}"
                    if self.ckpt:
                        self.ckpt.update(
                            acc,
                            {
                                "params": self.params,
                                "batch_stats": self.batch_stats,
                                "heads": self.heads,
                            },
                        )
                    if stopper.update(acc):
                        if verbose:
                            print(msg + " (early stop)")
                        break
                if verbose:
                    print(msg)
        return history

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

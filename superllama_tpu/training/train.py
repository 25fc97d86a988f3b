"""Training / finetuning (counterpart of ggml-opt + llama_opt_epoch,
ggml/src/ggml-opt.cpp + src/llama-context.cpp:2901-3010).

TPU-native: loss/grad via jax.grad, AdamW/SGD via optax, one jitted
train_step with donated (params, opt_state); sharding comes from the arrays'
placement (GSPMD), so the same step runs 1-chip or across a mesh unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.hparams import HParams
from ..models.registry import get_forward
from ..runtime.kv_cache import kv_cache_init


def causal_lm_loss(forward: Callable, hp: HParams, params: Any,
                   tokens: jax.Array, targets: jax.Array,
                   loss_mask: jax.Array | None = None,
                   cache_dtype=jnp.float32) -> jax.Array:
    """Mean next-token cross-entropy (ggml_opt loss type CROSS_ENTROPY)."""
    B, T = tokens.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    cache = kv_cache_init(hp.n_layer, B, T, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=cache_dtype)
    logits, _ = forward(params, hp, tokens, pos, cache)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is None:
        return jnp.mean(nll)
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_schedule(kind: str = "constant", lr: float = 1e-4,
                  warmup_steps: int = 0, total_steps: int = 1000,
                  end_lr_frac: float = 0.0):
    """LR schedules (the get_opt_pars per-epoch callback of ggml_opt_fit,
    generalized to per-step): constant | linear | cosine, each with an
    optional linear warmup."""
    if kind == "constant":
        sched = optax.constant_schedule(lr)
    elif kind == "linear":
        sched = optax.linear_schedule(lr, lr * end_lr_frac,
                                      max(total_steps - warmup_steps, 1))
    elif kind == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, max(total_steps - warmup_steps, 1), alpha=end_lr_frac)
    else:
        raise ValueError(f"unknown schedule {kind!r}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lr, warmup_steps)
        sched = optax.join_schedules([warm, sched], [warmup_steps])
    return sched


def make_optimizer(name: str = "adamw", lr: float = 1e-4,
                   weight_decay: float = 0.0, **kw) -> optax.GradientTransformation:
    """AdamW / SGD (GGML_OPT_OPTIMIZER_TYPE_*, ggml-opt.h:78-81)."""
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay, **kw)
    if name == "sgd":
        return optax.sgd(lr, **kw)
    raise ValueError(f"unknown optimizer {name!r}")


class Trainer:
    """Epoch driver (llama_opt_epoch counterpart) with trainable-tensor
    filtering (llama_opt_param_filter, include/llama.h:1546-1554) and
    optimizer-state checkpointing."""

    def __init__(self, hp: HParams, params: Any, optimizer="adamw", lr=1e-4,
                 forward: Callable | None = None,
                 param_filter: Callable[[str], bool] | None = None,
                 accum_steps: int = 1, cache_dtype=jnp.float32):
        """lr: a float or an optax schedule (see make_schedule).
        accum_steps: gradient accumulation — the optimizer applies one
        logical update every N micro-batches (ggml_opt_fit's
        nbatch_logical / nbatch_physical split, ggml-opt.cpp)."""
        self.hp = hp
        self.params = params
        fwd = forward or get_forward(hp.arch)
        base_opt = make_optimizer(optimizer, lr)
        self.accum_steps = max(1, int(accum_steps))
        if self.accum_steps > 1:
            base_opt = optax.MultiSteps(base_opt, self.accum_steps)
        # param_filter selects trainable tensors by path name; frozen tensors
        # get zero updates (optax.masked keeps opt state minimal)
        self._filter = param_filter
        if param_filter is not None:
            mask = self._trainable_mask(params, param_filter)
            inv = jax.tree_util.tree_map(lambda b: not b, mask)
            # zero frozen-leaf updates (masked alone passes raw grads through)
            self.opt = optax.chain(optax.masked(optax.set_to_zero(), inv),
                                   optax.masked(base_opt, mask))
        else:
            self.opt = base_opt
        self.opt_state = self.opt.init(params)
        self.n_steps = 0

        def step(params, opt_state, tokens, targets, loss_mask):
            loss, grads = jax.value_and_grad(
                lambda p: causal_lm_loss(fwd, hp, p, tokens, targets,
                                         loss_mask, cache_dtype=cache_dtype)
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

        def eval_step(params, tokens, targets, loss_mask):
            B, T = tokens.shape
            pos = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
            cache = kv_cache_init(hp.n_layer, B, T, hp.n_head_kv,
                                  hp.head_dim, hp.head_dim_v,
                                  dtype=cache_dtype)
            logits, _ = fwd(params, hp, tokens, pos, cache)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None],
                                       axis=-1)[..., 0]
            hit = (jnp.argmax(logits, axis=-1) == targets)
            m = loss_mask.astype(jnp.float32)
            msum = jnp.maximum(jnp.sum(m), 1.0)
            return (jnp.sum(nll * m) / msum,
                    jnp.sum(hit.astype(jnp.float32) * m) / msum)

        self._eval_step = jax.jit(eval_step)

    @staticmethod
    def _trainable_mask(params: Any, flt: Callable[[str], bool]) -> Any:
        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, f"{path}.{k}" if path else k)
                        for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v, f"{path}.{i}") for i, v in enumerate(node)]
            return bool(flt(path))

        return walk(params, "")

    def train_step(self, tokens, targets, loss_mask=None):
        if loss_mask is None:
            loss_mask = jnp.ones_like(targets, dtype=jnp.float32)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, tokens, targets, loss_mask
        )
        self.n_steps += 1
        return float(loss)

    def epoch(self, batches, callback=None) -> float:
        total, n = 0.0, 0
        for tokens, targets in batches:
            loss = self.train_step(jnp.asarray(tokens), jnp.asarray(targets))
            total, n = total + loss, n + 1
            if callback:
                callback(n, loss)
        return total / max(n, 1)

    def evaluate(self, batches) -> tuple[float, float]:
        """(mean loss, next-token accuracy) without gradients
        (ggml_opt_result loss + accuracy, ggml-opt.h:140-160)."""
        tl = ta = 0.0
        n = 0
        for tokens, targets in batches:
            tokens = jnp.asarray(tokens)
            targets = jnp.asarray(targets)
            loss, acc = self._eval_step(
                self.params, tokens, targets,
                jnp.ones_like(targets, jnp.float32))
            tl, ta, n = tl + float(loss), ta + float(acc), n + 1
        return tl / max(n, 1), ta / max(n, 1)

    def fit(self, tokens, targets, *, batch_size: int = 8,
            epochs: int = 1, val_split: float = 0.0, shuffle: bool = True,
            seed: int = 0, callback=None) -> dict:
        """ggml_opt_fit counterpart: train on the FRONT of the dataset,
        evaluate on the BACK (idata_split semantics of ggml_opt_epoch),
        shuffling only the training section each epoch. tokens/targets:
        (N, T) arrays of sequences. Returns per-epoch history."""
        import numpy as np

        tokens = np.asarray(tokens)
        targets = np.asarray(targets)
        N = tokens.shape[0]
        n_val = int(round(N * float(val_split)))
        n_train = N - n_val
        if n_train < batch_size:
            raise ValueError(
                f"{n_train} training sequences < batch_size {batch_size}")
        rng = np.random.default_rng(seed)
        hist = {"train_loss": [], "val_loss": [], "val_accuracy": []}
        for ep in range(epochs):
            order = (rng.permutation(n_train) if shuffle
                     else np.arange(n_train))
            tot = nb = 0
            for i in range(0, n_train - batch_size + 1, batch_size):
                sel = order[i:i + batch_size]
                loss = self.train_step(jnp.asarray(tokens[sel]),
                                       jnp.asarray(targets[sel]))
                tot, nb = tot + loss, nb + 1
                if callback:
                    callback(True, ep, nb, loss)
            hist["train_loss"].append(tot / max(nb, 1))
            if n_val >= batch_size:
                vb = [(tokens[i:i + batch_size], targets[i:i + batch_size])
                      for i in range(n_train, N - batch_size + 1, batch_size)]
                vl, va = self.evaluate(vb)
                hist["val_loss"].append(vl)
                hist["val_accuracy"].append(va)
                if callback:
                    callback(False, ep, len(vb), vl)
        return hist

    # ------------------------------------------------ checkpoint / resume

    def save_checkpoint(self, path: str) -> None:
        """Full training state (params + optimizer state + step counter)."""
        import numpy as np

        leaves, _ = jax.tree_util.tree_flatten((self.params, self.opt_state))
        np.savez(path, n_steps=self.n_steps,
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})

    def load_checkpoint(self, path: str) -> None:
        """Restore into a Trainer constructed with the same shapes/config."""
        import numpy as np

        _, treedef = jax.tree_util.tree_flatten((self.params, self.opt_state))
        with np.load(path) as z:
            self.n_steps = int(z["n_steps"])
            leaves = [jnp.asarray(z[f"leaf_{i}"])
                      for i in range(treedef.num_leaves)]
        self.params, self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)

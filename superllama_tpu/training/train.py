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
                   loss_mask: jax.Array | None = None) -> jax.Array:
    """Mean next-token cross-entropy (ggml_opt loss type CROSS_ENTROPY)."""
    B, T = tokens.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    cache = kv_cache_init(hp.n_layer, B, T, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    logits, _ = forward(params, hp, tokens, pos, cache)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is None:
        return jnp.mean(nll)
    m = loss_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


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
                 param_filter: Callable[[str], bool] | None = None):
        self.hp = hp
        self.params = params
        fwd = forward or get_forward(hp.arch)
        base_opt = make_optimizer(optimizer, lr)
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
                lambda p: causal_lm_loss(fwd, hp, p, tokens, targets, loss_mask)
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

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

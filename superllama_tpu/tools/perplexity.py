"""Perplexity + KL-divergence evaluation.

Methodology replicates tools/perplexity/perplexity.cpp: the corpus is split
into non-overlapping n_ctx-token chunks; each chunk is evaluated and NLL is
accumulated over positions [first, n_ctx) with first = min(512, n_ctx/2);
PPL = exp(mean NLL). KL mode compares per-token distributions against saved
base-model logits (the fp16-vs-quant quality gate).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..runtime.context import Context


@dataclasses.dataclass
class PerplexityResult:
    ppl: float
    nll_sum: float
    n_tokens: int
    per_chunk_ppl: list[float]

    def __str__(self):
        return f"PPL = {self.ppl:.4f} over {self.n_tokens} tokens"


def compute_perplexity(model: LoadedModel, token_ids: np.ndarray, n_ctx: int = 512,
                       n_batch: int = 1, add_bos: bool = True,
                       logits_sink=None) -> PerplexityResult:
    """token_ids: 1-D array of the full corpus tokenization."""
    ids = np.asarray(token_ids, np.int32)
    bos = model.tokenizer.vocab.bos_id if model.tokenizer else -1
    first = min(512, n_ctx // 2)
    n_chunks = (len(ids) - 1) // n_ctx
    if n_chunks < 1:
        raise ValueError(f"need ≥{n_ctx + 1} tokens, got {len(ids)}")

    ctx = Context(model, n_batch=1, n_ctx=n_ctx)
    nll_sum, count = 0.0, 0
    per_chunk = []
    for c in range(n_chunks):
        chunk = ids[c * n_ctx : (c + 1) * n_ctx + 1]
        inp = chunk[:n_ctx].copy()
        if add_bos and bos >= 0:
            inp0 = inp.copy()
            inp0[0] = bos  # llama.cpp replaces the first token of each chunk with BOS
        else:
            inp0 = inp
        ctx.reset()
        logits = ctx.forward(inp0[None, :])  # (1, n_ctx, V)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        targets = jnp.asarray(chunk[1 : n_ctx + 1], jnp.int32)
        tok_logp = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        sel = np.asarray(tok_logp)[first - 1 :]
        if logits_sink is not None:
            logits_sink.append(np.asarray(logp, np.float32))
        chunk_nll = -float(sel.sum())
        nll_sum += chunk_nll
        count += sel.size
        per_chunk.append(math.exp(chunk_nll / sel.size))
    return PerplexityResult(
        ppl=math.exp(nll_sum / count), nll_sum=nll_sum, n_tokens=count,
        per_chunk_ppl=per_chunk,
    )


def compute_kl_divergence(model: LoadedModel, token_ids: np.ndarray,
                          base_logp_chunks: list[np.ndarray],
                          n_ctx: int = 512) -> dict:
    """KL(base ‖ model) per token vs saved base log-probs (perplexity.cpp
    --kl-divergence mode)."""
    sink: list[np.ndarray] = []
    res = compute_perplexity(model, token_ids, n_ctx=n_ctx, logits_sink=sink)
    kls = []
    same_top = 0
    total = 0
    for ours, base in zip(sink, base_logp_chunks):
        kl = np.sum(np.exp(base) * (base - ours), axis=-1)
        kls.append(kl)
        same_top += int((ours.argmax(-1) == base.argmax(-1)).sum())
        total += ours.shape[0]
    allkl = np.concatenate(kls)
    return {
        "ppl": res.ppl,
        "kl_mean": float(allkl.mean()),
        "kl_p99": float(np.percentile(allkl, 99)),
        "kl_max": float(allkl.max()),
        "same_top_p": same_top / total,
    }

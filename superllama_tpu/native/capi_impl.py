"""Python side of the C ABI (native/capi.cpp): handle table + thin calls
into the runtime. Kept import-light so slt_backend_init is fast."""

from __future__ import annotations

import itertools
import threading

_handles: dict[int, object] = {}
_next = itertools.count(1)
_lock = threading.Lock()


def _put(obj) -> int:
    with _lock:
        h = next(_next)
        _handles[h] = obj
        return h


def _get(h: int):
    obj = _handles.get(int(h))
    if obj is None:
        raise ValueError(f"invalid handle {h}")
    return obj


def model_load(path: str) -> int:
    from ..models import load_model

    return _put(load_model(path))


def ctx_new(model_h: int, n_ctx: int, n_slots: int) -> int:
    from ..runtime.engine import Engine

    model = _get(model_h)
    return _put(Engine(model, n_slots=max(n_slots, 1), n_ctx=n_ctx))


def tokenize(model_h: int, text: str) -> list[int]:
    model = _get(model_h)
    return [int(t) for t in model.tokenizer.encode(text, add_special=True,
                                                   parse_special=True)]


def detokenize(model_h: int, ids: list[int]) -> str:
    model = _get(model_h)
    return b"".join(model.tokenizer.token_to_piece(int(t)) for t in ids
                    ).decode("utf-8", errors="replace")


def generate(ctx_h: int, prompt: str, max_tokens: int, temp: float) -> str:
    eng = _get(ctx_h)
    ids = eng.model.tokenizer.encode(prompt, add_special=True,
                                     parse_special=True)
    out = eng.generate(ids, max_tokens=max_tokens,
                       sampling={"temp": float(temp)})
    return out["text"]


# --------------------------- model info / vocab ----------------------------
# llama_model_* / llama_vocab_* getters (include/llama.h:455-560, 960-1015)


def model_int(model_h: int, what: str) -> int:
    model = _get(model_h)
    hp = model.hparams
    return int({"n_vocab": hp.n_vocab, "n_embd": hp.n_embd,
                "n_layer": hp.n_layer, "n_head": hp.n_head,
                "n_ctx_train": hp.n_ctx_train,
                "n_expert": hp.n_expert}[what])


def model_meta(model_h: int, key: str) -> str:
    md = _get(model_h).metadata
    v = md.get(key)
    return "" if v is None else str(v)


def model_desc(model_h: int) -> str:
    model = _get(model_h)
    hp = model.hparams
    return (f"{hp.arch} {hp.n_layer}L n_embd={hp.n_embd} "
            f"n_vocab={hp.n_vocab} n_ctx_train={hp.n_ctx_train}")


def vocab_special(model_h: int, what: str) -> int:
    v = getattr(_get(model_h).tokenizer.vocab, what, None)
    return -1 if v is None else int(v)


def vocab_is_eog(model_h: int, token: int) -> int:
    return int(_get(model_h).tokenizer.vocab.is_eog(int(token)))


def token_to_piece(model_h: int, token: int) -> bytes:
    return _get(model_h).tokenizer.token_to_piece(int(token))


# ------------------------------ decode tier --------------------------------
# llama_decode / llama_get_logits counterpart on a raw Context (the Engine
# handles batched serving; this is the C-level custom-loop surface).


class _DecodeCtx:
    def __init__(self, model, n_ctx: int):
        from ..runtime.context import Context

        self.ctx = Context(model, n_ctx=n_ctx)
        self.logits = None
        self.n_past = 0


def decode_ctx_new(model_h: int, n_ctx: int) -> int:
    return _put(_DecodeCtx(_get(model_h), n_ctx))


def decode(dctx_h: int, tokens: list[int]) -> int:
    import numpy as np

    d = _get(dctx_h)
    lg = d.ctx.forward(np.asarray(tokens, np.int32))
    d.logits = np.asarray(lg)[0, -1]
    d.n_past += len(tokens)
    return d.n_past


def get_logits(dctx_h: int):
    d = _get(dctx_h)
    if d.logits is None:
        raise RuntimeError("no decode yet")
    return d.logits.astype("float32").tobytes()


def decode_reset(dctx_h: int) -> int:
    d = _get(dctx_h)
    d.ctx.reset()
    d.logits = None
    d.n_past = 0
    return 0


# ------------------------------ sampler tier -------------------------------
# llama_sampler_chain_* counterpart: config via JSON (C-friendly), applied
# to caller-provided logits.


def sampler_new(cfg_json: str) -> int:
    import json

    from ..runtime.sampling import make_chain

    cfg = json.loads(cfg_json) if cfg_json.strip() else {}
    return _put(make_chain(**cfg))


def sampler_sample(sampler_h: int, logits_bytes: bytes) -> int:
    import numpy as np

    chain = _get(sampler_h)
    return int(chain.sample(np.frombuffer(logits_bytes, np.float32).copy()))


def sampler_accept(sampler_h: int, token: int) -> int:
    _get(sampler_h).accept(int(token))
    return 0


def sampler_reset(sampler_h: int) -> int:
    _get(sampler_h).reset()
    return 0


# ------------------------------- state tier --------------------------------
# llama_state_seq_get_size/get_data/set_data + save/load_file counterpart
# (include/llama.h:795-896) over the Engine's slot snapshots.


def _state_bytes(eng, slot: int) -> bytes:
    import io

    import numpy as np

    data = eng.slot_save(int(slot))
    # np.savez cannot round-trip bfloat16 — store as uint16 with a name tag
    wire = {}
    for k, v in data.items():
        v = np.asarray(v)
        if v.dtype.itemsize == 2 and v.dtype.kind == "V" or \
                str(v.dtype) == "bfloat16":
            wire[k + "__bf16"] = v.view(np.uint16)
        else:
            wire[k] = v
    bio = io.BytesIO()
    np.savez(bio, **wire)
    return bio.getvalue()


def state_get_size(ctx_h: int, slot: int) -> int:
    return len(_state_bytes(_get(ctx_h), slot))


def state_get_data(ctx_h: int, slot: int) -> bytes:
    return _state_bytes(_get(ctx_h), slot)


def state_set_data(ctx_h: int, slot: int, blob: bytes) -> int:
    import io

    import numpy as np

    import ml_dtypes

    with np.load(io.BytesIO(blob)) as z:
        data = {}
        for k in z.files:
            if k.endswith("__bf16"):
                data[k[:-6]] = z[k].view(ml_dtypes.bfloat16)
            else:
                data[k] = z[k]
    return int(_get(ctx_h).slot_restore(int(slot), data))


def state_save_file(ctx_h: int, slot: int, path: str) -> int:
    blob = _state_bytes(_get(ctx_h), slot)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def state_load_file(ctx_h: int, slot: int, path: str) -> int:
    with open(path, "rb") as f:
        return state_set_data(ctx_h, slot, f.read())


def kv_clear(ctx_h: int, slot: int) -> int:
    _get(ctx_h).slot_erase(int(slot))
    return 0


# ----------------------------- embedding tier ------------------------------


def embedder_new(model_h: int) -> int:
    from ..runtime.embedder import Embedder

    return _put(Embedder(_get(model_h)))


def embed(embedder_h: int, text: str) -> bytes:
    import numpy as np

    embs, _ = _get(embedder_h).embed([text])
    return np.asarray(embs[0], np.float32).tobytes()


def free_handle(h: int) -> int:
    with _lock:
        obj = _handles.pop(int(h), None)
    if obj is not None and hasattr(obj, "stop"):
        try:
            obj.stop()
        except Exception:
            pass
    return 0

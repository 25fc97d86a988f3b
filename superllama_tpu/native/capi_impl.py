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


def free_handle(h: int) -> int:
    with _lock:
        obj = _handles.pop(int(h), None)
    if obj is not None and hasattr(obj, "stop"):
        try:
            obj.stop()
        except Exception:
            pass
    return 0

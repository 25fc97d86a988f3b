"""Multi-model router — counterpart of the reference server's router mode
(tools/server/server.cpp:124-164 + server-models.cpp): one front door that
hosts several models, routes each request by its ``model`` field, and
loads/unloads models at runtime via /models/load and /models/unload.

TPU-native twist: child "servers" are in-process ServerApps (one engine per
model) rather than spawned subprocesses — process isolation buys nothing when
every model shares one accelerator."""

from __future__ import annotations

import threading
import time
from typing import Any

from ..models import load_model


class ModelRouter:
    def __init__(self, default_model: str | None = None, n_slots: int = 2,
                 n_ctx: int = 2048, kv_dtype=None, api_keys=None):
        self._apps: dict[str, Any] = {}
        self._lock = threading.Lock()
        self.n_slots = n_slots
        self.n_ctx = n_ctx
        self.kv_dtype = kv_dtype
        self.api_keys = api_keys
        self.default = default_model

    def load(self, name: str, path: str, **kw) -> dict:
        from .http import ServerApp

        with self._lock:
            if name in self._apps:
                return {"success": True, "model": name, "already_loaded": True}
        t0 = time.perf_counter()
        model = load_model(path, keep_quantized=kw.pop("keep_quantized", False))
        app = ServerApp(model, n_slots=kw.pop("n_slots", self.n_slots),
                        n_ctx=kw.pop("n_ctx", self.n_ctx),
                        kv_dtype=self.kv_dtype, api_keys=self.api_keys,
                        model_name=name, **kw)
        app.engine.start()
        with self._lock:
            self._apps[name] = app
            if self.default is None:
                self.default = name
        return {"success": True, "model": name,
                "load_s": round(time.perf_counter() - t0, 2)}

    def unload(self, name: str) -> dict:
        with self._lock:
            app = self._apps.pop(name, None)
            if self.default == name:
                self.default = next(iter(self._apps), None)
        if app is None:
            raise KeyError(f"model {name!r} not loaded")
        app.engine.stop()
        return {"success": True, "model": name}

    def app_for(self, body: dict):
        name = body.get("model") or self.default
        with self._lock:
            app = self._apps.get(name)
        if app is None:
            raise KeyError(f"model {name!r} not loaded; "
                           f"available: {sorted(self._apps)}")
        return app

    def models(self) -> list[dict]:
        with self._lock:
            items = list(self._apps.items())
        return [{"id": name, "object": "model",
                 "arch": app.model.hparams.arch,
                 "n_ctx": app.engine.n_ctx,
                 "default": name == self.default}
                for name, app in items]

"""HTTP inference server.

Route surface mirrors the reference llama-server (tools/server/server.cpp:
161-199): health/metrics/props/slots, tokenize/detokenize, completions,
OpenAI /v1/chat/completions (incl. SSE), Anthropic /v1/messages (incl. SSE),
plus the enterprise middleware (API keys, rate limiting, audit, SLA, cost).

Host layer only — the device hot path lives in runtime/engine.py. Python's
ThreadingHTTPServer is throughput-neutral here because all token work happens
on the single engine thread (same architecture as the reference's HTTP pool +
single inference thread).
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from ..models.loader import LoadedModel
from ..runtime.engine import Engine, GenRequest
from .chat import template_for_model
from .enterprise import (
    ApiKeyManager,
    AuditLogger,
    ContentFilter,
    CostTracker,
    HealthMonitor,
    RateLimiter,
    SLAMonitor,
)
from .metrics import JsonlMetricsLogger, MetricsRegistry


def _decode_wav(raw: bytes):
    """16-bit PCM WAV bytes → mono float32 samples at the file's rate
    (mtmd-audio.cpp accepts wav input the same way)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(raw)) as w:
        n = w.getnframes()
        data = np.frombuffer(w.readframes(n), np.int16).astype(np.float32)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
    return data / 32768.0


class ServerApp:
    """Wires model + engine + enterprise middleware; transport-agnostic."""

    def __init__(self, model: LoadedModel, n_slots: int = 4, n_ctx: int = 2048,
                 api_keys: dict[str, str] | None = None,
                 rate_limit_rpm: int = 0, model_name: str | None = None,
                 kv_dtype=None, metrics_path: str | None = None,
                 embed_model: "LoadedModel | None" = None,
                 draft_model: "LoadedModel | None" = None, n_draft: int = 8,
                 paged: bool = False, page_size: int = 256,
                 n_pages: int | None = None,
                 mmproj_path: str | None = None):
        import jax.numpy as jnp

        self.model = model
        self.model_name = model_name or model.name or "model"
        self.engine = Engine(model, n_slots=n_slots, n_ctx=n_ctx,
                             kv_dtype=kv_dtype or jnp.bfloat16,
                             draft_model=draft_model, n_draft=n_draft,
                             paged=paged, page_size=page_size, n_pages=n_pages)
        self.embedder = None
        if embed_model is not None:
            from ..runtime.embedder import Embedder
            self.embedder = Embedder(embed_model)
        # multimodal serving (tools/mtmd + server vision path): image parts
        # on the chat endpoints run through the mmproj tower and reach the
        # engine as embedding-prefix requests
        self.mtmd = None
        self.mtmd_audio = None
        if mmproj_path:
            from ..gguf import GGUFReader

            r = GGUFReader(mmproj_path)
            has_audio = bool(r.metadata.get("clip.has_audio_encoder", False))
            r.close()
            if has_audio:
                from ..tools.mtmd import AudioMultimodal
                self.mtmd_audio = AudioMultimodal(model, mmproj_path)
            else:
                from ..tools.mtmd import Multimodal
                self.mtmd = Multimodal(model, mmproj_path)
        self.chat_template = template_for_model(model)
        self.metrics = MetricsRegistry()
        self.metrics.histogram_declare("request_duration_seconds",
                                        [0.01, 0.05, 0.1, 0.5, 1, 2, 5, 10, 30, 60])
        self.keys = ApiKeyManager()
        self.require_auth = bool(api_keys)
        for key, user in (api_keys or {}).items():
            self.keys.create(key, user)
        self.rate = RateLimiter(rate_limit_rpm or 10**9)
        self.audit = AuditLogger()
        self.sla = SLAMonitor()
        self.cost = CostTracker()
        self.health = HealthMonitor()
        self.content_filter = ContentFilter()
        self.jsonl = JsonlMetricsLogger(metrics_path)
        self.health.register("engine", lambda: True)
        self.loras: list[dict] = []
        import tempfile
        self.slot_save_path = tempfile.mkdtemp(prefix="slt_slots_")
        from .telemetry import MemTelemetry
        self.telemetry = MemTelemetry()
        self.t_start = time.time()

    # ------------------------------------------------------------- helpers

    def auth(self, headers) -> tuple[str | None, str | None]:
        """Returns (client_id, error)."""
        key = None
        auth = headers.get("Authorization", "")
        if auth.startswith("Bearer "):
            key = auth[7:]
        key = key or headers.get("x-api-key")
        if not self.require_auth:
            return (key and self.keys.validate(key)) or "anonymous", None
        if not key:
            return None, "missing API key"
        user = self.keys.validate(key)
        if user is None:
            return None, "invalid API key"
        return user, None

    def _sampling_from(self, body: dict) -> dict:
        s: dict[str, Any] = {}
        if "temperature" in body:
            s["temp"] = float(body["temperature"])
        if "top_p" in body:
            s["top_p"] = float(body["top_p"])
        if "top_k" in body:
            s["top_k"] = int(body["top_k"])
        if "min_p" in body:
            s["min_p"] = float(body["min_p"])
        if "seed" in body and body["seed"] is not None:
            s["seed"] = int(body["seed"])
        if "repeat_penalty" in body:
            s["penalty_repeat"] = float(body["repeat_penalty"])
        if "frequency_penalty" in body:
            s["penalty_freq"] = float(body["frequency_penalty"])
        if "presence_penalty" in body:
            s["penalty_present"] = float(body["presence_penalty"])
        if "logit_bias" in body and body["logit_bias"]:
            lb = body["logit_bias"]
            if isinstance(lb, dict):
                s["logit_bias"] = {int(k): float(v) for k, v in lb.items()}
            else:  # llama.cpp-style [[token, bias], ...]
                s["logit_bias"] = {int(t): float(b) for t, b in lb}
        if "mirostat" in body:
            s["mirostat"] = int(body["mirostat"])
            s["mirostat_tau"] = float(body.get("mirostat_tau", 5.0))
            s["mirostat_eta"] = float(body.get("mirostat_eta", 0.1))
        if "typical_p" in body:
            s["typical_p"] = float(body["typical_p"])
        if "dry_multiplier" in body:
            s["dry_multiplier"] = float(body["dry_multiplier"])
        if body.get("temperature", 1.0) == 0.0:
            s["greedy"] = True
        return s

    def _grammar_from(self, body: dict) -> str | None:
        """Resolve constrained-decoding params: `grammar` (GBNF text),
        `json_schema`, or OpenAI `response_format` {json_object|json_schema}
        (tools/server request parsing counterpart)."""
        from ..grammar import json_schema_to_gbnf
        if body.get("grammar"):
            return body["grammar"]
        if body.get("json_schema") is not None:
            return json_schema_to_gbnf(body["json_schema"])
        rf = body.get("response_format") or {}
        t = rf.get("type")
        if t == "json_schema":
            return json_schema_to_gbnf(rf["json_schema"].get("schema", {}))
        if t == "json_object":
            return json_schema_to_gbnf(rf.get("schema", {}))
        return None

    def _stops(self, body) -> list[str]:
        stop = body.get("stop") or body.get("stop_sequences") or []
        return [stop] if isinstance(stop, str) else list(stop)

    # ------------------------------------------------------------- handlers

    def handle_completion(self, body: dict, client: str, stream_cb=None) -> dict:
        tok = self.model.tokenizer
        embeds = None
        if "__mm" in body:                   # multimodal chat: prebuilt pair
            ids, embeds = body["__mm"]
        else:
            prompt = body.get("prompt", "")
            ids = (prompt if isinstance(prompt, list)
                   else tok.encode(prompt, add_special=True,
                                   parse_special=True))
        max_tokens = int(body.get("max_tokens") or body.get("n_predict") or 128)
        req = GenRequest(
            prompt_ids=list(ids), prompt_embeds=embeds, max_tokens=max_tokens,
            stop_strings=self._stops(body),
            sampling=self._sampling_from(body),
            grammar=self._grammar_from(body),
            grammar_lazy=bool(body.get("grammar_lazy", False)),
            grammar_triggers=list(body.get("grammar_triggers", [])),
            stream=stream_cb,
        )
        self.engine.submit(req)
        out = req.result(timeout=600)
        self.cost.record(client, self.model_name, out["n_prompt"], out["n_generated"])
        return {
            "id": "cmpl-" + uuid.uuid4().hex[:24],
            "object": "text_completion",
            "created": int(time.time()),
            "model": self.model_name,
            "choices": [{
                "index": 0, "text": out["text"],
                "finish_reason": out["finish_reason"], "logprobs": None,
            }],
            "usage": {
                "prompt_tokens": out["n_prompt"],
                "completion_tokens": out["n_generated"],
                "total_tokens": out["n_prompt"] + out["n_generated"],
            },
            "timings": {"ttft_s": out["ttft_s"], "total_s": out["total_s"]},
        }

    def _extract_media(self, messages: list[dict]
                       ) -> tuple[list[dict], list]:
        """OpenAI content-part lists → flat text with media markers + the
        decoded pixel arrays, in order (mtmd.cpp marker splicing). Only
        data: URLs are accepted — this server has no egress."""
        import base64

        from ..tools.mtmd import MEDIA_MARKER, decode_image

        size = (self.mtmd.clip["hp"]["image_size"]
                if self.mtmd is not None else 0)
        out, images = [], []
        for m in messages:
            c = m.get("content")
            if not isinstance(c, list):
                out.append(m)
                continue
            parts = []
            for p in c:
                t = p.get("type")
                if t in ("text", "input_text"):
                    parts.append(p.get("text", ""))
                elif t in ("image_url", "input_image", "image"):
                    if self.mtmd is None:
                        raise ValueError("this server's mmproj has no "
                                         "vision tower")
                    url = (p.get("image_url") or {})
                    url = url.get("url") if isinstance(url, dict) else url
                    url = url or p.get("url") or ""
                    if not url.startswith("data:"):
                        raise ValueError(
                            "image_url must be a data: URL (no egress)")
                    raw = base64.b64decode(url.split(",", 1)[1])
                    images.append(decode_image(raw, size))
                    parts.append(MEDIA_MARKER)
                elif t == "input_audio":
                    if self.mtmd_audio is None:
                        raise ValueError("this server's mmproj has no "
                                         "audio encoder")
                    ia = p.get("input_audio") or {}
                    raw = base64.b64decode(ia.get("data", ""))
                    images.append(("audio", _decode_wav(raw)))
                    parts.append(MEDIA_MARKER)
                else:
                    raise ValueError(f"unsupported content part type {t!r}")
            out.append({**m, "content": "".join(parts)})
        return out, images

    def handle_chat(self, body: dict, client: str, stream_cb=None) -> dict:
        from .toolcall import parse_tool_calls, plan_tools, split_reasoning

        messages = body["messages"]
        images: list = []
        if any(isinstance(m.get("content"), list) for m in messages):
            if self.mtmd is None and self.mtmd_audio is None:
                raise ValueError(
                    "multimodal content needs the server started with "
                    "--mmproj (tools/mtmd vision/audio tower)")
            messages, images = self._extract_media(messages)
        plan = plan_tools(body, self.chat_template.source)
        prompt = self.chat_template.apply(
            messages, add_generation_prompt=True,
            tools=body.get("tools"))
        inner = dict(body)
        inner["prompt"] = prompt
        if images:
            from ..tools.mtmd import build_embed_prompt

            ids, embeds = build_embed_prompt(
                self.mtmd, self.model.tokenizer, prompt, images,
                audio=self.mtmd_audio)
            inner["__mm"] = (ids, embeds)
        inner.setdefault("max_tokens", body.get("max_tokens") or 512)
        if plan is not None and plan.grammar:
            inner["grammar"] = plan.grammar
            inner["grammar_lazy"] = plan.grammar_lazy
            inner["grammar_triggers"] = plan.triggers
        reason_fmt = body.get("reasoning_format", "auto")
        # deepseek-r1-style templates end the prompt inside an open <think>
        forced_open = prompt.rstrip().endswith("<think>")
        if plan is not None and plan.extra_stops:
            inner["stop"] = self._stops(body) + plan.extra_stops
        stream_cb, flush = self._tool_stream(plan, stream_cb,
                                             reasoning=reason_fmt != "none",
                                             forced_open=forced_open)
        out = self.handle_completion(inner, client, stream_cb)
        flush()

        content = out["choices"][0]["text"]
        finish = out["choices"][0]["finish_reason"]
        reasoning = ""
        if reason_fmt != "none":
            reasoning, content = split_reasoning(content,
                                                 forced_open=forced_open)
        message: dict = {"role": "assistant", "content": content}
        if plan is not None:
            content, tool_calls = parse_tool_calls(plan, content)
            if tool_calls:
                message = {"role": "assistant", "content": content or None,
                           "tool_calls": tool_calls}
                finish = "tool_calls"
        if reasoning:
            message["reasoning_content"] = reasoning
        return {
            "id": "chatcmpl-" + uuid.uuid4().hex[:24],
            "object": "chat.completion",
            "created": out["created"],
            "model": self.model_name,
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": finish,
            }],
            "usage": out["usage"],
        }

    @staticmethod
    def _tool_stream(plan, stream_cb, reasoning: bool = False,
                     forced_open: bool = False):
        """Wrap a raw-piece stream callback with the incremental reasoning
        splitter + tool-call splitter: downstream receives typed events
        (content / reasoning / tc_start / tc_args dicts) instead of raw
        text whenever tools or reasoning extraction are in play."""
        if stream_cb is None or (plan is None and not reasoning):
            return stream_cb, lambda: None
        from .toolcall import ReasoningStream, StreamingToolCallParser

        parser = StreamingToolCallParser(plan) if plan is not None else None
        rstream = ReasoningStream(forced_open=forced_open) if reasoning else None

        def emit_post_reasoning(token, text):
            if parser is not None:
                for ev in parser.feed(text):
                    stream_cb(token, ev)
            else:
                stream_cb(token, {"ev": "content", "text": text})

        def wrapped(token, piece):
            if rstream is None:
                emit_post_reasoning(token, piece)
                return
            for kind, text in rstream.feed(piece):
                if kind == "reasoning":
                    stream_cb(token, {"ev": "reasoning", "text": text})
                else:
                    emit_post_reasoning(token, text)

        def flush():
            if rstream is not None:
                for kind, text in rstream.finish():
                    if kind == "reasoning":
                        stream_cb(None, {"ev": "reasoning", "text": text})
                    elif parser is not None:
                        for ev in parser.feed(text):
                            stream_cb(None, ev)
                    else:
                        stream_cb(None, {"ev": "content", "text": text})
            if parser is not None:
                for ev in parser.finish():
                    stream_cb(None, ev)

        return wrapped, flush

    def handle_anthropic_messages(self, body: dict, client: str, stream_cb=None) -> dict:
        """Anthropic Messages API compatibility (/v1/messages)."""
        messages = list(body.get("messages", []))
        if body.get("system"):
            sys_content = body["system"]
            if isinstance(sys_content, list):
                sys_content = "".join(b.get("text", "") for b in sys_content)
            messages = [{"role": "system", "content": sys_content}] + messages
        # flatten content blocks (text + tool_result)
        for m in messages:
            if isinstance(m.get("content"), list):
                parts = []
                for b in m["content"]:
                    if b.get("type") == "text":
                        parts.append(b.get("text", ""))
                    elif b.get("type") == "tool_result":
                        c = b.get("content", "")
                        if isinstance(c, list):
                            c = "".join(x.get("text", "") for x in c)
                        parts.append(f"<tool_response>{c}</tool_response>")
                    elif b.get("type") == "tool_use":
                        parts.append(json.dumps({"name": b.get("name"),
                                                 "arguments": b.get("input", {})}))
                m["content"] = "".join(parts)
        # Anthropic tools → OpenAI shape for the planner/template
        plan = None
        oai_tools = None
        if body.get("tools"):
            from .toolcall import plan_tools
            oai_tools = [{"type": "function",
                          "function": {"name": t["name"],
                                       "description": t.get("description", ""),
                                       "parameters": t.get("input_schema",
                                                           {"type": "object"})}}
                         for t in body["tools"]]
            tc = body.get("tool_choice") or {"type": "auto"}
            choice = {"auto": "auto", "any": "required", "none": "none"}.get(
                tc.get("type"), "auto")
            if tc.get("type") == "tool":
                choice = {"type": "function", "function": {"name": tc["name"]}}
            plan = plan_tools({"tools": oai_tools, "tool_choice": choice},
                              self.chat_template.source)
        prompt = self.chat_template.apply(messages, add_generation_prompt=True,
                                          tools=oai_tools)
        inner = {
            "prompt": prompt,
            "max_tokens": body.get("max_tokens", 512),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
            "top_k": body.get("top_k", 0),
            "stop": body.get("stop_sequences", []),
        }
        if plan is not None and plan.grammar:
            inner["grammar"] = plan.grammar
            inner["grammar_lazy"] = plan.grammar_lazy
            inner["grammar_triggers"] = plan.triggers
        stream_cb, flush = self._tool_stream(plan, stream_cb)
        out = self.handle_completion(inner, client, stream_cb)
        flush()
        stop_map = {"stop": "end_turn", "length": "max_tokens"}
        text = out["choices"][0]["text"]
        content_blocks: list[dict] = []
        stop_reason = stop_map.get(out["choices"][0]["finish_reason"], "end_turn")
        if body.get("reasoning_format", "auto") != "none":
            from .toolcall import split_reasoning
            reasoning, text = split_reasoning(
                text, forced_open=prompt.rstrip().endswith("<think>"))
            if reasoning:
                # Anthropic extended-thinking block shape
                content_blocks.append({"type": "thinking",
                                       "thinking": reasoning,
                                       "signature": ""})
        if plan is not None:
            from .toolcall import parse_tool_calls
            rest, calls = parse_tool_calls(plan, text)
            if calls:
                if rest:
                    content_blocks.append({"type": "text", "text": rest})
                for c in calls:
                    content_blocks.append({
                        "type": "tool_use",
                        "id": "toolu_" + c["id"][5:],
                        "name": c["function"]["name"],
                        "input": json.loads(c["function"]["arguments"] or "{}"),
                    })
                stop_reason = "tool_use"
        if not content_blocks or all(b["type"] == "thinking"
                                     for b in content_blocks):
            content_blocks.append({"type": "text", "text": text})
        return {
            "id": "msg_" + uuid.uuid4().hex[:24],
            "type": "message",
            "role": "assistant",
            "model": body.get("model", self.model_name),
            "content": content_blocks,
            "stop_reason": stop_reason,
            "stop_sequence": None,
            "usage": {
                "input_tokens": out["usage"]["prompt_tokens"],
                "output_tokens": out["usage"]["completion_tokens"],
            },
        }

    def handle_embeddings(self, body: dict, client: str) -> dict:
        """OpenAI /v1/embeddings + native /embeddings."""
        if self.embedder is None:
            raise NotImplementedError("no embedding model loaded")
        inputs = body.get("input", body.get("content", ""))
        single = isinstance(inputs, str)
        texts = [inputs] if single else [str(x) for x in inputs]
        embs, n_tok = self.embedder.embed(texts)
        self.cost.record(client, self.model_name, n_tok, 0)
        return {
            "object": "list",
            "model": body.get("model", self.model_name),
            "data": [{"object": "embedding", "index": i, "embedding": e.tolist()}
                     for i, e in enumerate(embs)],
            "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok},
        }

    def handle_rerank(self, body: dict, client: str) -> dict:
        """Jina/Cohere-style /rerank (tools/server rerank counterpart)."""
        if self.embedder is None:
            raise NotImplementedError("no embedding model loaded")
        docs = body.get("documents", [])
        texts = [d.get("text", "") if isinstance(d, dict) else str(d) for d in docs]
        scores, n_tok = self.embedder.rerank(body["query"], texts)
        order = sorted(range(len(scores)), key=lambda i: -scores[i])
        top_n = int(body.get("top_n", len(order)))
        results = [{"index": i, "relevance_score": scores[i]} for i in order[:top_n]]
        if body.get("return_documents"):
            for r in results:
                r["document"] = {"text": texts[r["index"]]}
        self.cost.record(client, self.model_name, n_tok, 0)
        return {"model": body.get("model", self.model_name),
                "results": results,
                "usage": {"prompt_tokens": n_tok, "total_tokens": n_tok}}

    def handle_slot_action(self, slot_id: int, action: str, body: dict) -> dict:
        """/slots/:id?action=save|restore|erase (server.cpp:199, tasks
        SLOT_SAVE/RESTORE/ERASE)."""
        import numpy as _np
        import os as _os

        eng = self.engine
        if action == "erase":
            eng.slot_erase(slot_id)
            return {"id_slot": slot_id, "success": True}
        fname = body.get("filename")
        if not fname or "/" in fname or fname.startswith("."):
            raise ValueError("invalid or missing filename")
        path = _os.path.join(self.slot_save_path, fname)
        if action == "save":
            data = eng.slot_save(slot_id)
            t0 = time.perf_counter()
            _np.savez(path, **data)
            n = len(data["cache_tokens"])
            return {"id_slot": slot_id, "filename": fname,
                    "n_saved": n, "n_written": int(data["k"].nbytes + data["v"].nbytes),
                    "timings": {"save_ms": (time.perf_counter() - t0) * 1e3}}
        if action == "restore":
            t0 = time.perf_counter()
            with _np.load(path) as z:
                n = eng.slot_restore(slot_id, dict(z))
            return {"id_slot": slot_id, "filename": fname, "n_restored": n,
                    "timings": {"restore_ms": (time.perf_counter() - t0) * 1e3}}
        raise ValueError(f"unknown slot action {action!r}")

    def handle_infill(self, body: dict, client: str, stream_cb=None) -> dict:
        """Fill-in-the-middle completion (/infill): compose the FIM prompt
        from the vocab's fim_pre/suf/mid special tokens."""
        tok = self.model.tokenizer
        v = tok.vocab
        _FIM_NAMES = {
            "pre": ("<|fim_prefix|>", "<fim_prefix>", "<|fim_begin|>", "<PRE>"),
            "suf": ("<|fim_suffix|>", "<fim_suffix>", "<|fim_hole|>", "<SUF>"),
            "mid": ("<|fim_middle|>", "<fim_middle>", "<|fim_end|>", "<MID>"),
        }
        fim = {}
        for kind in ("pre", "suf", "mid"):
            tid = getattr(v, f"fim_{kind}_id", -1)
            if tid is None or tid < 0:
                for cand in _FIM_NAMES[kind]:
                    if cand in getattr(v, "token_to_id", {}):
                        tid = v.token_to_id[cand]
                        break
                else:
                    tid = -1
            if tid is None or tid < 0:
                raise NotImplementedError("model has no FIM tokens")
            fim[kind] = tid
        prefix = tok.encode(body.get("input_prefix", body.get("prefix", "")),
                            add_special=False)
        suffix = tok.encode(body.get("input_suffix", body.get("suffix", "")),
                            add_special=False)
        ids = [fim["pre"], *prefix, fim["suf"], *suffix, fim["mid"]]
        inner = dict(body)
        inner["prompt"] = ids
        inner.setdefault("max_tokens", body.get("n_predict") or 128)
        return self.handle_completion(inner, client, stream_cb)

    def handle_responses(self, body: dict, client: str) -> dict:
        """OpenAI Responses API (/v1/responses), non-streaming subset."""
        inp = body.get("input", "")
        if isinstance(inp, str):
            messages = [{"role": "user", "content": inp}]
        else:
            messages = [{"role": m.get("role", "user"),
                         "content": m.get("content", "")} for m in inp]
        if body.get("instructions"):
            messages = [{"role": "system", "content": body["instructions"]}] + messages
        inner = {
            "messages": messages,
            "max_tokens": body.get("max_output_tokens", 512),
            "temperature": body.get("temperature", 1.0),
            "top_p": body.get("top_p", 1.0),
            "tools": [{"type": "function", "function": t}
                      for t in body.get("tools", []) if t.get("type") == "function"]
                     or body.get("tools"),
            "tool_choice": body.get("tool_choice", "auto"),
        }
        out = self.handle_chat(inner, client)
        msg = out["choices"][0]["message"]
        content_items = []
        output = []
        if msg.get("content"):
            output.append({"type": "message", "id": "msg_" + uuid.uuid4().hex[:16],
                           "role": "assistant", "status": "completed",
                           "content": [{"type": "output_text",
                                        "text": msg["content"],
                                        "annotations": []}]})
        for tc in msg.get("tool_calls", []):
            output.append({"type": "function_call",
                           "id": "fc_" + uuid.uuid4().hex[:16],
                           "call_id": tc["id"],
                           "name": tc["function"]["name"],
                           "arguments": tc["function"]["arguments"],
                           "status": "completed"})
        usage = out["usage"]
        return {
            "id": "resp_" + uuid.uuid4().hex[:24],
            "object": "response",
            "created_at": int(time.time()),
            "status": "completed",
            "model": body.get("model", self.model_name),
            "output": output,
            "usage": {"input_tokens": usage["prompt_tokens"],
                      "output_tokens": usage["completion_tokens"],
                      "total_tokens": usage["total_tokens"]},
        }

    def attach_lora(self, path: str, scale: float = 1.0) -> None:
        """Load + merge a LoRA adapter, keeping it for runtime rescale
        (/lora-adapters, common_adapter_lora_info counterpart)."""
        from ..models.lora import load_lora, merge_lora

        adapter = load_lora(path)
        self.model.params = merge_lora(self.model.params, adapter, scale)
        self.loras.append({"path": path, "scale": scale, "adapter": adapter})

    def lora_list(self) -> list[dict]:
        return [{"id": i, "path": l["path"], "scale": l["scale"]}
                for i, l in enumerate(self.loras)]

    def lora_set(self, entries: list[dict]) -> list[dict]:
        """POST /lora-adapters: set per-adapter scales. The merge is
        additive, so a rescale re-merges the delta (new − old)."""
        from ..models.lora import merge_lora

        for e in entries:
            i, new = int(e["id"]), float(e["scale"])
            l = self.loras[i]
            delta = new - l["scale"]
            if delta:
                self.model.params = merge_lora(self.model.params,
                                               l["adapter"], delta)
                l["scale"] = new
        return self.lora_list()

    def apply_template(self, body: dict) -> dict:
        """POST /apply-template: render the chat template without
        generating (tools/server counterpart)."""
        prompt = self.chat_template.apply(body.get("messages", []),
                                          add_generation_prompt=True)
        return {"prompt": prompt}

    def ollama_tags(self) -> dict:
        caps = ["completion"]
        detail = {"parent_model": "", "format": "gguf",
                  "family": self.model.hparams.arch,
                  "families": [self.model.hparams.arch],
                  "parameter_size": "", "quantization_level": ""}
        return {"models": [{
            "name": self.model_name, "model": self.model_name,
            "modified_at": "", "size": "", "digest": "", "type": "model",
            "description": "", "tags": [""], "capabilities": caps,
            "parameters": "", "details": detail,
        }], "object": "list", "data": [{
            "id": self.model_name, "object": "model",
            "created": int(self.t_start), "owned_by": "superllama_tpu",
        }]}

    def ollama_show(self) -> dict:
        return {
            "model_info": {"llama.context_length": self.engine.n_ctx},
            "modelfile": "", "parameters": "",
            "template": self.chat_template.source,
            "details": {"parent_model": "", "format": "gguf",
                        "family": self.model.hparams.arch,
                        "families": [self.model.hparams.arch],
                        "parameter_size": "", "quantization_level": ""},
            "capabilities": ["completion"],
        }

    def count_tokens(self, body: dict) -> dict:
        """POST /v1/messages/count_tokens (Anthropic token counting)."""
        msgs = [{"role": m.get("role", "user"),
                 "content": m["content"] if isinstance(m.get("content"), str)
                 else "".join(b.get("text", "")
                              for b in (m.get("content") or []))}
                for m in body.get("messages", [])]
        if body.get("system"):
            sys_c = body["system"]
            msgs.insert(0, {"role": "system",
                            "content": sys_c if isinstance(sys_c, str)
                            else "".join(b.get("text", "") for b in sys_c)})
        prompt = self.chat_template.apply(msgs, add_generation_prompt=True)
        n = len(self.model.tokenizer.encode(prompt, add_special=True,
                                            parse_special=True))
        return {"input_tokens": n}

    def props(self) -> dict:
        hp = self.model.hparams
        return {
            "model": self.model_name,
            "arch": hp.arch,
            "n_ctx": self.engine.n_ctx,
            "n_slots": self.engine.n_slots,
            "n_vocab": hp.n_vocab,
            "n_layer": hp.n_layer,
            "uptime_s": time.time() - self.t_start,
            "chat_template": self.chat_template.source[:200],
        }

    def slots(self) -> list[dict]:
        out = [{
            "id": s.idx,
            "state": s.state.name,
            "n_past": s.n_past,
            "n_generated": len(s.generated),
            "request_id": s.req.request_id if s.req else None,
        } for s in self.engine.slots]
        if self.engine.paged:
            mgr = self.engine.pkv
            for d in out:
                d["n_pages"] = mgr.seq_pages(d["id"])
        return out

    def prometheus_text(self) -> str:
        m = self.engine.metrics
        mem = self.telemetry.snapshot()
        self.metrics.gauge_set("device_memory_used_bytes", mem["device_used_bytes"])
        self.metrics.gauge_set("device_memory_frac", mem["device_frac"])
        self.metrics.gauge_set("host_memory_frac", mem["host_frac"])
        self.metrics.gauge_set("memory_pressure", int(mem["pressure"]))
        self.metrics.gauge_set("slots_busy", sum(s.state.value != 0 for s in self.engine.slots))
        self.metrics.gauge_set("queue_depth", self.engine._queue.qsize())
        self.metrics.gauge_set("tokens_generated_total", m["n_tokens_generated"])
        self.metrics.gauge_set("prompt_tokens_total", m["n_prompt_tokens"])
        self.metrics.gauge_set("requests_total", m["n_requests"])
        sla = self.sla.snapshot()
        self.metrics.gauge_set("latency_p50_seconds", sla["p50_s"])
        self.metrics.gauge_set("latency_p95_seconds", sla["p95_s"])
        self.metrics.gauge_set("error_rate", sla["error_rate"])
        if self.engine.paged:
            pstats = self.engine.pkv.stats
            for key in ("allocs", "evictions", "restores", "spill_bytes",
                        "restore_bytes"):
                self.metrics.gauge_set(f"kv_pages_{key}", pstats[key])
            self.metrics.gauge_set(
                "kv_pages_free", len(self.engine.pkv.free))
        return self.metrics.expose()


def make_handler(app: ServerApp):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _send_json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _err(self, code, msg, etype="invalid_request_error"):
            self._send_json({"error": {"message": msg, "type": etype}}, code)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            if n == 0:
                return {}
            return json.loads(self.rfile.read(n))

        # ------------------------------------------------------------- GET

        def do_GET(self):
            path = self.path.split("?")[0]
            is_router = hasattr(app, "app_for")
            if path in ("/", "/index.html"):
                # built-in chat UI (reference: tools/server webui)
                import os
                with open(os.path.join(os.path.dirname(__file__),
                                       "webui.html"), "rb") as f:
                    page = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
            elif path in ("/health", "/v1/health"):
                if is_router:
                    self._send_json({"status": "ok",
                                     "models": [m["id"] for m in app.models()]})
                else:
                    self._send_json({"status": app.health.status()})
            elif path in ("/v1/models", "/models"):
                if is_router:
                    self._send_json({"object": "list", "data": app.models()})
                else:
                    self._send_json({"object": "list", "data": [{
                        "id": app.model_name, "object": "model",
                        "created": int(app.t_start), "owned_by": "superllama_tpu",
                    }]})
            elif path == "/props":
                self._send_json((app.app_for({}) if is_router else app).props())
            elif path == "/api/tags":   # ollama-compat model listing
                self._send_json((app.app_for({}) if is_router else app).ollama_tags())
            elif path == "/lora-adapters":
                self._send_json((app.app_for({}) if is_router else app).lora_list())
            elif path == "/slots":
                self._send_json((app.app_for({}) if is_router else app).slots())
            elif path == "/metrics":
                a = app.app_for({}) if hasattr(app, "app_for") else app
                text = a.prometheus_text().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(text)))
                self.end_headers()
                self.wfile.write(text)
            else:
                self._err(404, f"unknown path {path}")

        # ------------------------------------------------------------- POST

        def do_POST(self):
            path = self.path.split("?")[0]
            t0 = time.perf_counter()
            try:
                body = self._body()
            except (json.JSONDecodeError, ValueError) as e:
                return self._err(400, f"invalid JSON: {e}")
            router = app if hasattr(app, "app_for") else None
            if router is not None:
                # router-level management routes (server-models.cpp)
                if path == "/models/load":
                    try:
                        return self._send_json(router.load(
                            body["model"], body["path"]))
                    except (KeyError, OSError, ValueError) as e:
                        return self._err(400, f"load failed: {e}")
                if path == "/models/unload":
                    try:
                        return self._send_json(router.unload(body["model"]))
                    except KeyError as e:
                        return self._err(404, str(e))
                try:
                    a = router.app_for(body)
                except KeyError as e:
                    return self._err(404, str(e), "model_not_found")
            else:
                a = app
            client, err = a.auth(self.headers)
            if err:
                a.audit.log("auth_failure", detail={"path": path, "err": err})
                return self._err(401, err, "authentication_error")
            if not a.rate.allow_request(client):
                a.audit.log("rate_limited", client)
                return self._err(429, "rate limit exceeded", "rate_limit_error")
            a.audit.log("request", client, {"path": path})
            ok = True
            try:
                if path in ("/tokenize",):
                    tok = a.model.tokenizer
                    ids = tok.encode(body.get("content", ""),
                                     add_special=bool(body.get("add_special", False)),
                                     parse_special=bool(body.get("parse_special", True)))
                    self._send_json({"tokens": ids})
                elif path in ("/detokenize",):
                    tok = a.model.tokenizer
                    self._send_json({"content": tok.decode(body.get("tokens", []))})
                elif path in ("/completion", "/completions", "/v1/completions"):
                    self._dispatch_gen(body, client, a.handle_completion,
                                       self._sse_completion_chunk)
                elif path in ("/v1/chat/completions", "/chat/completions",
                              "/api/chat"):  # /api/chat: ollama-compat alias
                    self._dispatch_gen(body, client, a.handle_chat,
                                       self._sse_chat_chunk)
                elif path == "/profile/start":
                    # capture a device-trace window of live serving traffic
                    # (jax.profiler / XProf; SURVEY §5.1)
                    from ..utils import profiler
                    tdir = body.get("dir") or "/tmp/superllama_trace"
                    if profiler.start(tdir):
                        self._send_json({"tracing": True, "dir": tdir})
                    else:
                        ok = False
                        self._err(409, "profiler unavailable or already "
                                       "tracing")
                elif path == "/profile/stop":
                    from ..utils import profiler
                    tdir = profiler.stop()
                    if tdir is None:
                        ok = False
                        self._err(409, "no active trace")
                    else:
                        self._send_json({"tracing": False, "dir": tdir})
                elif path == "/api/show":
                    self._send_json(a.ollama_show())
                elif path == "/apply-template":
                    self._send_json(a.apply_template(body))
                elif path == "/v1/messages/count_tokens":
                    self._send_json(a.count_tokens(body))
                elif path == "/lora-adapters":
                    try:
                        self._send_json(a.lora_set(body))
                    except (IndexError, KeyError) as e:
                        ok = False
                        self._err(400, f"bad adapter ref: {e}")
                elif path == "/v1/messages":
                    self._dispatch_gen(body, client, a.handle_anthropic_messages,
                                       self._sse_anthropic_events, anthropic=True)
                elif path in ("/embedding", "/embeddings", "/v1/embeddings"):
                    try:
                        self._send_json(a.handle_embeddings(body, client))
                    except NotImplementedError as e:
                        ok = False
                        self._err(501, str(e))
                elif path in ("/rerank", "/v1/rerank", "/reranking",
                              "/v1/reranking"):
                    try:
                        self._send_json(a.handle_rerank(body, client))
                    except NotImplementedError as e:
                        ok = False
                        self._err(501, str(e))
                elif path.startswith("/slots/"):
                    qs = self.path.split("?", 1)[1] if "?" in self.path else ""
                    action = dict(p.split("=", 1) for p in qs.split("&") if "=" in p
                                  ).get("action", "")
                    self._send_json(a.handle_slot_action(
                        int(path.split("/")[2]), action, body))
                elif path == "/infill":
                    try:
                        self._dispatch_gen(body, client, a.handle_infill,
                                           self._sse_completion_chunk)
                    except NotImplementedError as e:
                        ok = False
                        self._err(501, str(e))
                elif path == "/v1/responses":
                    self._send_json(a.handle_responses(body, client))
                else:
                    ok = False
                    return self._err(404, f"unknown path {path}")
            except (KeyError, TypeError, ValueError) as e:
                ok = False
                self._err(400, f"bad request: {e}")
            except RuntimeError as e:
                ok = False
                self._err(400, str(e))
            except Exception as e:  # noqa: BLE001
                ok = False
                self._err(500, f"internal error: {e}", "api_error")
            finally:
                dt = time.perf_counter() - t0
                a.sla.record(dt, ok)
                a.metrics.histogram_observe("request_duration_seconds", dt,
                                               {"path": path})
                a.metrics.counter_inc("http_requests_total",
                                         labels={"path": path, "ok": str(ok).lower()})
                a.jsonl.log(a.engine, force=False)

        # --------------------------------------------------------- streaming

        def _dispatch_gen(self, body, client, handler, chunk_fn, anthropic=False):
            if not body.get("stream"):
                return self._send_json(handler(body, client))
            q: "queue.Queue" = queue.Queue()
            done = object()

            def cb(token, piece):
                q.put(piece)

            result_holder = {}

            def run():
                try:
                    result_holder["result"] = handler(body, client, stream_cb=cb)
                except Exception as e:  # noqa: BLE001
                    result_holder["error"] = str(e)
                q.put(done)

            threading.Thread(target=run, daemon=True).start()
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def send_event(data: str, event: str | None = None):
                msg = (f"event: {event}\n" if event else "") + f"data: {data}\n\n"
                b = msg.encode()
                self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")

            rid = uuid.uuid4().hex[:24]
            astream = _AnthropicBlockStream() if anthropic else None
            if anthropic:
                send_event(json.dumps({"type": "message_start", "message": {
                    "id": "msg_" + rid, "type": "message", "role": "assistant",
                    "model": app.model_name, "content": [],
                    "usage": {"input_tokens": 0, "output_tokens": 0}}}), "message_start")
                send_event(json.dumps({"type": "content_block_start", "index": 0,
                                        "content_block": {"type": "text", "text": ""}}),
                           "content_block_start")
            while True:
                item = q.get()
                if item is done:
                    break
                if anthropic:
                    for data, ev in astream.events(item):
                        send_event(data, ev)
                else:
                    data = chunk_fn(rid, item)
                    if data is not None:
                        send_event(data)
            final = result_holder.get("result")
            if anthropic:
                for data, ev in astream.close():
                    send_event(data, ev)
                usage = (final or {}).get("usage", {})
                send_event(json.dumps({"type": "message_delta",
                                        "delta": {"stop_reason": (final or {}).get("stop_reason", "end_turn")},
                                        "usage": {"output_tokens": usage.get("output_tokens", 0)}}),
                           "message_delta")
                send_event(json.dumps({"type": "message_stop"}), "message_stop")
            else:
                send_event(json.dumps({
                    "id": rid, "object": "chat.completion.chunk",
                    "choices": [{"index": 0, "delta": {},
                                  "finish_reason": (final or {}).get("choices", [{}])[0].get("finish_reason", "stop")}],
                }))
                send_event("[DONE]")
            self.wfile.write(b"0\r\n\r\n")

        @staticmethod
        def _sse_completion_chunk(rid, piece):
            return json.dumps({"id": rid, "object": "text_completion",
                                "choices": [{"index": 0, "text": piece,
                                              "finish_reason": None}]})

        @staticmethod
        def _sse_chat_chunk(rid, piece):
            # typed events from the streaming tool-call splitter
            if isinstance(piece, dict):
                ev = piece["ev"]
                if ev == "content":
                    if not piece["text"]:
                        return None
                    delta = {"content": piece["text"]}
                elif ev == "reasoning":
                    if not piece["text"]:
                        return None
                    delta = {"reasoning_content": piece["text"]}
                elif ev == "tc_start":
                    delta = {"tool_calls": [{
                        "index": piece["index"], "id": piece["id"],
                        "type": "function",
                        "function": {"name": piece["name"], "arguments": ""},
                    }]}
                else:  # tc_args
                    delta = {"tool_calls": [{
                        "index": piece["index"],
                        "function": {"arguments": piece["delta"]},
                    }]}
            else:
                delta = {"content": piece}
            return json.dumps({"id": rid, "object": "chat.completion.chunk",
                                "choices": [{"index": 0, "delta": delta,
                                              "finish_reason": None}]})

        @staticmethod
        def _sse_anthropic_events(rid, piece):  # kept for non-tool routes
            return json.dumps({"type": "content_block_delta", "index": 0,
                                "delta": {"type": "text_delta", "text": piece}})

    return Handler


class _AnthropicBlockStream:
    """Anthropic SSE content-block bookkeeping: text deltas ride the open
    text block; tool events open/close `tool_use` blocks with
    `input_json_delta` argument fragments (Messages API streaming shape)."""

    def __init__(self):
        self.index = 0          # block 0 (text) is opened by the caller
        self.open = True
        self.block_type = "text"

    def _stop(self):
        self.open = False
        return (json.dumps({"type": "content_block_stop",
                            "index": self.index}), "content_block_stop")

    def events(self, item):
        out = []
        if isinstance(item, str) or (isinstance(item, dict)
                                     and item.get("ev") == "content"):
            text = item if isinstance(item, str) else item["text"]
            if not text:
                return out
            if self.block_type != "text" or not self.open:
                if self.open:
                    out.append(self._stop())
                self.index += 1
                self.block_type = "text"
                self.open = True
                out.append((json.dumps(
                    {"type": "content_block_start", "index": self.index,
                     "content_block": {"type": "text", "text": ""}}),
                    "content_block_start"))
            out.append((json.dumps(
                {"type": "content_block_delta", "index": self.index,
                 "delta": {"type": "text_delta", "text": text}}),
                "content_block_delta"))
        elif item["ev"] == "tc_start":
            if self.open:
                out.append(self._stop())
            self.index += 1
            self.block_type = "tool_use"
            self.open = True
            out.append((json.dumps(
                {"type": "content_block_start", "index": self.index,
                 "content_block": {"type": "tool_use",
                                    "id": "toolu_" + item["id"][5:],
                                    "name": item["name"], "input": {}}}),
                "content_block_start"))
        elif item["ev"] == "tc_args":
            out.append((json.dumps(
                {"type": "content_block_delta", "index": self.index,
                 "delta": {"type": "input_json_delta",
                           "partial_json": item["delta"]}}),
                "content_block_delta"))
        return out

    def close(self):
        return [self._stop()] if self.open else []


class Server:
    def __init__(self, app: ServerApp, host: str = "127.0.0.1", port: int = 8080,
                 tls_cert: str | None = None, tls_key: str | None = None):
        self.app = app
        self.httpd = ThreadingHTTPServer((host, port), make_handler(app))
        if tls_cert:
            # real TLS (the reference's llama_tls_context only stores paths,
            # src/llama-security.h:225-262)
            import ssl

            sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            sctx.load_cert_chain(tls_cert, tls_key or tls_cert)
            self.httpd.socket = sctx.wrap_socket(self.httpd.socket,
                                                 server_side=True)
        self.tls = bool(tls_cert)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self):
        if hasattr(self.app, "engine"):
            self.app.engine.start()
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self):
        self.httpd.shutdown()
        if hasattr(self.app, "engine"):
            self.app.engine.stop()
        elif hasattr(self.app, "_apps"):  # router: stop every child engine
            for child in list(self.app._apps.values()):
                child.engine.stop()

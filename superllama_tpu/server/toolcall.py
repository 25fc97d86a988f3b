"""Tool-call (function calling) support: grammar construction + output parsing.

Counterpart of the reference's common/chat.cpp tool-call machinery
(format-specific grammars + streaming parsers for generic/hermes/llama3/
mistral/deepseek styles; see also common/chat-parser.cpp). The flow:

1. `plan_tools(body, template_text)` inspects the request's `tools` /
   `tool_choice` and the model's chat template to pick a ToolFormat.
2. The plan carries a GBNF grammar (lazy, trigger-activated, unless
   tool_choice=="required") built from the tools' JSON-schema parameters.
3. `parse_tool_calls(plan, text)` splits the generation into plain content +
   OpenAI-style tool_calls entries.
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Any

from ..grammar.json_schema import SchemaConverter

FORMAT_GENERIC = "generic"
FORMAT_HERMES = "hermes"        # <tool_call>{...}</tool_call>
FORMAT_LLAMA3 = "llama3"        # {"name": ..., "parameters": {...}}
FORMAT_MISTRAL = "mistral"      # [TOOL_CALLS][{...}, ...]


@dataclass
class ToolPlan:
    fmt: str
    grammar: str | None = None
    grammar_lazy: bool = True
    triggers: list[str] = field(default_factory=list)
    forced: bool = False            # tool_choice == "required" / named
    tool_names: list[str] = field(default_factory=list)


def _call_schema(tool: dict, args_key: str = "arguments") -> dict:
    fn = tool.get("function", tool)
    params = fn.get("parameters") or {"type": "object"}
    return {
        "type": "object",
        "properties": {"name": {"const": fn["name"]}, args_key: params},
        "required": ["name", args_key],
        "additionalProperties": False,
    }


def _calls_gbnf(tools: list[dict], wrap: str, args_key: str = "arguments") -> str:
    """One grammar whose root matches a tool call in the given wrapping.

    wrap: 'bare' — the JSON call object alone;
          'hermes' — one or more <tool_call>…</tool_call> blocks;
          'mistral' — [TOOL_CALLS] prefix + JSON array of calls.
    """
    any_call = {"anyOf": [_call_schema(t, args_key) for t in tools]}
    conv = SchemaConverter(any_call)
    call_ref = conv.visit(any_call, "toolcall")
    conv._prim("space")
    lines = []
    if wrap == "bare":
        lines.append(f"root ::= {call_ref}")
    elif wrap == "hermes":
        lines.append(
            f'root ::= tcblock+\n'
            f'tcblock ::= "<tool_call>" space {call_ref} "</tool_call>" space')
    elif wrap == "mistral":
        lines.append(
            f'root ::= "[TOOL_CALLS]" space "[" space {call_ref} '
            f'("," space {call_ref})* "]" space')
    for name, body in conv.rules.items():
        lines.append(f"{name} ::= {body}")
    from ..grammar.json_schema import PRIMITIVES
    for prim in sorted(conv._prims):
        lines.append(PRIMITIVES[prim])
    return "\n".join(lines)


def detect_format(template_text: str | None) -> str:
    t = template_text or ""
    if "<tool_call>" in t or "tool_call" in t and "<|im_start|>" in t:
        return FORMAT_HERMES
    if "[TOOL_CALLS]" in t:
        return FORMAT_MISTRAL
    if "<|start_header_id|>" in t or "<|python_tag|>" in t:
        return FORMAT_LLAMA3
    return FORMAT_GENERIC


def plan_tools(body: dict, template_text: str | None = None) -> ToolPlan | None:
    """Build the constrained-decoding plan for a request with tools."""
    tools = body.get("tools") or []
    choice = body.get("tool_choice", "auto")
    if not tools or choice == "none":
        return None
    if isinstance(choice, dict):  # {"type":"function","function":{"name":...}}
        want = choice.get("function", {}).get("name")
        tools = [t for t in tools
                 if (t.get("function", t)).get("name") == want] or tools
        choice = "required"

    fmt = detect_format(template_text)
    names = [(t.get("function", t))["name"] for t in tools]
    plan = ToolPlan(fmt=fmt, tool_names=names, forced=choice == "required")

    if fmt == FORMAT_HERMES:
        plan.grammar = _calls_gbnf(tools, "hermes")
        plan.triggers = [r"<tool_call>"]
    elif fmt == FORMAT_MISTRAL:
        plan.grammar = _calls_gbnf(tools, "mistral")
        plan.triggers = [r"\[TOOL_CALLS\]"]
    elif fmt == FORMAT_LLAMA3:
        plan.grammar = _calls_gbnf(tools, "bare", args_key="parameters")
        plan.triggers = [r'\{\s*"name"\s*:']
    else:  # generic: a bare JSON call object
        plan.grammar = _calls_gbnf(tools, "bare")
        plan.triggers = [r'\{\s*"name"\s*:']
    plan.grammar_lazy = not plan.forced
    return plan


def _mk_call(name: str, args: Any) -> dict:
    return {
        "id": "call_" + uuid.uuid4().hex[:16],
        "type": "function",
        "function": {"name": name,
                     "arguments": json.dumps(args) if not isinstance(args, str) else args},
    }


def _json_objects(text: str) -> list[tuple[Any, int, int]]:
    """All top-level JSON values decodable at '{' or '[' starts."""
    dec = json.JSONDecoder()
    out = []
    i = 0
    while i < len(text):
        if text[i] in "{[":
            try:
                val, end = dec.raw_decode(text, i)
                out.append((val, i, end))
                i = end
                continue
            except json.JSONDecodeError:
                pass
        i += 1
    return out


class StreamingToolCallParser:
    """Incremental stream splitter: content deltas vs tool-call deltas.

    Counterpart of the reference's streaming chat parsers
    (common/chat-parser.cpp + common/json-partial.cpp): feeds of generated
    text pieces are split into

      {"ev": "content",  "text": str}
      {"ev": "tc_start", "index": i, "id": "call_…", "name": str}
      {"ev": "tc_args",  "index": i, "delta": str}   # raw-JSON fragment

    Tool-call syntax never leaks into content events, and content that might
    be the start of a trigger marker is held back until disambiguated.
    ``arguments`` deltas are raw spans of the source buffer (monotonic across
    feeds), so their concatenation is exactly the model's argument JSON.
    """

    def __init__(self, plan: ToolPlan):
        self.plan = plan
        self.buf = ""
        self.pos = 0                 # consumed prefix (emitted or skipped)
        self.mode = "content"        # content | lead | call | close
        self.args_key = ("parameters" if plan.fmt == FORMAT_LLAMA3
                         else "arguments")
        self.index = -1
        self.call_start = 0
        self.name_emitted = False
        self.args_emitted = 0
        self.ids: list[str] = []

    # ------------------------------------------------------------- helpers

    def _lit(self) -> str | None:
        return {"hermes": "<tool_call>", "mistral": "[TOOL_CALLS]"}.get(
            self.plan.fmt)

    def _holdback(self, text: str) -> int:
        """Length of the tail of `text` that could still become a trigger."""
        lit = self._lit()
        if lit is not None:
            for k in range(min(len(lit) - 1, len(text)), 0, -1):
                if lit.startswith(text[-k:]):
                    return k
            return 0
        # generic/llama3: a bare `{ "name" :` object start
        brace = text.rfind("{")
        if brace == -1:
            return 0
        squeezed = "".join(text[brace:].split())
        if '{"name":'.startswith(squeezed) or squeezed.startswith('{"name":'):
            return len(text) - brace
        return 0

    def _events_for_call(self) -> list[dict]:
        """Emit name/args deltas for the call object at self.call_start."""
        from .json_partial import object_items, scan_value, skip_ws

        evs: list[dict] = []
        s = self.buf
        start = skip_ws(s, self.call_start)
        if start >= len(s) or s[start] != "{":
            return evs
        self.call_start = start
        for key, vs, ve, vok in object_items(s, start):
            if key == "name" and not self.name_emitted and vok:
                name = json.loads(s[vs:ve])
                cid = "call_" + uuid.uuid4().hex[:16]
                self.ids.append(cid)
                evs.append({"ev": "tc_start", "index": self.index,
                            "id": cid, "name": name})
                self.name_emitted = True
            elif key == self.args_key and self.name_emitted:
                raw = s[vs:ve]
                if len(raw) > self.args_emitted:
                    evs.append({"ev": "tc_args", "index": self.index,
                                "delta": raw[self.args_emitted:]})
                    self.args_emitted = len(raw)
        end, complete = scan_value(s, start)
        if complete:
            self.pos = end
            self.mode = "close"
        return evs

    # --------------------------------------------------------------- feeds

    def feed(self, piece: str) -> list[dict]:
        self.buf += piece
        evs: list[dict] = []
        from .json_partial import skip_ws

        progressing = True
        while progressing:
            progressing = False
            s, p = self.buf, self.pos
            if self.mode == "content":
                lit = self._lit()
                pending = s[p:]
                hit = pending.find(lit) if lit else self._generic_hit(pending)
                if hit >= 0:
                    if pending[:hit]:
                        evs.append({"ev": "content", "text": pending[:hit]})
                    self.pos = p + hit
                    self.mode = "lead"
                    progressing = True
                else:
                    keep = self._holdback(pending)
                    emit = pending[: len(pending) - keep]
                    if emit:
                        evs.append({"ev": "content", "text": emit})
                        self.pos = p + len(emit)
            elif self.mode == "lead":
                lit = self._lit()
                if lit:
                    if len(s) - p < len(lit):
                        break
                    p += len(lit)
                j = skip_ws(s, p)
                if self.plan.fmt == FORMAT_MISTRAL:
                    if j < len(s) and s[j] == "[":
                        j = skip_ws(s, j + 1)
                    elif j >= len(s):
                        break
                if j < len(s) and s[j] == "{":
                    self.index += 1
                    self.call_start = j
                    self.name_emitted = False
                    self.args_emitted = 0
                    self.mode = "call"
                    self.pos = j
                    progressing = True
                elif j < len(s):
                    # false trigger (e.g. bare '{' that never forms a call):
                    # emit the lead verbatim as content
                    self.mode = "content"
                    evs.append({"ev": "content", "text": s[self.pos:j or None]})
                    self.pos = max(j, self.pos + 1)
                    progressing = True
            elif self.mode == "call":
                got = self._events_for_call()
                evs.extend(got)
                progressing = self.mode == "close"
            elif self.mode == "close":
                j = skip_ws(s, p)
                if self.plan.fmt == FORMAT_HERMES:
                    tail = "</tool_call>"
                    if s.startswith(tail, j):
                        self.pos = j + len(tail)
                        self.mode = "content"
                        progressing = True
                    elif len(s) - j >= len(tail) or not tail.startswith(
                            s[j:j + len(tail)]):
                        self.mode = "content"  # malformed close; move on
                        progressing = True
                elif self.plan.fmt == FORMAT_MISTRAL:
                    if j < len(s) and s[j] == ",":
                        k = skip_ws(s, j + 1)
                        if k < len(s) and s[k] == "{":
                            self.index += 1
                            self.call_start = k
                            self.name_emitted = False
                            self.args_emitted = 0
                            self.mode = "call"
                            self.pos = k
                            progressing = True
                    elif j < len(s) and s[j] == "]":
                        self.pos = j + 1
                        self.mode = "content"
                        progressing = True
                    elif j < len(s):
                        self.mode = "content"
                        progressing = True
                else:
                    self.mode = "content"
                    progressing = True
        return evs

    def _generic_hit(self, pending: str) -> int:
        m = re.search(r'\{\s*"name"\s*:', pending)
        return m.start() if m else -1

    def finish(self) -> list[dict]:
        """Flush: held-back content, and any still-open call's raw args."""
        evs: list[dict] = []
        if self.mode == "call":
            evs.extend(self._events_for_call())
            if self.mode == "call" and self.name_emitted:
                # stream whatever raw args text exists past the last span end
                from .json_partial import object_items
                for key, vs, ve, _ in object_items(self.buf, self.call_start):
                    if key == self.args_key and ve - vs > self.args_emitted:
                        evs.append({"ev": "tc_args", "index": self.index,
                                    "delta": self.buf[vs + self.args_emitted:ve]})
                        self.args_emitted = ve - vs
            self.pos = len(self.buf)
        if self.mode == "content" and self.pos < len(self.buf):
            evs.append({"ev": "content", "text": self.buf[self.pos:]})
            self.pos = len(self.buf)
        return evs


def parse_tool_calls(plan: ToolPlan, text: str) -> tuple[str, list[dict]]:
    """Split generated text into (content, tool_calls)."""
    calls: list[dict] = []
    content = text

    if plan.fmt == FORMAT_HERMES:
        spans = []
        for m in re.finditer(r"<tool_call>\s*(.*?)\s*(</tool_call>|$)", text, re.S):
            try:
                obj = json.loads(m.group(1))
                calls.append(_mk_call(obj["name"], obj.get("arguments", {})))
                spans.append((m.start(), m.end()))
            except (json.JSONDecodeError, KeyError):
                continue
        for s, e in reversed(spans):
            content = content[:s] + content[e:]
    elif plan.fmt == FORMAT_MISTRAL:
        m = re.search(r"\[TOOL_CALLS\]\s*", text)
        if m:
            for val, _, _ in _json_objects(text[m.end():]):
                items = val if isinstance(val, list) else [val]
                for it in items:
                    if isinstance(it, dict) and "name" in it:
                        calls.append(_mk_call(it["name"], it.get("arguments", {})))
                break
            content = text[:m.start()]
    else:  # llama3 + generic: bare JSON object(s) with name/arguments|parameters
        args_key = "parameters" if plan.fmt == FORMAT_LLAMA3 else "arguments"
        spans = []
        for val, s, e in _json_objects(text):
            items = val if isinstance(val, list) else [val]
            got = False
            for it in items:
                if isinstance(it, dict) and "name" in it and \
                        (args_key in it or "arguments" in it):
                    calls.append(_mk_call(
                        it["name"], it.get(args_key, it.get("arguments", {}))))
                    got = True
            if got:
                spans.append((s, e))
        for s, e in reversed(spans):
            content = content[:s] + content[e:]

    return content.strip(), calls

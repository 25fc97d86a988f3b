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

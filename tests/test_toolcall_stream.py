"""Streaming tool-call parsing (common/chat-parser.cpp + json-partial.cpp
counterparts): partial-JSON scanning primitives and the incremental
content-vs-tool-call stream splitter, fed at several chunk granularities."""

import json

import pytest

from superllama_tpu.server.json_partial import (object_items, parse_partial,
                                                scan_value)
from superllama_tpu.server.toolcall import (StreamingToolCallParser,
                                            parse_tool_calls, plan_tools)

# ------------------------------------------------------------ json_partial


@pytest.mark.parametrize("doc,want_complete", [
    ('{"a": 1}', True),
    ('{"a": 1', False),
    ('{"a": "x', False),
    ('[1, 2, 3]', True),
    ('[1, 2,', False),
    ('"hello"', True),
    ('"hel', False),
    ('tru', False),
    ('true', True),
    ('12.5e3', False),       # a number at EOF could still grow
    ('12.5 ', True),
])
def test_scan_value_completeness(doc, want_complete):
    end, complete = scan_value(doc, 0)
    assert complete == want_complete
    if complete:
        json.loads(doc[:end])


@pytest.mark.parametrize("doc,want", [
    ('{"a": 1, "b": "x"}', {"a": 1, "b": "x"}),
    ('{"a": 1, "b": "x', {"a": 1, "b": "x"}),
    ('{"a": {"c": [1, 2', {"a": {"c": [1, 2]}}),
    ('{"a": "he\\nl', {"a": "he\nl"}),
    ('{"a": "x\\\\', {"a": "x\\"}),    # dangling escape dropped then healed
    ('[{"k": 1}, {"k": 2', [{"k": 1}, {"k": 2}]),
    ('{"name": "get', {"name": "get"}),
])
def test_parse_partial_heals(doc, want):
    val, _, complete = parse_partial(doc)
    assert val == want
    assert not complete or json.loads(doc) == want


def test_object_items_spans():
    doc = '{"name": "f", "arguments": {"x": [1, 2'
    items = {k: (vs, ve, ok) for k, vs, ve, ok in object_items(doc, 0)}
    assert json.loads(doc[slice(*items["name"][:2])]) == "f"
    vs, ve, ok = items["arguments"]
    assert not ok and doc[vs:ve] == '{"x": [1, 2'


# ------------------------------------------------------ streaming splitter

TOOLS = [{"type": "function",
          "function": {"name": "get_weather",
                       "parameters": {"type": "object",
                                      "properties": {"city": {"type": "string"}},
                                      "required": ["city"]}}},
         {"type": "function",
          "function": {"name": "add",
                       "parameters": {"type": "object",
                                      "properties": {"a": {"type": "number"},
                                                     "b": {"type": "number"}}}}}]

HERMES_TMPL = "<|im_start|>{{ messages }}<tool_call></tool_call>"
MISTRAL_TMPL = "[TOOL_CALLS]{{ messages }}"
GENERIC_TMPL = "{{ messages }}"

CASES = [
    # (template, generated text, expected content, expected calls)
    (HERMES_TMPL,
     'Let me check. <tool_call>{"name": "get_weather", "arguments": '
     '{"city": "Par\\"is"}}</tool_call> done',
     "Let me check.  done",
     [("get_weather", {"city": 'Par"is'})]),
    (HERMES_TMPL,
     '<tool_call>{"name": "add", "arguments": {"a": 1, "b": 2.5}}</tool_call>'
     '<tool_call>{"name": "get_weather", "arguments": {"city": "Oslo"}}'
     "</tool_call>",
     "",
     [("add", {"a": 1, "b": 2.5}), ("get_weather", {"city": "Oslo"})]),
    (MISTRAL_TMPL,
     'Sure. [TOOL_CALLS][{"name": "add", "arguments": {"a": 3, "b": 4}}, '
     '{"name": "get_weather", "arguments": {"city": "Rome"}}]',
     "Sure.",
     [("add", {"a": 3, "b": 4}), ("get_weather", {"city": "Rome"})]),
    (GENERIC_TMPL,
     '{"name": "get_weather", "arguments": {"city": "Lima"}}',
     "",
     [("get_weather", {"city": "Lima"})]),
]


def _run_stream(template, text, chunk):
    plan = plan_tools({"tools": TOOLS}, template)
    p = StreamingToolCallParser(plan)
    evs = []
    for i in range(0, len(text), chunk):
        evs += p.feed(text[i:i + chunk])
    evs += p.finish()
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    calls: dict[int, dict] = {}
    for e in evs:
        if e["ev"] == "tc_start":
            assert e["index"] not in calls, "duplicate tc_start"
            calls[e["index"]] = {"name": e["name"], "args": ""}
        elif e["ev"] == "tc_args":
            calls[e["index"]]["args"] += e["delta"]
    assert sorted(calls) == list(range(len(calls))), "indices contiguous"
    return content, [calls[i] for i in sorted(calls)], plan


@pytest.mark.parametrize("chunk", [1, 3, 7, 4096], ids=lambda c: f"chunk{c}")
@pytest.mark.parametrize("case", CASES, ids=["hermes", "hermes2", "mistral",
                                             "generic"])
def test_stream_matches_batch(case, chunk):
    template, text, want_content, want_calls = case
    content, calls, plan = _run_stream(template, text, chunk)
    assert content.strip() == want_content
    assert [c["name"] for c in calls] == [n for n, _ in want_calls]
    for got, (_, want_args) in zip(calls, want_calls):
        assert json.loads(got["args"]) == want_args
    # batch parser agrees on the final text
    bcontent, bcalls = parse_tool_calls(plan, text)
    assert [c["function"]["name"] for c in bcalls] == [n for n, _ in want_calls]


@pytest.mark.parametrize("chunk", [1, 5])
def test_stream_no_syntax_leak(chunk):
    text = ('thinking <tool_call>{"name": "add", "arguments": {"a": 1}}'
            "</tool_call>")
    content, calls, _ = _run_stream(HERMES_TMPL, text, chunk)
    assert "<tool_call>" not in content and "</tool_call>" not in content
    assert "{" not in content
    assert calls[0]["name"] == "add"


def test_stream_truncated_args_flush_on_finish():
    """A stream that ends mid-arguments still surfaces the raw fragment."""
    text = '<tool_call>{"name": "get_weather", "arguments": {"city": "Pa'
    content, calls, _ = _run_stream(HERMES_TMPL, text, 4)
    assert calls[0]["name"] == "get_weather"
    assert calls[0]["args"] == '{"city": "Pa'


def test_stream_false_trigger_brace_is_content():
    """A lone '{' that never becomes a call flows through as content."""
    plan = plan_tools({"tools": TOOLS}, GENERIC_TMPL)
    p = StreamingToolCallParser(plan)
    evs = p.feed("The set {1, 2} has two elements.")
    evs += p.finish()
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    assert content == "The set {1, 2} has two elements."
    assert not [e for e in evs if e["ev"] != "content"]


def test_stream_holdback_then_release():
    """A trigger prefix at the feed boundary is neither leaked nor lost."""
    plan = plan_tools({"tools": TOOLS}, HERMES_TMPL)
    p = StreamingToolCallParser(plan)
    evs = p.feed("hello <tool_")
    content_so_far = "".join(e["text"] for e in evs if e["ev"] == "content")
    assert content_so_far == "hello "          # "<tool_" held back
    evs += p.feed('call>{"name": "add", "arguments": {}}</tool_call>')
    evs += p.finish()
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    assert content == "hello "
    assert [e["name"] for e in evs if e["ev"] == "tc_start"] == ["add"]

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


# ---------------------------------------------------------------- new formats

def _plan(fmt):
    from superllama_tpu.server.toolcall import ToolPlan
    return ToolPlan(fmt=fmt)


def test_parse_deepseek_r1():
    from superllama_tpu.server import toolcall as tc
    text = ("ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>"
            "get_weather\n```json\n{\"city\": \"Paris\"}\n```<｜tool▁call▁end｜>"
            "<｜tool▁calls▁end｜>")
    content, calls = tc.parse_tool_calls(_plan(tc.FORMAT_DEEPSEEK_R1), text)
    assert content == "ok" and len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_parse_command_r7b():
    from superllama_tpu.server import toolcall as tc
    text = ('<|START_ACTION|>[{"tool_call_id": "0", "tool_name": "ping", '
            '"parameters": {"host": "a"}}]<|END_ACTION|>')
    content, calls = tc.parse_tool_calls(_plan(tc.FORMAT_COMMAND_R7B), text)
    assert calls[0]["function"]["name"] == "ping"
    assert json.loads(calls[0]["function"]["arguments"]) == {"host": "a"}


def test_parse_granite_and_nemotron():
    from superllama_tpu.server import toolcall as tc
    c, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_GRANITE),
        'sure<|tool_call|>[{"name": "f", "arguments": {"x": 1}}]')
    assert c == "sure" and calls[0]["function"]["name"] == "f"
    c, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_NEMOTRON_V2),
        '<TOOLCALL>[{"name": "g", "arguments": {}}]</TOOLCALL>')
    assert calls[0]["function"]["name"] == "g"


def test_parse_kimi_k2():
    from superllama_tpu.server import toolcall as tc
    text = ("<|tool_calls_section_begin|><|tool_call_begin|>functions.add:0"
            "<|tool_call_argument_begin|>{\"a\": 1, \"b\": 2}<|tool_call_end|>"
            "<|tool_calls_section_end|>")
    _, calls = tc.parse_tool_calls(_plan(tc.FORMAT_KIMI_K2), text)
    assert calls[0]["function"]["name"] == "add"
    assert json.loads(calls[0]["function"]["arguments"]) == {"a": 1, "b": 2}


def test_parse_gpt_oss_channels():
    from superllama_tpu.server import toolcall as tc
    text = ("<|channel|>analysis<|message|>let me think<|end|>"
            "<|start|>assistant<|channel|>commentary to=functions.run"
            " <|constrain|>json<|message|>{\"cmd\": \"ls\"}<|call|>"
            "<|start|>assistant<|channel|>final<|message|>done")
    content, calls = tc.parse_tool_calls(_plan(tc.FORMAT_GPT_OSS), text)
    assert content == "done"
    assert calls[0]["function"]["name"] == "run"
    assert json.loads(calls[0]["function"]["arguments"]) == {"cmd": "ls"}


def test_parse_glm45_and_qwen3_coder():
    from superllama_tpu.server import toolcall as tc
    c, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_GLM45),
        "<tool_call>search\n<arg_key>q</arg_key>\n<arg_value>cats"
        "</arg_value>\n</tool_call>")
    assert calls[0]["function"]["name"] == "search"
    assert json.loads(calls[0]["function"]["arguments"]) == {"q": "cats"}
    c, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_QWEN3_CODER),
        "<tool_call>\n<function=write>\n<parameter=path>\n/tmp/x\n"
        "</parameter>\n<parameter=n>\n3\n</parameter>\n</function>\n"
        "</tool_call>")
    assert calls[0]["function"]["name"] == "write"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "path": "/tmp/x", "n": 3}


def test_parse_minimax_and_seed():
    from superllama_tpu.server import toolcall as tc
    _, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_MINIMAX_M2),
        '<minimax:tool_call>\n<invoke name="go">\n'
        '<parameter name="dir">up</parameter>\n</invoke>\n'
        "</minimax:tool_call>")
    assert calls[0]["function"]["name"] == "go"
    _, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_SEED_OSS),
        "<seed:tool_call>\n<function=f>\n<parameter=k>v</parameter>\n"
        "</function>\n</seed:tool_call>")
    assert json.loads(calls[0]["function"]["arguments"]) == {"k": "v"}


def test_detect_new_formats():
    from superllama_tpu.server import toolcall as tc
    assert tc.detect_format("...<｜tool▁calls▁begin｜>...") == tc.FORMAT_DEEPSEEK_R1
    assert tc.detect_format("<|END_THINKING|><|START_ACTION|>") == tc.FORMAT_COMMAND_R7B
    assert tc.detect_format("{% elif thinking %}<|tool_call|>") == tc.FORMAT_GRANITE
    assert tc.detect_format("[gMASK]<sop><arg_key><arg_value>") == tc.FORMAT_GLM45
    assert tc.detect_format("<function=..><parameter=..>") == tc.FORMAT_QWEN3_CODER
    assert tc.detect_format("<seed:think>") == tc.FORMAT_SEED_OSS
    assert tc.detect_format("<|tool_calls_section_begin|>") == tc.FORMAT_KIMI_K2
    assert tc.detect_format("<minimax:tool_call>") == tc.FORMAT_MINIMAX_M2
    assert tc.detect_format("<SPECIAL_10>") == tc.FORMAT_NEMOTRON_V2
    assert tc.detect_format("<|channel|>analysis") == tc.FORMAT_GPT_OSS


def test_scoped_streaming_no_syntax_leak():
    from superllama_tpu.server import toolcall as tc
    plan = _plan(tc.FORMAT_NEMOTRON_V2)
    p = tc.StreamingToolCallParser(plan)
    text = ('hello <TOOLCALL>[{"name": "f", "arguments": {"x": 1}}]'
            "</TOOLCALL> bye")
    evs = []
    for i in range(0, len(text), 5):
        evs += p.feed(text[i:i + 5])
    evs += p.finish()
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    assert "TOOLCALL" not in content and "hello" in content and "bye" in content
    starts = [e for e in evs if e["ev"] == "tc_start"]
    args = "".join(e["delta"] for e in evs if e["ev"] == "tc_args")
    assert starts[0]["name"] == "f" and json.loads(args) == {"x": 1}


def test_split_reasoning_and_stream():
    from superllama_tpu.server import toolcall as tc
    r, rest = tc.split_reasoning("<think>plan</think>answer")
    assert r == "plan" and rest == "answer"
    r, rest = tc.split_reasoning("<think>unclosed ...")
    assert r == "unclosed ..." and rest == ""
    r, rest = tc.split_reasoning("no reasoning here")
    assert r == "" and rest == "no reasoning here"
    rs = tc.ReasoningStream()
    evs = []
    for ch in "<think>a b</think>out":
        evs += rs.feed(ch)
    evs += rs.finish()
    assert "".join(t for k, t in evs if k == "reasoning") == "a b"
    assert "".join(t for k, t in evs if k == "content") == "out"


def test_scoped_grammar_builds():
    from superllama_tpu.grammar.gbnf import parse_gbnf
    from superllama_tpu.server import toolcall as tc
    tools = [{"type": "function", "function": {
        "name": "get_weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]}}}]
    for fmt in tc._SCOPED:
        plan = tc.plan_tools({"tools": tools},
                             template_text=None) or None
        g = tc._scoped_gbnf(tools, fmt)
        parse_gbnf(g)   # must parse as valid GBNF


def test_qwen3_coder_streaming():
    from superllama_tpu.server import toolcall as tc
    plan = _plan(tc.FORMAT_QWEN3_CODER)
    p = tc.StreamingToolCallParser(plan)
    text = ("go <tool_call>\n<function=run>\n<parameter=cmd>\nls\n"
            "</parameter>\n</function>\n</tool_call> done")
    evs = []
    for i in range(0, len(text), 7):
        evs += p.feed(text[i:i + 7])
    evs += p.finish()
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    assert "tool_call" not in content and "go" in content and "done" in content
    args = "".join(e["delta"] for e in evs if e["ev"] == "tc_args")
    assert json.loads(args) == {"cmd": "ls"}


def test_gpt_oss_streaming_channels():
    from superllama_tpu.server import toolcall as tc
    plan = _plan(tc.FORMAT_GPT_OSS)
    p = tc.StreamingToolCallParser(plan)
    text = ("<|channel|>analysis<|message|>thinking hard<|end|>"
            "<|start|>assistant<|channel|>commentary to=functions.run"
            " <|constrain|>json<|message|>{\"cmd\": \"ls\"}<|call|>"
            "<|start|>assistant<|channel|>final<|message|>all done")
    evs = []
    for i in range(0, len(text), 6):
        evs += p.feed(text[i:i + 6])
    evs += p.finish()
    reason = "".join(e["text"] for e in evs if e["ev"] == "reasoning")
    content = "".join(e["text"] for e in evs if e["ev"] == "content")
    args = "".join(e["delta"] for e in evs if e["ev"] == "tc_args")
    assert reason == "thinking hard"
    assert content == "all done"
    assert json.loads(args) == {"cmd": "ls"}
    starts = [e for e in evs if e["ev"] == "tc_start"]
    assert starts[0]["name"] == "run"


def test_parse_lfm2_mimo_firefunction_apertus():
    from superllama_tpu.server import toolcall as tc
    _, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_LFM2),
        '<|tool_call_start|>[{"name": "f", "arguments": {"x": 1}}]'
        "<|tool_call_end|>ok")
    assert calls[0]["function"]["name"] == "f"
    c, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_MIMO),
        'pre<tool_calls>[{"name": "g", "arguments": {}}]</tool_calls>')
    assert c == "pre" and calls[0]["function"]["name"] == "g"
    _, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_FIREFUNCTION),
        'sure functools[{"name": "h", "arguments": {"q": "x"}}]')
    assert calls[0]["function"]["name"] == "h"
    _, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_APERTUS),
        '<|tools_prefix|>[{"ping": {"host": "a"}}]<|tools_suffix|>')
    assert calls[0]["function"]["name"] == "ping"
    assert json.loads(calls[0]["function"]["arguments"]) == {"host": "a"}


def test_parse_functionary_v32():
    from superllama_tpu.server import toolcall as tc
    content, calls = tc.parse_tool_calls(
        _plan(tc.FORMAT_FUNCTIONARY_V32),
        'all\nHere you go>>>get_weather\n{"city": "Oslo"}')
    assert content == "Here you go"
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Oslo"}


def test_detect_more_formats():
    from superllama_tpu.server import toolcall as tc
    assert tc.detect_format(
        "List of tools: <|tool_list_start|>[...]<|tool_list_end|>") == tc.FORMAT_LFM2
    assert tc.detect_format("<|tools_prefix|>") == tc.FORMAT_APERTUS
    assert tc.detect_format("<tool_calls>[...]</tool_calls>") == tc.FORMAT_MIMO
    assert tc.detect_format("... >>>all ...") == tc.FORMAT_FUNCTIONARY_V32
    assert tc.detect_format("x functools[ y") == tc.FORMAT_FIREFUNCTION
    # magistral reasoning marks ride the mistral format
    r, rest = tc.split_reasoning("[THINK]deep[/THINK]out")
    assert r == "deep" and rest == "out"


def test_scoped_grammars_build_new():
    from superllama_tpu.grammar.gbnf import parse_gbnf
    from superllama_tpu.server import toolcall as tc
    tools = [{"type": "function", "function": {
        "name": "ping", "parameters": {
            "type": "object", "properties": {"host": {"type": "string"}},
            "required": ["host"]}}}]
    for fmt in (tc.FORMAT_LFM2, tc.FORMAT_APERTUS, tc.FORMAT_MIMO,
                tc.FORMAT_FUNCTIONARY_V32, tc.FORMAT_FIREFUNCTION):
        parse_gbnf(tc._scoped_gbnf(tools, fmt))


def test_parse_deepseek_v31():
    from superllama_tpu.server import toolcall as tc
    text = ("sure<｜tool▁call▁begin｜>get_time<｜tool▁sep｜>{\"tz\": \"UTC\"}"
            "<｜tool▁call▁end｜>")
    content, calls = tc.parse_tool_calls(_plan(tc.FORMAT_DEEPSEEK_V31), text)
    assert content == "sure" and calls[0]["function"]["name"] == "get_time"
    assert tc.detect_format(
        "x message['prefix'] is defined and message['prefix'] and thinking y"
    ) == tc.FORMAT_DEEPSEEK_V31


def test_thinking_forced_open():
    from superllama_tpu.server import toolcall as tc
    r, rest = tc.split_reasoning("already thinking</think>answer",
                                 forced_open=True)
    assert r == "already thinking" and rest == "answer"
    rs = tc.ReasoningStream(forced_open=True)
    evs = rs.feed("deep stuff</think>ok") + rs.finish()
    assert "".join(t for k, t in evs if k == "reasoning") == "deep stuff"
    assert "".join(t for k, t in evs if k == "content") == "ok"


def test_plan_extra_stops():
    from superllama_tpu.server import toolcall as tc
    tools = [{"type": "function", "function": {
        "name": "f", "parameters": {"type": "object", "properties": {}}}}]
    plan = tc.plan_tools({"tools": tools},
                         template_text="[gMASK]<sop><arg_key><arg_value>")
    assert "<|user|>" in plan.extra_stops

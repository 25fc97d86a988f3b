"""Chat template + tool-call parsing tests (strategy of the reference's
test-chat-template.cpp / test-chat.cpp / test-chat-parser.cpp)."""

import json

import pytest

from superllama_tpu.server.chat import (
    BUILTIN_TEMPLATES,
    ChatTemplate,
    detect_builtin,
)
from superllama_tpu.server.toolcall import (
    FORMAT_GENERIC,
    FORMAT_HERMES,
    FORMAT_LLAMA3,
    FORMAT_MISTRAL,
    ToolPlan,
    parse_tool_calls,
    plan_tools,
)

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


def test_all_builtin_templates_render():
    for name in BUILTIN_TEMPLATES:
        t = ChatTemplate(None, fallback=name)
        out = t.apply(MSGS, add_generation_prompt=True)
        assert "Hi" in out and "Hello!" in out, name


def test_chatml_format_exact():
    t = ChatTemplate(None, fallback="chatml")
    out = t.apply([{"role": "user", "content": "Q"}])
    assert out == "<|im_start|>user\nQ<|im_end|>\n<|im_start|>assistant\n"


def test_llama3_format_exact():
    t = ChatTemplate(None, fallback="llama3")
    out = t.apply([{"role": "user", "content": "Q"}])
    assert out == ("<|start_header_id|>user<|end_header_id|>\n\nQ<|eot_id|>"
                   "<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_detection_by_marker():
    assert detect_builtin("{% if %}<|im_start|>...") == "chatml"
    assert detect_builtin("...<|start_header_id|>...") == "llama3"
    assert detect_builtin("...<<SYS>>...") == "llama2"
    assert detect_builtin("...<start_of_turn>...") == "gemma"
    assert detect_builtin(None) == "chatml"


def test_hf_jinja_template_passthrough():
    """An embedded HF jinja template is used verbatim."""
    src = ("{{ bos_token }}{% for m in messages %}[{{ m.role }}]"
           "{{ m.content }}{% endfor %}")
    t = ChatTemplate(src, bos_token="<s>")
    assert t.apply([{"role": "user", "content": "x"}],
                   add_generation_prompt=False) == "<s>[user]x"


def test_content_parts_flattened():
    t = ChatTemplate(None, fallback="chatml")
    out = t.apply([{"role": "user",
                    "content": [{"type": "text", "text": "a"},
                                {"type": "text", "text": "b"}]}])
    assert "ab" in out


def test_tool_role_rendered():
    # chatml renders role=tool natively (the native pass keeps the original
    # message shape; the tool_response wrapper only applies on fallback)
    t = ChatTemplate(None, fallback="chatml")
    out = t.apply([{"role": "tool", "name": "calc", "content": "42"}])
    assert "42" in out and "tool" in out


# ---------------------------------------------------------------- tool calls

TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get weather",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
            "additionalProperties": False,
        },
    },
}]


def test_plan_format_detection():
    assert plan_tools({"tools": TOOLS}, "...<tool_call>...").fmt == FORMAT_HERMES
    assert plan_tools({"tools": TOOLS}, "...[TOOL_CALLS]...").fmt == FORMAT_MISTRAL
    assert plan_tools({"tools": TOOLS}, "<|start_header_id|>").fmt == FORMAT_LLAMA3
    assert plan_tools({"tools": TOOLS}, "plain").fmt == FORMAT_GENERIC
    assert plan_tools({"tools": TOOLS, "tool_choice": "none"}, "x") is None
    assert plan_tools({}, "x") is None


def test_plan_grammar_parses_and_forced():
    plan = plan_tools({"tools": TOOLS, "tool_choice": "required"}, None)
    assert plan.forced and not plan.grammar_lazy
    from superllama_tpu.grammar import parse_gbnf
    from superllama_tpu.grammar.gbnf import GrammarState
    g = parse_gbnf(plan.grammar)
    st = GrammarState(g)
    ok = st.accept_text('{"name": "get_weather", "arguments": {"city": "Paris"}}')
    assert ok and st.can_terminate
    st2 = GrammarState(g)
    assert not (st2.accept_text('{"name": "bogus", "arguments": {}}')
                and st2.can_terminate)


def test_parse_hermes():
    plan = ToolPlan(fmt=FORMAT_HERMES)
    text = ('Let me check.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    content, calls = parse_tool_calls(plan, text)
    assert content == "Let me check."
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_parse_mistral_array():
    plan = ToolPlan(fmt=FORMAT_MISTRAL)
    text = '[TOOL_CALLS][{"name": "a", "arguments": {"x": 1}}, {"name": "b", "arguments": {}}]'
    content, calls = parse_tool_calls(plan, text)
    assert content == ""
    assert [c["function"]["name"] for c in calls] == ["a", "b"]


def test_parse_llama3_parameters_key():
    plan = ToolPlan(fmt=FORMAT_LLAMA3)
    text = '{"name": "get_weather", "parameters": {"city": "Oslo"}}'
    content, calls = parse_tool_calls(plan, text)
    assert content == ""
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Oslo"}


def test_parse_generic_with_surrounding_text():
    plan = ToolPlan(fmt=FORMAT_GENERIC)
    text = 'Sure: {"name": "get_weather", "arguments": {"city": "Rio"}} done'
    content, calls = parse_tool_calls(plan, text)
    assert calls and calls[0]["function"]["name"] == "get_weather"
    assert "Sure:" in content and "done" in content


def test_parse_no_calls_passthrough():
    plan = ToolPlan(fmt=FORMAT_HERMES)
    content, calls = parse_tool_calls(plan, "Just a normal reply.")
    assert content == "Just a normal reply." and calls == []


def test_named_tool_choice_restricts_grammar():
    tools2 = TOOLS + [{
        "type": "function",
        "function": {"name": "other", "parameters": {"type": "object"}},
    }]
    plan = plan_tools({"tools": tools2,
                       "tool_choice": {"type": "function",
                                       "function": {"name": "other"}}}, None)
    assert plan.forced
    from superllama_tpu.grammar import parse_gbnf
    from superllama_tpu.grammar.gbnf import GrammarState
    st = GrammarState(parse_gbnf(plan.grammar))
    assert not (st.accept_text('{"name": "get_weather", "arguments": {}}')
                and st.can_terminate)


def test_native_tool_message_rendering():
    """Templates that natively render role=tool / message.tool_calls get the
    ORIGINAL shapes (common_chat_templates_apply passes them through); the
    flattening fallback only engages when the template errors."""
    from superllama_tpu.server.chat import ChatTemplate

    tmpl = ChatTemplate(
        "{% for m in messages %}"
        "{% if m.tool_calls %}[CALL {{ m.tool_calls[0].function.name }} "
        "{{ m.tool_calls[0].function.arguments | tojson }}]"
        "{% elif m.role == 'tool' %}[RESULT {{ m.content }}]"
        "{% else %}{{ m.role }}: {{ m.content }}\n{% endif %}{% endfor %}")
    out = tmpl.apply([
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": None, "tool_calls": [
            {"id": "c1", "type": "function",
             "function": {"name": "add", "arguments": '{"a": 1}'}}]},
        {"role": "tool", "tool_call_id": "c1", "content": "2"},
    ], add_generation_prompt=False)
    assert "[CALL add" in out and '"a": 1' in out
    assert "[RESULT 2]" in out


# --------------------------------------------- real-template format detection

_TPL_DIR = "/root/reference/models/templates"


def _tpl(name):
    import os
    p = os.path.join(_TPL_DIR, name)
    if not os.path.exists(p):
        import pytest
        pytest.skip(f"missing template fixture {name}")
    return open(p, encoding="utf-8").read()


def test_detect_real_templates():
    """detect_format against the ecosystem's real embedded templates
    (models/templates/*.jinja — the same fixtures test-chat.cpp uses)."""
    from superllama_tpu.server import toolcall as tc

    expect = {
        "deepseek-ai-DeepSeek-R1-Distill-Qwen-32B.jinja": tc.FORMAT_DEEPSEEK_R1,
        "llama-cpp-deepseek-r1.jinja": tc.FORMAT_DEEPSEEK_R1,
        "CohereForAI-c4ai-command-r7b-12-2024-tool_use.jinja": tc.FORMAT_COMMAND_R7B,
        "ibm-granite-granite-3.3-2B-Instruct.jinja": tc.FORMAT_GRANITE,
        "GLM-4.6.jinja": tc.FORMAT_GLM45,
        "Qwen3-Coder.jinja": tc.FORMAT_QWEN3_CODER,
        "ByteDance-Seed-OSS.jinja": tc.FORMAT_SEED_OSS,
        "Kimi-K2-Thinking.jinja": tc.FORMAT_KIMI_K2,
        "MiniMax-M2.jinja": tc.FORMAT_MINIMAX_M2,
        "NVIDIA-Nemotron-Nano-v2.jinja": tc.FORMAT_NEMOTRON_V2,
        "NousResearch-Hermes-2-Pro-Llama-3-8B-tool_use.jinja": tc.FORMAT_HERMES,
        "Qwen-Qwen2.5-7B-Instruct.jinja": tc.FORMAT_HERMES,
    }
    for name, fmt in expect.items():
        got = tc.detect_format(_tpl(name))
        assert got == fmt, (name, got, fmt)


def test_real_templates_render_tools():
    """Real templates must render a tools conversation without falling back
    (native pass), including an assistant tool_call + tool result turn."""
    from superllama_tpu.server.chat import ChatTemplate

    msgs = [
        {"role": "user", "content": "weather in Paris?"},
        {"role": "assistant", "content": "", "tool_calls": [
            {"id": "call_1", "type": "function",
             "function": {"name": "get_weather",
                          "arguments": '{"city": "Paris"}'}}]},
        {"role": "tool", "tool_call_id": "call_1", "name": "get_weather",
         "content": '{"temp": 21}'},
    ]
    tools = [{"type": "function", "function": {
        "name": "get_weather", "description": "Get weather",
        "parameters": {"type": "object",
                       "properties": {"city": {"type": "string"}},
                       "required": ["city"]}}}]
    for name in ("NousResearch-Hermes-2-Pro-Llama-3-8B-tool_use.jinja",
                 "Qwen-Qwen2.5-7B-Instruct.jinja",
                 "ibm-granite-granite-3.3-2B-Instruct.jinja"):
        t = ChatTemplate(_tpl(name))
        out = t.apply(msgs, add_generation_prompt=True, tools=tools)
        assert "get_weather" in out and "Paris" in out, name

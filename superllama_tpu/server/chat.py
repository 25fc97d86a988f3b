"""Chat template application (counterpart of common/chat.cpp + minja: the GGUF
``tokenizer.chat_template`` jinja string applied to OpenAI-style messages;
built-in fallbacks mirror src/llama-chat.cpp's template zoo for models
without embedded templates)."""

from __future__ import annotations

from typing import Any

import jinja2

_ENV = jinja2.Environment(loader=jinja2.BaseLoader(), keep_trailing_newline=True)
_ENV.globals["raise_exception"] = lambda msg: (_ for _ in ()).throw(jinja2.TemplateError(msg))
_ENV.filters["tojson"] = lambda v, **kw: __import__("json").dumps(v, **kw)

# built-in fallback templates (same formats as src/llama-chat.cpp)
BUILTIN_TEMPLATES = {
    "chatml": (
        "{% for message in messages %}"
        "<|im_start|>{{ message.role }}\n{{ message.content }}<|im_end|>\n"
        "{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
    ),
    "llama2": (
        "{% for message in messages %}"
        "{% if message.role == 'system' %}[INST] <<SYS>>\n{{ message.content }}\n<</SYS>>\n\n"
        "{% elif message.role == 'user' %}{% if loop.first or messages[loop.index0-1].role != 'system' %}[INST] {% endif %}{{ message.content }} [/INST]"
        "{% elif message.role == 'assistant' %} {{ message.content }} </s>"
        "{% endif %}{% endfor %}"
    ),
    "llama3": (
        "{% for message in messages %}"
        "<|start_header_id|>{{ message.role }}<|end_header_id|>\n\n{{ message.content }}<|eot_id|>"
        "{% endfor %}"
        "{% if add_generation_prompt %}<|start_header_id|>assistant<|end_header_id|>\n\n{% endif %}"
    ),
    "gemma": (
        "{% for message in messages %}"
        "<start_of_turn>{{ 'model' if message.role == 'assistant' else 'user' }}\n"
        "{{ message.content }}<end_of_turn>\n{% endfor %}"
        "{% if add_generation_prompt %}<start_of_turn>model\n{% endif %}"
    ),
}


class ChatTemplate:
    def __init__(self, template: str | None = None, fallback: str = "chatml",
                 bos_token: str = "", eos_token: str = ""):
        self.source = template or BUILTIN_TEMPLATES[fallback]
        self._tmpl = _ENV.from_string(self.source)
        self.bos_token = bos_token
        self.eos_token = eos_token

    def apply(self, messages: list[dict[str, Any]],
              add_generation_prompt: bool = True, **extra) -> str:
        return self._tmpl.render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=self.bos_token,
            eos_token=self.eos_token,
            **extra,
        )


def template_for_model(model) -> ChatTemplate:
    """Build a ChatTemplate from a LoadedModel's GGUF metadata."""
    tok = model.tokenizer
    tmpl = model.metadata.get("tokenizer.chat_template")
    bos = eos = ""
    if tok is not None:
        v = tok.vocab
        bos = v.tokens[v.bos_id] if v.bos_id >= 0 else ""
        eos = v.tokens[v.eos_id] if v.eos_id >= 0 else ""
    try:
        return ChatTemplate(tmpl, bos_token=bos, eos_token=eos)
    except jinja2.TemplateError:
        return ChatTemplate(None, bos_token=bos, eos_token=eos)

"""C ABI shim (include/llama.h counterpart): build libsuperllama_capi.so,
drive it through ctypes — C strings in, generated text out."""

import ctypes
import subprocess
import sysconfig
from pathlib import Path

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.tools.convert_hf import convert_state_dict

SRC = Path(__file__).parent.parent / "superllama_tpu" / "native" / "capi.cpp"

torch.manual_seed(51)


@pytest.fixture(scope="module")
def capi(tmp_path_factory):
    so = tmp_path_factory.mktemp("capi") / "libsuperllama_capi.so"
    inc = sysconfig.get_path("include")
    rc = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", str(SRC),
         "-o", str(so), f"-I{inc}"],
        capture_output=True, text=True)
    if rc.returncode != 0:
        pytest.skip(f"capi build failed: {rc.stderr[:400]}")
    lib = ctypes.CDLL(str(so))
    lib.slt_last_error.restype = ctypes.c_char_p
    lib.slt_model_load.restype = ctypes.c_longlong
    lib.slt_model_load.argtypes = [ctypes.c_char_p]
    lib.slt_ctx_new.restype = ctypes.c_longlong
    lib.slt_ctx_new.argtypes = [ctypes.c_longlong, ctypes.c_int, ctypes.c_int]
    lib.slt_tokenize.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.slt_detokenize.argtypes = [ctypes.c_longlong,
                                   ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                                   ctypes.c_char_p, ctypes.c_int]
    lib.slt_generate.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                 ctypes.c_int, ctypes.c_float,
                                 ctypes.c_char_p, ctypes.c_int]
    lib.slt_free.argtypes = [ctypes.c_longlong]
    assert lib.slt_backend_init() == 0, lib.slt_last_error()
    return lib


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    p = tmp_path_factory.mktemp("cm") / "m.gguf"
    convert_state_dict(str(p), cfg, sd, GGMLType.F32, tokenizer_fields=tok)
    return str(p)


def test_c_api_end_to_end(capi, model_path):
    lib = capi
    h = lib.slt_model_load(model_path.encode())
    assert h > 0, lib.slt_last_error()

    ids = (ctypes.c_int * 64)()
    n = lib.slt_tokenize(h, b"Hello world", ids, 64)
    assert n > 0

    buf = ctypes.create_string_buffer(256)
    m = lib.slt_detokenize(h, ids, n, buf, 256)
    assert m > 0 and b"Hello" in buf.value

    ctx = lib.slt_ctx_new(h, 128, 1)
    assert ctx > 0, lib.slt_last_error()
    out = ctypes.create_string_buffer(4096)
    k = lib.slt_generate(ctx, b"Once upon a time", 8, 0.0, out, 4096)
    assert k >= 0, lib.slt_last_error()
    assert len(out.value) > 0

    assert lib.slt_free(ctx) == 0
    assert lib.slt_free(h) == 0


def test_c_api_error_reporting(capi):
    lib = capi
    h = lib.slt_model_load(b"/nonexistent/model.gguf")
    assert h == 0
    assert b"model_load" in lib.slt_last_error()

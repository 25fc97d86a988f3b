"""Real-checkpoint validation harness (tools/validate_real): the staged
one-command BASELINE-config-1 gate, exercised end-to-end on a local tiny
checkpoint + corpus (the TinyLlama/wikitext downloads are env-blocked;
--model/--corpus take local paths by design)."""

import json

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.tools.validate_real import main

torch.manual_seed(17)


def test_validate_real_local(tmp_path, capsys):
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
    tok = {k: v for k, v in r.metadata.items()
           if k.startswith("tokenizer.")}
    r.close()
    mp = tmp_path / "m.gguf"
    convert_state_dict(str(mp), cfg, sd, GGMLType.Q4_0, tokenizer_fields=tok)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("The quick brown fox jumps over the lazy dog. " * 400)

    rc = main(["--model", str(mp), "--corpus", str(corpus),
               "--n-ctx", "128", "--n-chunks", "2", "--greedy-tokens", "8",
               "--cache", str(tmp_path / "cache")])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and report["ok"]
    assert report["ppl"] > 0 and np.isfinite(report["ppl"])
    assert report["greedy_deterministic"]


def test_validate_real_download_error_is_clear(tmp_path):
    """Zero-egress: the failure must name the URLs and the local-path
    escape hatch, not stack-trace into urllib."""
    with pytest.raises(SystemExit) as ei:
        main(["--cache", str(tmp_path), "--n-chunks", "1"])
    msg = str(ei.value)
    assert "--model/--corpus" in msg and "huggingface.co" in msg

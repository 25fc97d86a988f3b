"""End-to-end converter CLI (convert_hf_to_gguf.py counterpart): a saved HF
checkpoint directory (safetensors + tokenizer.json) converts to a GGUF whose
tokenizer round-trips and whose logits match HF."""

import json

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")

from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import main as convert_main


def _make_checkpoint(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(
        ["hello world", "the quick brown fox", "jumps over the lazy dog",
         "pack my box with five dozen liquor jugs"], trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, bos_token="<s>",
                                   eos_token="</s>")
    V = fast.vocab_size
    cfg = LlamaConfig(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, bos_token_id=0, eos_token_id=1,
        architectures=["LlamaForCausalLM"], tie_word_embeddings=False)
    torch.manual_seed(17)
    hf = LlamaForCausalLM(cfg).eval()
    d = tmp_path / "ckpt"
    hf.save_pretrained(d, safe_serialization=True)
    fast.save_pretrained(d)
    return hf, fast, d


def test_cli_end_to_end(tmp_path):
    hf, fast, d = _make_checkpoint(tmp_path)
    out = tmp_path / "model.gguf"
    convert_main([str(d), "--outfile", str(out), "--outtype", "f32"])
    model = load_model(str(out))

    # tokenizer parity with the HF fast tokenizer
    text = "the quick brown fox jumps"
    ours = model.tokenizer.encode(text, add_special=False,
                                  parse_special=True)
    theirs = fast.encode(text, add_special_tokens=False)
    assert ours == theirs, (ours, theirs)
    assert model.tokenizer.decode(ours) == text

    # logits parity
    ids = np.asarray(theirs, np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids[None].astype(np.int64))).logits[0].numpy()
    got = np.asarray(Context(model, n_batch=1, n_ctx=64,
                             kv_dtype=np.float32).forward(ids)[0])
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err


def test_cli_mmproj(tmp_path):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128),
        vision_config=dict(depth=1, embed_dim=64, hidden_size=64, num_heads=4,
                           in_channels=3, patch_size=14, temporal_patch_size=2,
                           spatial_merge_size=2, mlp_ratio=2),
        attn_implementation="eager")
    torch.manual_seed(18)
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    d = tmp_path / "vl"
    hf.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "mmproj.gguf"
    convert_main([str(d), "--outfile", str(out), "--mmproj"])
    from superllama_tpu.models.qwen2vl import params_from_mmproj

    vp = params_from_mmproj(str(out))
    assert len(vp["layers"]) == 1 and vp["hp"]["n_head"] == 4


def test_cli_lora(tmp_path):
    """PEFT adapter dir → adapter GGUF via the lora CLI."""
    rng = np.random.default_rng(3)
    d = tmp_path / "peft"
    d.mkdir()
    (d / "adapter_config.json").write_text(json.dumps({"lora_alpha": 16}))
    sd = {}
    for proj in ("q_proj", "v_proj"):
        sd[f"base_model.model.model.layers.0.self_attn.{proj}.lora_A.weight"] = \
            torch.tensor(rng.normal(0, 0.1, (4, 64)).astype(np.float32))
        sd[f"base_model.model.model.layers.0.self_attn.{proj}.lora_B.weight"] = \
            torch.tensor(rng.normal(0, 0.1, (64, 4)).astype(np.float32))
    from safetensors.torch import save_file
    save_file(sd, str(d / "adapter_model.safetensors"))

    from superllama_tpu.models.lora import load_lora, main as lora_main
    out = tmp_path / "adapter.gguf"
    lora_main([str(d), "--outfile", str(out), "--arch", "qwen2"])
    adapter = load_lora(str(out))
    assert adapter.alpha == 16 and adapter.rank == 4

"""CLI tool tests (llama-cli / llama-quantize / llama-tokenize /
llama-perplexity counterparts) driven through the argparse entry, plus the
memory-telemetry subsystem."""

import json
import sys

import numpy as np
import pytest
import torch

from superllama_tpu.cli import main as cli_main
from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(77)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("cli") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return str(path)


def test_cli_run_greedy(model_path, capsys):
    rc = cli_main(["run", "-m", model_path, "-p", "Hello world", "-n", "6",
                   "--temp", "0", "-c", "128", "--kv-dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert len(out.strip()) > 0


def test_cli_run_sampled_stream(model_path, capsys):
    rc = cli_main(["run", "-m", model_path, "-p", "Hi", "-n", "5",
                   "--temp", "0.8", "--stream", "-c", "128",
                   "--kv-dtype", "float32"])
    assert rc == 0


def test_cli_tokenize(model_path, capsys):
    rc = cli_main(["tokenize", "-m", model_path, "hello world"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) >= 2 and "->" in lines[0]


def test_cli_quantize(model_path, tmp_path, capsys):
    out = tmp_path / "q.gguf"
    rc = cli_main(["quantize", model_path, str(out), "Q8_0"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats.get("Q8_0", 0) > 0
    r = GGUFReader(str(out))
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q8_0
    r.close()


def test_cli_perplexity(model_path, tmp_path, capsys):
    f = tmp_path / "corpus.txt"
    f.write_text("the quick brown fox jumps over the lazy dog " * 40)
    rc = cli_main(["perplexity", "-m", model_path, "-f", str(f),
                   "-c", "64", "--chunks", "2", "--kv-dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PPL" in out


def test_cli_imatrix(model_path, tmp_path, capsys):
    f = tmp_path / "corpus.txt"
    f.write_text("a calibration corpus with some words in it " * 30)
    out = tmp_path / "im.gguf"
    rc = cli_main(["imatrix", "-m", model_path, "-f", str(f),
                   "-o", str(out), "-c", "32", "--chunks", "2"])
    assert rc == 0
    from superllama_tpu.tools.imatrix import load_imatrix
    imx = load_imatrix(str(out))
    assert "blk.0.attn_q.weight" in imx


def test_mem_telemetry():
    from superllama_tpu.server.telemetry import MemTelemetry

    t = MemTelemetry(refresh_s=0.0)
    snap = t.snapshot()
    assert snap["host_total_bytes"] > 0
    assert 0.0 <= snap["host_frac"] <= 1.0
    assert isinstance(t.under_pressure(), bool)
    assert isinstance(t.critical(), bool)
    # thresholds behave
    t2 = MemTelemetry(pressure_threshold=0.0, refresh_s=0.0)
    t2.refresh(force=True)
    if t2._stats.device_limit:
        assert t2.under_pressure()


def test_cli_batched_bench(model_path, capsys):
    rc = cli_main(["batched-bench", "-m", model_path, "--pp", "16", "--tg", "8",
                   "--batch", "1", "2", "-c", "64", "--kv-dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    rows = json.loads(out.strip().splitlines()[-1])
    assert len(rows) == 2
    # tiny-model CPU timings are too noisy for scaling assertions; just
    # require sane positive numbers for every config
    assert all(r["s_tg_tok_s"] > 0 and r["s_pp_tok_s"] > 0 for r in rows)


def test_presets():
    from superllama_tpu.presets import BUILTIN_PRESETS, apply_preset, load_preset

    p = load_preset("creative")
    assert p["temp"] == 1.2
    merged = apply_preset({"temp": 0.5, "top_k": 10}, p, explicit={"temp"})
    assert merged["temp"] == 0.5          # explicit flag wins
    assert merged["top_k"] == 100         # preset fills the rest
    assert "greedy" in BUILTIN_PRESETS


def test_preset_file(tmp_path):
    import json

    from superllama_tpu.presets import load_preset

    f = tmp_path / "p.json"
    f.write_text(json.dumps({"temp": 0.42, "slots": 2}))
    assert load_preset(str(f))["temp"] == 0.42


def test_cli_run_with_preset(model_path, capsys):
    rc = cli_main(["run", "-m", model_path, "-p", "Hello", "-n", "4",
                   "--preset", "greedy", "-c", "128", "--kv-dtype", "float32"])
    assert rc == 0


def test_cli_llama_bench(model_path, capsys):
    """Perf-matrix tool (tools/llama-bench counterpart): md table + json."""
    rc = cli_main(["llama-bench", "-m", model_path, "-p", "8", "-n", "4",
                   "-d", "0,8", "-r", "2", "-c", "64",
                   "--kv-dtype", "float32", "-o", "md"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "| pp8 |" in out and "| tg4 |" in out
    assert "pp8@d8" in out and "tg4@d8" in out

    rc = cli_main(["llama-bench", "-m", model_path, "-p", "8", "-n", "0",
                   "-r", "2", "-c", "64", "--kv-dtype", "float32",
                   "-o", "json"])
    assert rc == 0
    import json as _json

    rows = _json.loads(capsys.readouterr().out)
    assert rows and rows[0]["test"] == "pp8" and rows[0]["avg_ts"] > 0


def test_fit_params_tool(model_path):
    """fit-params (tools/fit-params counterpart): n_ctx fits memory; a
    too-small budget flips to layer-stream residency."""
    from superllama_tpu.tools.fit_params import fit_params

    fr = fit_params(model_path, hbm_bytes=1 << 30)
    assert fr.fits_resident and fr.n_ctx > 512
    tiny_budget = fr.weight_bytes // 2 + (1 << 20)
    fr2 = fit_params(model_path, hbm_bytes=tiny_budget, min_ctx=64)
    assert not fr2.fits_resident
    assert 1 <= fr2.n_resident < fr.n_resident


def test_gguf_dump_tool(model_path, capsys):
    rc = cli_main(["gguf-dump", model_path, "--no-tensors"])
    out = capsys.readouterr().out
    assert rc == 0 and "architecture: llama" in out

    rc = cli_main(["gguf-dump", model_path])
    out = capsys.readouterr().out
    assert "blk.0.attn_q.weight" in out


def test_logger_ring_and_levels(capsys):
    from superllama_tpu.utils.log import Logger

    lg = Logger(level="warn", color=False)
    lg.debug("hidden %d", 1)
    lg.info("hidden too")
    lg.warn("visible %s", "warning")
    lg.error("boom")
    err = capsys.readouterr().err
    assert "visible warning" in err and "boom" in err and "hidden" not in err
    assert len(lg.tail()) == 2
    lg.set_level("debug")
    lg.debug("now shown")
    assert "now shown" in lg.tail(1)[0]

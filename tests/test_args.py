"""Declarative option table (common/arg.cpp counterpart): env-var mirrors,
tool masks, sampler-kwargs mapping, and coverage breadth."""

import argparse

from superllama_tpu.args import (ALL, OPTIONS, add_options,
                                 sampling_from_args)


def test_table_integrity():
    dests = [o.dest_name for o in OPTIONS]
    assert len(dests) == len(set(dests)), "duplicate dests"
    assert all(o.help for o in OPTIONS)
    envs = [o.env_name for o in OPTIONS]
    assert len(envs) == len(set(envs)), "duplicate env names"
    assert len(OPTIONS) >= 60       # breadth floor; the surface keeps growing


def test_env_mirror_precedence(monkeypatch):
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "4096")
    monkeypatch.setenv("LLAMA_ARG_HOST", "0.0.0.0")
    p = argparse.ArgumentParser()
    add_options(p, "serve")
    args = p.parse_args([])
    assert args.ctx_size == 4096            # env beats declared default
    assert args.host == "0.0.0.0"
    args = p.parse_args([])
    p2 = argparse.ArgumentParser()
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "4096")
    add_options(p2, "serve")
    args2 = p2.parse_args(["-c", "128"])    # flag beats env
    assert args2.ctx_size == 128


def test_bool_env(monkeypatch):
    monkeypatch.setenv("LLAMA_ARG_FLASH_ATTN", "off")
    p = argparse.ArgumentParser()
    add_options(p, "run")
    assert p.parse_args([]).flash_attn == "off"
    monkeypatch.setenv("LLAMA_ARG_KEEP_QUANTIZED", "1")
    p2 = argparse.ArgumentParser()
    add_options(p2, "run")
    assert p2.parse_args([]).keep_quantized is True


def test_tool_masks():
    p_run = argparse.ArgumentParser()
    add_options(p_run, "run")
    p_srv = argparse.ArgumentParser()
    add_options(p_srv, "serve")
    run_args = vars(p_run.parse_args(["-m", "x"]))
    srv_args = vars(p_srv.parse_args(["-m", "x"]))
    assert "temp" in run_args and "host" not in run_args
    assert "host" in srv_args and "port" in srv_args
    # shared core options appear in both
    for k in ("model", "ctx_size", "kv_dtype"):
        assert k in run_args and k in srv_args


def test_sampling_kwargs_feed_make_chain():
    from superllama_tpu.runtime.sampling import make_chain

    p = argparse.ArgumentParser()
    add_options(p, "run")
    args = p.parse_args([
        "-m", "x", "--temp", "0.7", "--top-k", "20", "--min-p", "0.1",
        "--mirostat", "2", "--mirostat-ent", "4.0", "--repeat-penalty",
        "1.1", "--dry-multiplier", "0.5", "--xtc-probability", "0.2",
        "-l", "17+2.5", "-l", "42-1.0",
    ])
    kw = sampling_from_args(args)
    assert kw["temp"] == 0.7 and kw["top_k"] == 20 and kw["mirostat"] == 2
    assert kw["penalty_repeat"] == 1.1 and kw["dry_multiplier"] == 0.5
    assert kw["logit_bias"] == {17: 2.5, 42: -1.0}
    chain = make_chain(n_vocab=128, **kw)    # every kwarg is accepted
    assert chain is not None


def test_every_generation_sampler_flag_maps():
    """Every make_chain kwarg (except n_vocab/greedy/logit_bias) has a CLI
    flag — the full sampler surface is reachable from the command line."""
    import inspect

    from superllama_tpu.runtime.sampling import make_chain

    p = argparse.ArgumentParser()
    add_options(p, "run")
    args = p.parse_args(["-m", "x"])
    kw = sampling_from_args(args)
    sig = set(inspect.signature(make_chain).parameters)
    missing = sig - set(kw) - {"n_vocab", "greedy", "logit_bias"}
    assert not missing, f"make_chain kwargs without CLI flags: {missing}"

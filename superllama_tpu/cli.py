"""Command-line tools — counterparts of the reference's user binaries
(tools/cli, tools/server, tools/llama-bench, tools/quantize, tools/imatrix,
tools/perplexity, tools/tokenize; flag spirit of common/arg.cpp).

Usage:  python -m superllama_tpu <command> [options]

Commands:
  run         generate text from a prompt (llama-cli / llama-completion)
  serve       HTTP server with OpenAI/Anthropic APIs (llama-server)
  bench       prefill/decode throughput matrix (llama-bench)
  quantize    GGUF → GGUF re-quantization (llama-quantize)
  imatrix     importance-matrix collection (llama-imatrix)
  perplexity  wikitext-style PPL / KL-divergence (llama-perplexity)
  tokenize    tokenizer inspection (llama-tokenize)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("-m", "--model", required=True, help="GGUF model path")
    p.add_argument("-c", "--ctx-size", type=int, default=2048)
    p.add_argument("--keep-quantized", action="store_true",
                   help="keep repackable weights packed (fused dequant matmul)")
    p.add_argument("--kv-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--lora", action="append", metavar="FILE[:SCALE]",
                   help="apply a LoRA adapter (repeatable)")
    p.add_argument("--control-vector", action="append", metavar="FILE[:SCALE]",
                   help="apply a control vector (repeatable)")


def _file_scale(spec: str) -> tuple[str, float]:
    if ":" in spec and not spec.rsplit(":", 1)[0].endswith(("/", "\\")):
        path, s = spec.rsplit(":", 1)
        try:
            return path, float(s)
        except ValueError:
            pass
    return spec, 1.0


def _load(args):
    import jax.numpy as jnp

    from .models import load_model

    if not getattr(args, "model", None) and (
            getattr(args, "model_url", None)
            or getattr(args, "hf_repo", None)):
        # -mu URL / -hf user/model[:QUANT] → cached download (the
        # common/download.cpp flow; clear error where egress is absent)
        from .tools.download import DownloadError, fetch_model

        try:
            args.model = fetch_model(
                model_url=getattr(args, "model_url", None),
                hf_repo=getattr(args, "hf_repo", None),
                hf_file=getattr(args, "hf_file", None),
                token=getattr(args, "hf_token", None))
        except DownloadError as e:
            print(f"error: {e}", file=sys.stderr)
            raise SystemExit(2) from e
    if not getattr(args, "model", None):
        print("error: -m/--model is required (or set LLAMA_ARG_MODEL)",
              file=sys.stderr)
        raise SystemExit(2)
    t0 = time.perf_counter()
    model = load_model(args.model, keep_quantized=args.keep_quantized)
    for spec in getattr(args, "lora", None) or []:
        from .models.lora import load_lora, merge_lora

        path, scale = _file_scale(spec)
        model.params = merge_lora(model.params, load_lora(path), scale)
        print(f"applied lora {path} x{scale}", file=sys.stderr)
    for spec in getattr(args, "control_vector", None) or []:
        import numpy as _np

        from .models.cvector import load_control_vector

        path, scale = _file_scale(spec)
        cv = load_control_vector(path, model.hparams.n_layer,
                                 model.hparams.n_embd, scale)
        prev = model.params.get("cvec")
        model.params["cvec"] = cv if prev is None else prev + cv
        print(f"applied control vector {path} x{scale}", file=sys.stderr)
    print(f"loaded {args.model} [{model.hparams.arch}] "
          f"in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    kvd = (args.kv_dtype if args.kv_dtype in ("q8_0", "q4_0")
           else getattr(jnp, args.kv_dtype))
    return model, kvd


def cmd_run(args):
    from .runtime.decode_loop import DecodeLoop
    from .runtime.engine import Engine, GenRequest
    from .utils import profiler

    trace_dir = getattr(args, "profile_dir", None)
    if trace_dir:
        # whole-run device trace (jax.profiler / XProf; SURVEY §5.1)
        args.profile_dir = None
        with profiler.device_trace(trace_dir):
            rc = cmd_run(args)
        print(f"[device trace written; view: tensorboard --logdir {trace_dir}]")
        return rc

    if args.preset:
        from .presets import apply_preset, load_preset

        merged = apply_preset(
            {"temp": args.temp, "top_k": args.top_k, "top_p": args.top_p},
            load_preset(args.preset))
        args.temp = merged.get("temp", args.temp)
        args.top_k = merged.get("top_k", args.top_k)
        args.top_p = merged.get("top_p", args.top_p)
    model, kvd = _load(args)
    tok = model.tokenizer
    ids = tok.encode(args.prompt, add_special=True, parse_special=True)
    if args.temp <= 0 and not args.stream:
        loop = DecodeLoop(model, n_ctx=args.ctx_size, kv_dtype=kvd, temp=0.0)
        out = loop.generate(ids, args.n_predict, seed=args.seed)
        print(tok.decode(out[len(ids):]))
        return 0
    from .args import sampling_from_args

    grammar = getattr(args, "grammar", None)
    if getattr(args, "grammar_file", None):
        grammar = open(args.grammar_file).read()
    if getattr(args, "json_schema", None):
        from .grammar.json_schema import json_schema_to_gbnf

        grammar = json_schema_to_gbnf(json.loads(args.json_schema))
    eng = Engine(model, n_slots=1, n_ctx=args.ctx_size, kv_dtype=kvd)
    req = GenRequest(
        prompt_ids=ids, max_tokens=args.n_predict,
        sampling=sampling_from_args(args),
        grammar=grammar,
        stop_eog=not getattr(args, "ignore_eos", False),
        stream=(lambda t, piece: print(piece, end="", flush=True))
        if args.stream else None,
    )
    eng.submit(req)
    eng.run_until_drained()
    res = req.result()
    if not args.stream:
        print(res["text"])
    else:
        print()
    print(f"[{res['n_generated']} tokens, ttft {res['ttft_s']*1e3:.0f} ms, "
          f"{res['n_generated']/max(res['total_s']-res['ttft_s'],1e-9):.1f} tok/s]",
          file=sys.stderr)
    return 0


def cmd_serve(args):
    import jax.numpy as jnp

    from .models import load_model
    from .server.http import Server, ServerApp

    model, kvd = _load(args)
    draft = load_model(args.draft_model) if args.draft_model else None
    embed = load_model(args.embed_model) if args.embed_model else None
    keys = dict(kv.split("=", 1) for kv in args.api_key or [])
    app = ServerApp(model, n_slots=args.slots, n_ctx=args.ctx_size,
                    kv_dtype=kvd, api_keys=keys or None,
                    rate_limit_rpm=args.rate_limit,
                    metrics_path=args.metrics_file,
                    draft_model=draft, n_draft=args.draft_n,
                    embed_model=embed, paged=args.paged_kv,
                    page_size=args.kv_page_size, n_pages=args.kv_pages,
                    mmproj_path=(None if getattr(args, "no_mmproj", False)
                                 else getattr(args, "mmproj", None)))
    # register CLI-applied adapters so /lora-adapters can list + rescale
    for spec in getattr(args, "lora", None) or []:
        from .models.lora import load_lora

        path, scale = _file_scale(spec)
        app.loras.append({"path": path, "scale": scale,
                          "adapter": load_lora(path)})
    srv = Server(app, host=args.host, port=args.port,
                 tls_cert=getattr(args, "ssl_cert_file", None),
                 tls_key=getattr(args, "ssl_key_file", None))
    srv.start()
    print(f"listening on http://{args.host}:{srv.port}", file=sys.stderr)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_diffusion(args):
    """Diffusion-LM demasking generation (examples/diffusion counterpart)."""
    from .models.registry import get_forward
    from .runtime.diffusion import DiffusionParams, diffusion_generate

    model, _ = _load(args)
    tok = model.tokenizer
    ids = tok.encode(args.prompt, add_special=True, parse_special=True)
    mask_id = args.mask_token_id
    if mask_id < 0:
        mask_id = int(model.metadata.get("tokenizer.ggml.mask_token_id", -1))
    if mask_id < 0:
        print("error: no mask token (set --mask-token-id)", file=sys.stderr)
        return 1
    dp = DiffusionParams(
        steps=args.steps, max_length=args.max_length, mask_token_id=mask_id,
        algorithm=args.algorithm, schedule=args.schedule,
        temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
        block_length=args.block_length, cfg_scale=args.cfg_scale,
        shift_logits=(model.hparams.arch == "dream"), seed=args.seed)
    out = diffusion_generate(get_forward(model.hparams.arch), model.params,
                             model.hparams, ids, dp,
                             step_callback=(lambda s, n, t: print(
                                 f"\rstep {s}/{n}", end="", file=sys.stderr))
                             if args.progress else None)
    if args.progress:
        print(file=sys.stderr)
    print(tok.decode(out[len(ids):]))
    return 0


def cmd_tts(args):
    """OuteTTS text-to-speech (tools/tts counterpart)."""
    from .models import load_model
    from .tools.tts import save_wav, tts_generate

    ttc = load_model(args.model)
    cts = load_model(args.model_vocoder)
    audio = tts_generate(ttc, cts, args.prompt, n_predict=args.n_predict)
    if audio.size == 0:
        print("error: no audio codes generated", file=sys.stderr)
        return 1
    save_wav(args.output, audio)
    print(f"wrote {args.output} ({audio.size} samples, "
          f"{audio.size/24000:.2f}s)", file=sys.stderr)
    return 0


def cmd_cvector_generator(args):
    """PCA steering directions from +/- prompts (tools/cvector-generator)."""
    from .models import load_model
    from .models.cvector import generate_control_vector, save_control_vector

    model = load_model(args.model)
    pos = [l for l in open(args.positive_file).read().splitlines() if l.strip()]
    neg = [l for l in open(args.negative_file).read().splitlines() if l.strip()]
    n = min(len(pos), len(neg))
    dirs = generate_control_vector(model, pos[:n], neg[:n])
    save_control_vector(args.output, dirs)
    print(f"wrote {args.output} ({dirs.shape[0]} layers)", file=sys.stderr)
    return 0


def cmd_export_lora(args):
    """Merge LoRA adapters into the base model → new GGUF (tools/export-lora)."""
    from .models import load_model
    from .models.lora import load_lora, merge_lora
    from .models.saver import save_model_gguf

    model = load_model(args.model)
    for spec in args.lora or []:
        path, scale = _file_scale(spec)
        model.params = merge_lora(model.params, load_lora(path), scale)
        print(f"merged {path} x{scale}", file=sys.stderr)
    save_model_gguf(model, args.output)
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


def cmd_bench(args):
    import subprocess

    return subprocess.call([sys.executable, "bench.py"])


def cmd_llama_bench(args):
    """Perf matrix (tools/llama-bench counterpart)."""
    from .tools.llama_bench import FORMATTERS, run_bench

    model, kvd = _load(args)
    res = run_bench(
        model,
        pp=[int(x) for x in args.n_prompt.split(",") if int(x) > 0],
        tg=[int(x) for x in args.n_gen.split(",") if int(x) > 0],
        depths=[int(x) for x in args.depth.split(",")],
        reps=args.reps, kv_dtype=kvd)
    print(FORMATTERS[args.output](res))
    return 0


def cmd_batched_bench(args):
    import jax.numpy as jnp

    from .tools.batched_bench import format_table, run_batched_bench

    model, kvd = _load(args)
    configs = []
    for b in args.batch:
        configs.append((args.pp, args.tg, b))
    rows = run_batched_bench(model, configs, kv_dtype=kvd)
    print(format_table(rows))
    print(json.dumps([r.as_dict() for r in rows]))
    return 0


def cmd_quantize(args):
    from .tools.imatrix import load_imatrix
    from .tools.quantize import quantize_model

    imx = load_imatrix(args.imatrix) if args.imatrix else None
    stats = quantize_model(args.input, args.output, args.ftype, imatrix=imx,
                           progress=(lambda name, t: print(f"  {name}: {t}",
                                                           file=sys.stderr))
                           if args.verbose else None)
    print(json.dumps(stats))
    return 0


def cmd_imatrix(args):
    from .models import load_model
    from .tools.imatrix import collect_imatrix, save_imatrix

    model = load_model(args.model)
    text = open(args.file).read()
    ids = model.tokenizer.encode(text, add_special=True)
    n = args.ctx_size
    batches = [ids[i:i + n] for i in range(0, len(ids) - n + 1, n)][: args.chunks]
    imx = collect_imatrix(model, batches, n_ctx=n)
    save_imatrix(args.output, imx, arch=model.hparams.arch)
    print(f"wrote {args.output} ({len(imx)} tensors, {len(batches)} chunks)")
    return 0


def cmd_perplexity(args):
    from .models import load_model
    from .tools.perplexity import (
        compute_perplexity,
        score_hellaswag,
        score_multiple_choice,
        score_winogrande,
    )

    model = load_model(args.model, keep_quantized=args.keep_quantized)
    text = open(args.file).read()
    if args.hellaswag:
        res = score_hellaswag(model, text, args.tasks or None, args.ctx_size)
    elif args.winogrande:
        res = score_winogrande(model, text, args.tasks or None, args.ctx_size)
    elif args.multiple_choice:
        res = score_multiple_choice(model, text, args.tasks or None,
                                    args.ctx_size)
    else:
        ids = model.tokenizer.encode(text, add_special=False)
        if args.chunks:
            ids = ids[: args.chunks * args.ctx_size]
        res = compute_perplexity(model, ids, n_ctx=args.ctx_size)
        print(res)
        return 0
    print(f"{res['task']}: acc = {100.0 * res['acc']:.4f}% "
          f"over {res['n']} tasks")
    return 0


def cmd_gguf_dump(args):
    from .tools.gguf_dump import dump

    print(dump(args.model, show_tensors=not args.no_tensors))
    return 0


def cmd_fit_params(args):
    from .tools.fit_params import main as fp_main

    argv = [args.model, "--hbm-gb", str(args.hbm_gb), "--slots",
            str(args.slots), "--min-ctx", str(args.min_ctx)]
    return fp_main(argv)


def cmd_encrypt(args):
    from .server.security import ModelEncryptor

    enc = ModelEncryptor(args.key)
    if args.decrypt:
        enc.decrypt_file(args.input, args.output)
    else:
        enc.encrypt_file(args.input, args.output)
    print(f"{'decrypted' if args.decrypt else 'encrypted'} -> {args.output}")
    return 0


def cmd_tokenize(args):
    from .models import load_model

    model = load_model(args.model)
    ids = model.tokenizer.encode(args.text, add_special=True, parse_special=True)
    for t in ids:
        piece = model.tokenizer.token_to_piece(t)
        print(f"{t:>8} -> {piece!r}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="superllama_tpu", description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    from .args import add_options

    p = sub.add_parser("run", help="generate text")
    add_options(p, "run")
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("--stream", action="store_true")
    p.add_argument("--profile-dir", help="capture a jax.profiler device "
                   "trace of the run into this directory (XProf/TensorBoard)")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("diffusion", help="diffusion-LM generation (LLaDA/Dream)")
    _add_model_args(p)
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--max-length", type=int, default=128)
    p.add_argument("--mask-token-id", type=int, default=-1)
    p.add_argument("--algorithm", default="confidence",
                   choices=["confidence", "entropy", "margin", "random", "origin"])
    p.add_argument("--schedule", default="timestep", choices=["timestep", "block"])
    p.add_argument("--block-length", type=int, default=32)
    p.add_argument("--cfg-scale", type=float, default=0.0)
    p.add_argument("--temp", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--progress", action="store_true")
    p.set_defaults(fn=cmd_diffusion)

    p = sub.add_parser("serve", help="HTTP server")
    add_options(p, "serve")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("gguf-dump", help="inspect GGUF metadata + tensors")
    p.add_argument("model")
    p.add_argument("--no-tensors", action="store_true")
    p.set_defaults(fn=cmd_gguf_dump)

    p = sub.add_parser("gguf-edit",
                       help="metadata editor / endian converter / hasher "
                            "(gguf-py scripts counterpart)")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=lambda a: __import__(
        "superllama_tpu.tools.gguf_edit", fromlist=["main"]).main(a.rest))

    p = sub.add_parser("fit-params", help="fit n_ctx / layer residency to HBM")
    p.add_argument("model")
    p.add_argument("--hbm-gb", type=float, default=16.0)
    p.add_argument("--slots", type=int, default=1)
    p.add_argument("--min-ctx", type=int, default=512)
    p.set_defaults(fn=cmd_fit_params)

    p = sub.add_parser("encrypt-model", help="AES-256-GCM encrypt/decrypt a GGUF")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--key", required=True, help="32-byte hex key or passphrase")
    p.add_argument("--decrypt", action="store_true")
    p.set_defaults(fn=cmd_encrypt)

    p = sub.add_parser("bench", help="throughput bench")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("llama-bench", help="perf matrix (pp/tg × depth × reps)")
    _add_model_args(p)
    p.add_argument("-p", "--n-prompt", default="512")
    p.add_argument("-n", "--n-gen", default="128")
    p.add_argument("-d", "--depth", default="0")
    p.add_argument("-r", "--reps", type=int, default=3)
    p.add_argument("-o", "--output", default="md",
                   choices=["md", "json", "jsonl", "csv"])
    p.set_defaults(fn=cmd_llama_bench)

    p = sub.add_parser("batched-bench", help="batched decode scaling bench")
    _add_model_args(p)
    p.add_argument("--pp", type=int, default=512)
    p.add_argument("--tg", type=int, default=32)
    p.add_argument("--batch", type=int, nargs="+", default=[1, 4, 8])
    p.set_defaults(fn=cmd_batched_bench)

    p = sub.add_parser("quantize", help="re-quantize a GGUF")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("ftype", nargs="?", default="Q4_K_M")
    p.add_argument("--imatrix", default=None)
    p.add_argument("-v", "--verbose", action="store_true")
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser("imatrix", help="collect importance matrix")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="calibration text")
    p.add_argument("-o", "--output", default="imatrix.gguf")
    p.add_argument("-c", "--ctx-size", type=int, default=512)
    p.add_argument("--chunks", type=int, default=32)
    p.set_defaults(fn=cmd_imatrix)

    p = sub.add_parser("perplexity", help="perplexity over a text file")
    _add_model_args(p)
    p.add_argument("-f", "--file", required=True)
    p.add_argument("--chunks", type=int, default=0)
    p.add_argument("--hellaswag", action="store_true",
                   help="score 6-line hellaswag tasks (acc_norm)")
    p.add_argument("--winogrande", action="store_true",
                   help="score winogrande CSV tasks")
    p.add_argument("--multiple-choice", action="store_true",
                   help="score JSONL multiple-choice tasks (MMLU-style)")
    p.add_argument("--tasks", type=int, default=0, help="max tasks to score")
    p.set_defaults(fn=cmd_perplexity)

    p = sub.add_parser("tts", help="text-to-speech (OuteTTS + WavTokenizer)")
    p.add_argument("-m", "--model", required=True, help="voice LM GGUF")
    p.add_argument("-mv", "--model-vocoder", required=True,
                   help="WavTokenizer decoder GGUF")
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("-n", "--n-predict", type=int, default=1024)
    p.set_defaults(fn=cmd_tts)

    p = sub.add_parser("cvector-generator",
                       help="generate a control vector from +/- prompts")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--positive-file", required=True)
    p.add_argument("--negative-file", required=True)
    p.add_argument("-o", "--output", default="control_vector.gguf")
    p.set_defaults(fn=cmd_cvector_generator)

    p = sub.add_parser("export-lora", help="merge LoRA adapters into a GGUF")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--lora", action="append", metavar="FILE[:SCALE]")
    p.add_argument("-o", "--output", required=True)
    p.set_defaults(fn=cmd_export_lora)

    p = sub.add_parser("tokenize", help="tokenizer inspection")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("text")
    p.set_defaults(fn=cmd_tokenize)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

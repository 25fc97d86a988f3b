"""Pretokenizer chkhsh sync (convert_hf_to_gguf_update.py counterpart):
fingerprint recipe, table regeneration from local checkpoints, and the
converter's chkhsh-first detection path."""

import json
import subprocess
import sys

import pytest

transformers = pytest.importorskip("transformers")

from superllama_tpu.tools.pretok_hashes import CHK_TXT, CHKHSH_TO_PRE
from superllama_tpu.tools.update_pretok_hashes import (chkhsh_of, detect_pre,
                                                       regenerate)


def test_probe_text_matches_reference():
    """CHK_TXT must be byte-identical to the upstream probe or every hash
    in the table is dead."""
    import re

    src = open("/root/reference/convert_hf_to_gguf.py").read()
    m = re.search(r"chktxt = ('.*?')\n", src, re.S)
    assert m and eval(m.group(1)) == CHK_TXT


def test_table_covers_reference_entries():
    import re

    src = open("/root/reference/convert_hf_to_gguf.py").read()
    ref_hashes = set(re.findall(r'if chkhsh == "([0-9a-f]{64})"', src))
    ours = set(CHKHSH_TO_PRE)
    missing = ref_hashes - ours
    assert not missing, f"{len(missing)} upstream hashes missing"
    # every mapped pre-name the runtime must know (spot-check a few)
    pres = {pre for pre, _ in CHKHSH_TO_PRE.values()}
    assert {"llama-bpe", "qwen2", "deepseek-v3", "gpt-2"} <= pres


def _local_bpe_dir(tmp_path, seed_merges):
    """Build a tiny local BPE checkpoint dir (no network)."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {tok: i for i, tok in enumerate(
        [chr(c) for c in range(33, 127)] + ["Ġ", "Ċ", "ĉ", "ĠĠ"]
        + seed_merges)}
    tk = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None,
                              byte_fallback=False))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    d = tmp_path / "ckpt"
    d.mkdir()
    tk.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast"}))
    return d


def test_regenerate_and_detect_roundtrip(tmp_path):
    d = _local_bpe_dir(tmp_path, ["he", "ll"])
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(str(d))
    h = chkhsh_of(tok)
    assert len(h) == 64 and h not in CHKHSH_TO_PRE

    out = tmp_path / "table.py"
    entries = dict(CHKHSH_TO_PRE)
    entries[h] = ("qwen2", str(d))
    regenerate(entries, str(out))
    text = out.read_text()
    assert h in text and "CHK_TXT" in text

    # the CLI merges a new entry and the lookup then resolves the dir
    r = subprocess.run(
        [sys.executable, "-m", "superllama_tpu.tools.update_pretok_hashes",
         f"{d}:qwen2", "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert h[:16] in r.stdout

    # detection through a monkeypatched table
    import superllama_tpu.tools.pretok_hashes as ph
    old = ph.CHKHSH_TO_PRE
    try:
        ph.CHKHSH_TO_PRE = entries
        assert detect_pre(str(d)) == "qwen2"
    finally:
        ph.CHKHSH_TO_PRE = old

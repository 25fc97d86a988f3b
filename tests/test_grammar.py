"""GBNF grammar engine + JSON-schema→GBNF tests.

Mirrors the reference's test strategy for constrained decoding
(tests/test-grammar-parser.cpp, test-grammar-integration.cpp,
test-json-schema-to-grammar.cpp): parse/accept/reject cases, then an
end-to-end property test — grammar-constrained sampling from random logits
must always yield schema-valid JSON.
"""

import json

import numpy as np
import pytest

from superllama_tpu.grammar import json_schema_to_gbnf, parse_gbnf
from superllama_tpu.grammar.gbnf import GrammarState
from superllama_tpu.runtime.sampling import GrammarSampler, SamplerChain, Dist, TopK


def accepts(gbnf: str, text: str) -> bool:
    st = GrammarState(parse_gbnf(gbnf))
    return st.accept_text(text) and st.can_terminate


# ------------------------------------------------------------------ parsing

def test_literal_and_alternates():
    g = 'root ::= "yes" | "no"'
    assert accepts(g, "yes")
    assert accepts(g, "no")
    assert not accepts(g, "maybe")
    assert not accepts(g, "ye")  # prefix but not terminal


def test_char_class_and_ranges():
    g = "root ::= [a-fA-F0-9]"
    for ch in "aF3":
        assert accepts(g, ch)
    assert not accepts(g, "g")


def test_negated_class():
    g = 'root ::= [^"\\n]*'
    assert accepts(g, "hello world")
    assert not accepts(g, 'has"quote')


def test_repetitions():
    assert accepts("root ::= [0-9]+", "123")
    assert not accepts("root ::= [0-9]+", "")
    assert accepts("root ::= [0-9]*", "")
    assert accepts('root ::= "a"?', "")
    assert accepts('root ::= "a"?', "a")
    assert not accepts('root ::= "a"?', "aa")
    g = "root ::= [ab]{2,3}"
    assert not accepts(g, "a")
    assert accepts(g, "ab")
    assert accepts(g, "aba")
    assert not accepts(g, "abab")
    g = "root ::= [x]{2,}"
    assert not accepts(g, "x")
    assert accepts(g, "xxxxx")
    g = "root ::= [x]{3}"
    assert accepts(g, "xxx") and not accepts(g, "xx") and not accepts(g, "xxxx")


def test_grouping_nesting_refs():
    g = """
    root ::= greeting " " name
    greeting ::= ("hi" | "hello")
    name ::= [A-Z] [a-z]+
    """
    assert accepts(g, "hi Bob")
    assert accepts(g, "hello Alice")
    assert not accepts(g, "hey Bob")


def test_recursive_rule_balanced_parens():
    g = """
    root ::= expr
    expr ::= "(" expr ")" | "x"
    """
    assert accepts(g, "x")
    assert accepts(g, "(((x)))")
    assert not accepts(g, "((x)")


def test_escapes_and_any():
    assert accepts('root ::= "\\"" . "\\""', '"z"')
    assert accepts('root ::= "\\u0041"', "A")
    assert accepts('root ::= [\\t\\n ]+', " \t\n")


def test_comments_and_multiline():
    g = """
    # a grammar
    root ::= a   # trailing comment
    a ::= "ok"
        | "fine"
    """
    assert accepts(g, "ok") and accepts(g, "fine")


def test_utf8_multibyte_split_across_tokens():
    g = 'root ::= "é" "x"'
    st = GrammarState(parse_gbnf(g))
    raw = "éx".encode("utf-8")
    assert st.accept_bytes(raw[:1])  # half of the 2-byte é
    assert st.accept_bytes(raw[1:])
    assert st.can_terminate


# ------------------------------------------------------- json schema → gbnf

JSON_GBNF_OK = [
    ({"type": "boolean"}, ["true", "false"], ["yes", "1"]),
    ({"type": "integer"}, ["0", "-5", "123"], ["1.5", "01", "+-"]),
    ({"type": "number"}, ["0", "-1.25", "2e10", "3.5e-2"], ["1.", ".5"]),
    ({"type": "string"}, ['"hi"', '""', '"a\\nb"', '"\\u00e9"'], ['"', "hi"]),
    ({"enum": ["red", "green", 3]}, ['"red"', '"green"', "3"], ['"blue"']),
    ({"const": 42}, ["42"], ["43"]),
    ({"type": "array", "items": {"type": "integer"}},
     ["[]", "[1]", "[1, 2, 3]"], ["[1,]", "[,1]"]),
    ({"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3},
     ["[1, 2]", "[1, 2, 3]"], ["[1]", "[1, 2, 3, 4]"]),
    ({"type": "object", "properties": {"a": {"type": "integer"}},
      "required": ["a"], "additionalProperties": False},
     ['{"a": 1}'], ["{}", '{"b": 1}']),
    ({"type": "object",
      "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
      "required": ["a"], "additionalProperties": False},
     ['{"a": 1}', '{"a": 1, "b": "x"}'], ['{"b": "x"}', '{"a": 1 "b": "x"}']),
    ({"type": "object",
      "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
      "additionalProperties": False},
     ["{}", '{"a": 1}', '{"b": 2}', '{"a": 1, "b": 2}'], ['{"a": 1,}', '{,}']),
    ({"anyOf": [{"type": "integer"}, {"type": "boolean"}]},
     ["5", "true"], ['"x"']),
    ({"type": "string", "minLength": 2, "maxLength": 3},
     ['"ab"', '"abc"'], ['"a"', '"abcd"']),
    ({"type": "string", "format": "uuid"},
     ['"123e4567-e89b-12d3-a456-426614174000"'], ['"nope"']),
    ({"type": "string", "pattern": "^[0-9]{3}-[a-z]+$"},
     ['"123-abc"'], ['"12-abc"', '"123-"']),
    ({"type": "integer", "minimum": 3, "maximum": 7},
     ["3", "5", "7"], ["2", "8"]),
    ({"$defs": {"pt": {"type": "object", "properties": {"x": {"type": "number"}},
                        "required": ["x"], "additionalProperties": False}},
      "type": "array", "items": {"$ref": "#/$defs/pt"}},
     ['[{"x": 1}]', "[]"], ['[{"y": 1}]']),
    ({"type": ["integer", "null"]}, ["3", "null"], ['"x"']),
    ({"prefixItems": [{"type": "integer"}, {"type": "boolean"}]},
     ["[1, true]"], ["[1]", "[true, 1]"]),
]


@pytest.mark.parametrize("schema,good,bad", JSON_GBNF_OK,
                         ids=[str(i) for i in range(len(JSON_GBNF_OK))])
def test_schema_accepts_rejects(schema, good, bad):
    gbnf = json_schema_to_gbnf(schema)
    g = parse_gbnf(gbnf)
    for s in good:
        st = GrammarState(g)
        assert st.accept_text(s) and st.can_terminate, (s, gbnf)
    for s in bad:
        st = GrammarState(g)
        assert not (st.accept_text(s) and st.can_terminate), (s, gbnf)


# --------------------------------------------------- constrained generation


def _byte_vocab():
    """Toy vocab: all printable ASCII bytes + an EOS id."""
    pieces = [bytes([b]) for b in range(32, 127)]
    eos = len(pieces)
    pieces.append(b"")
    return pieces, eos


def test_grammar_sampler_forces_valid_json():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer",
                       "minimum": 0, "maximum": 120}},
        "required": ["name", "age"],
        "additionalProperties": False,
    }
    gbnf = json_schema_to_gbnf(schema)
    pieces, eos = _byte_vocab()
    rng = np.random.default_rng(0)
    for seed in range(3):
        gs = GrammarSampler(gbnf, pieces, {eos})
        chain = SamplerChain([gs, TopK(20), Dist(seed)], seed=seed)
        out = b""
        for _ in range(300):
            logits = rng.normal(size=len(pieces)).astype(np.float32)
            tok = chain.sample(logits)
            if tok == eos:
                break
            out += pieces[tok]
        obj = json.loads(out.decode())
        assert set(obj) == {"name", "age"}
        assert isinstance(obj["name"], str)
        assert 0 <= obj["age"] <= 120


def test_lazy_grammar_waits_for_trigger():
    pieces, eos = _byte_vocab()
    gbnf = 'root ::= "<tool>" [a-z]+ "</tool>"'
    gs = GrammarSampler(gbnf, pieces, {eos}, lazy=True,
                        trigger_patterns=[r"<tool>"])
    # before trigger: unconstrained
    logits = np.zeros(len(pieces), np.float32)
    assert np.isfinite(gs.apply(logits.copy(), None)).all()
    # feed the trigger text token-by-token
    for ch in "<tool>":
        gs.accept(pieces.index(ch.encode()))
    assert gs.active
    out = gs.apply(logits.copy(), None)
    allowed = {pieces[i].decode() for i in np.flatnonzero(np.isfinite(out))}
    assert allowed <= set("abcdefghijklmnopqrstuvwxyz<")


def test_token_level_filtering_multichar_pieces():
    g = parse_gbnf('root ::= "true" | "false"')
    pieces = [b"true", b"false", b"tr", b"ue", b"x", b""]
    eos = 5
    st = GrammarState(g)
    from superllama_tpu.grammar.gbnf import filter_token_ids
    ok = filter_token_ids(st, pieces, range(6), {eos})
    assert set(ok) == {0, 1, 2}  # "true", "false", "tr" all viable prefixes
    st.accept_bytes(b"tr")
    ok = filter_token_ids(st, pieces, range(6), {eos})
    assert set(ok) == {3}  # only "ue" completes
    st.accept_bytes(b"ue")
    ok = filter_token_ids(st, pieces, range(6), {eos})
    assert eos in ok

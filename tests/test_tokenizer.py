"""Tokenizer tests (reference behavior: src/tokenizer.cpp)."""

import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.tokenizer import Tokenizer, split_vocab
from yalm_tpu.utils.testing import synth_checkpoint, synth_vocab, tiny_config


def make_tok(vocab=None, bos=1, eos=2):
    vocab = vocab if vocab is not None else synth_vocab(300)
    return Tokenizer(vocab, bos, eos)


def test_split_vocab_roundtrip():
    vocab = [b"a", b"bc", b"<0x00>", b" d"]
    blob = b"".join(v + b"\0" for v in vocab)
    assert split_vocab(blob) == vocab


def test_greedy_longest_match():
    # vocab contains "ab" and "abc": longest match wins
    tok = make_tok()
    vocab = tok.vocab
    i_abc = vocab.index(b"abc")
    ids = tok.encode("abc")
    assert ids == [i_abc]


def test_byte_fallback():
    tok = make_tok()
    # bytes with no vocab word fall back to <0xNN> tokens
    ids = tok.encode(b"\xf0\x9f\x98\x80")  # emoji, not in toy vocab
    start = tok.byte_fallback_start
    assert ids == [0xF0 + start, 0x9F + start, 0x98 + start, 0x80 + start]
    # decode_one reproduces the raw bytes
    out = b"".join(tok.decode_one(0, t) for t in ids)
    assert out == b"\xf0\x9f\x98\x80"


def test_bos_and_leading_space_strip():
    tok = make_tok()
    ids = tok.encode("hello world", bos=True)
    assert ids[0] == tok.bos_id
    # " world" piece following a non-BOS token keeps its space
    decoded = tok.decode(ids[1:], prev=tok.bos_id)
    assert decoded == b"hello world"
    # a piece starting with ' ' directly after BOS loses the space
    i_world = tok.vocab.index(b" world")
    assert tok.decode_one(tok.bos_id, i_world) == b"world"
    assert tok.decode_one(0, i_world) == b" world"


def test_encode_decode_roundtrip_text():
    tok = make_tok()
    text = "hello world, the pass key is 12345."
    ids = tok.encode(text)
    assert tok.decode(ids, prev=0) == text.encode()


def test_eot_detection():
    vocab = synth_vocab(300)
    vocab[299] = b"<|eot_id|>"
    tok = make_tok(vocab)
    assert tok.eot_id == 299


def test_from_yalm(tmp_path):
    cfg = tiny_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    tok = Tokenizer.from_yalm(read_yalm(path))
    assert tok.bos_id == cfg.bos_token_id and tok.eos_id == cfg.eos_token_id
    assert len(tok.vocab) == cfg.vocab_size
    ids = tok.encode("hello", bos=True)
    assert ids[0] == cfg.bos_token_id


def test_debug_string():
    tok = make_tok()
    s = tok.encoding_to_debug_string([tok.bos_id, tok.vocab.index(b"hello"), tok.eos_id])
    assert s.startswith(f"[<s>:{tok.bos_id}]")
    assert s.endswith(f"[</s>:{tok.eos_id}]")
    assert "[hello:" in s

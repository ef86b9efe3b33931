"""Native C++ layer tests: codec and trie tokenizer parity with pure Python.

The library is built on demand (make -C yalm_tpu/native); tests skip if the
toolchain is unavailable.
"""

import numpy as np
import pytest

from yalm_tpu import native
from yalm_tpu.codec.format import read_yalm, write_yalm
from yalm_tpu.tokenizer import Tokenizer
from yalm_tpu.utils.testing import synth_checkpoint, synth_vocab, tiny_config

pytestmark = pytest.mark.skipif(not native.build(), reason="native toolchain unavailable")


def test_native_loads():
    assert native.loaded()


def test_native_codec_matches_python(tmp_path):
    cfg = tiny_config(weight_dtype="fp16")
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    py = read_yalm(path, native=False)
    nat = read_yalm(path, native=True)
    assert nat.metadata == py.metadata
    assert set(nat.tensors) == set(py.tensors)
    for k in py.tensors:
        a, b = py.tensors[k], nat.tensors[k]
        assert a.dtype == b.dtype and a.shape == b.shape, k
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=k)


def test_native_codec_bad_file(tmp_path):
    p = tmp_path / "bad.yalm"
    p.write_bytes(b"\xff" * 100)
    with pytest.raises(IOError):
        read_yalm(str(p), native=True)
    with pytest.raises(IOError):
        native.NativeCheckpoint(str(tmp_path / "missing.yalm"))


def test_native_trie_matches_python():
    vocab = synth_vocab(300)
    tok_native = Tokenizer(vocab, 1, 2)
    assert tok_native._native is not None
    tok_py = Tokenizer(vocab, 1, 2)
    tok_py._native = None

    cases = [
        "hello world",
        "the pass key is 12345. Remember it.",
        "abc ab abc",
        "",
        "\x00\x07 weird bytes \xff".encode("utf-8", errors="ignore").decode("latin1"),
        "🎉 unicode emoji",
    ]
    for text in cases:
        assert tok_native.encode(text, bos=True) == tok_py.encode(text, bos=True), text


def test_native_trie_long_input_speed():
    vocab = synth_vocab(300)
    tok = Tokenizer(vocab, 1, 2)
    assert tok._native is not None
    text = "the quick brown fox jumps over the lazy dog. " * 2000
    ids = tok.encode(text)
    assert len(ids) > 1000
    # decode round-trips
    assert tok.decode(ids, prev=0).decode() == text


def test_native_fallback_metadata():
    assert native.NativeTrie(b"a\0ab\0<0x00>\0").byte_fallback_start == 2
    assert native.NativeTrie(b"a\0b\0").byte_fallback_start == -1
    assert native.NativeTrie(b"a\0b\0c\0").n_vocab == 3

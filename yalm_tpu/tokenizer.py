"""Trie tokenizer over the packed checkpoint vocabulary.

Python implementation of the reference tokenizer (src/tokenizer.cpp): the
vocab ships inside the checkpoint as one NUL-delimited byte tensor
("tokenizer.tokens", written by the converter); encoding is greedy
longest-prefix match over a byte trie with single-byte fallback to the
<0xNN> tokens; decoding handles sentencepiece's leading-space-after-BOS rule
and byte-fallback pieces. A C++ native version (yalm_tpu/native) accelerates
encode for long prompts; this module is the reference implementation and
fallback.

Unlike the reference (std::string / char), everything here is explicit
`bytes` — exact byte-level parity with no encoding ambiguity.
"""

from __future__ import annotations

import numpy as np

# Tokens that terminate a chat turn; any of these acts as end-of-turn
# (reference src/tokenizer.cpp:22).
_EOT_MARKERS = (b"<|eot_id|>", b"<|end|>", b"<|im_end|>")


def split_vocab(tokens_blob: bytes) -> list[bytes]:
    """Split the packed NUL-delimited vocab tensor into per-token bytes.

    Mirrors the scan in reference src/tokenizer.cpp:10-18: tokens are
    NUL-terminated; the converter replaced any genuine NUL bytes with BEL.
    """
    # The blob ends with a terminator; split drops the trailing empty piece.
    parts = tokens_blob.split(b"\0")
    if parts and parts[-1] == b"":
        parts.pop()
    return parts


class Tokenizer:
    def __init__(self, vocab: list[bytes], bos_id: int, eos_id: int):
        self.vocab = vocab
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.eot_id = -1
        self.byte_fallback_start = -1
        for i, tok in enumerate(vocab):
            if tok == b"<0x00>":
                self.byte_fallback_start = i
            elif tok in _EOT_MARKERS:
                self.eot_id = i

        # byte trie: nested dicts keyed by int byte value; token id under key -1
        self._trie: dict = {}
        for i, word in enumerate(vocab):
            node = self._trie
            for b in word:
                node = node.setdefault(b, {})
            node[-1] = i

        # native C++ trie accelerator (yalm_tpu/native), when built
        self._native = None
        try:
            from . import native as _native_mod
            if _native_mod.loaded():
                blob = b"".join(v + b"\0" for v in vocab)
                self._native = _native_mod.NativeTrie(blob)
        except Exception:
            self._native = None

    @classmethod
    def from_yalm(cls, yf) -> "Tokenizer":
        """Construct from a loaded checkpoint (codec.YalmFile)."""
        blob = np.asarray(yf.tensors["tokenizer.tokens"]).tobytes()
        return cls(split_vocab(blob),
                   bos_id=int(yf.metadata["bos_token_id"]),
                   eos_id=int(yf.metadata["eos_token_id"]))

    def encode(self, text: str | bytes, bos: bool = False) -> list[int]:
        """Greedy longest-prefix-match encoding with byte fallback
        (reference src/tokenizer.cpp:57-94)."""
        data = text.encode("utf-8") if isinstance(text, str) else text
        out: list[int] = []
        if bos:
            out.append(self.bos_id)
        if self._native is not None:
            out.extend(self._native.encode(data))
            return out
        i, n = 0, len(data)
        while i < n:
            node = self._trie
            best_id, best_len = -1, 0
            j = i
            while j < n:
                nxt = node.get(data[j])
                if nxt is None:
                    break
                node = nxt
                j += 1
                tid = node.get(-1)
                if tid is not None:
                    best_id, best_len = tid, j - i
            if best_id < 0:
                if self.byte_fallback_start >= 0:
                    out.append(data[i] + self.byte_fallback_start)
                i += 1  # unencodable byte with no fallback vocab: dropped
            else:
                out.append(best_id)
                i += best_len
        return out

    def decode_one(self, prev_token: int, token: int) -> bytes:
        """Decode one token in context (reference src/tokenizer.cpp:44-55)."""
        piece = self.vocab[token]
        # sentencepiece strips the leading space of the first piece after BOS
        if prev_token == self.bos_id and piece.startswith(b" "):
            return piece[1:]
        if (self.byte_fallback_start >= 0
                and token >= self.byte_fallback_start
                and token - self.byte_fallback_start < 256):
            return bytes([token - self.byte_fallback_start])
        return piece

    def decode(self, tokens: list[int], prev: int | None = None) -> bytes:
        out = []
        p = prev if prev is not None else self.bos_id
        for t in tokens:
            out.append(self.decode_one(p, t))
            p = t
        return b"".join(out)

    def encoding_to_debug_string(self, encoding: list[int]) -> str:
        """[piece:id] rendering for CLI logs (reference src/tokenizer.cpp:96-108)."""
        parts = []
        for tid in encoding:
            if tid == self.bos_id:
                parts.append(f"[<s>:{tid}]")
            elif tid == self.eos_id:
                parts.append(f"[</s>:{tid}]")
            else:
                piece = self.vocab[tid].decode("utf-8", errors="replace")
                parts.append(f"[{piece}:{tid}]")
        return "".join(parts)

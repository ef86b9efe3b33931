"""Generate the vendored tokenizer-fidelity fixtures (run once, outputs
checked in; tests never need the `tokenizers` package).

Two REAL tokenizer.json files produced by HF `tokenizers`:
- llama-style: BPE + byte_fallback + Metaspace (sentencepiece lineage)
- gpt2-style:  BPE + ByteLevel (gpt2 byte-to-unicode table)

plus a golden file of tricky strings with HF's token ids and decoded
bytes. The test (tests/test_tokenizer_fixture.py) asserts:
- the converter's load_tokens parses both real formats byte-correctly
  (gpt2 byte table, ▁->space, added tokens, NUL->BEL packing)
- our trie DECODE of HF's ids reproduces HF's decode byte-exactly
- our trie ENCODE round-trips, and matches HF ids exactly on every case
  where greedy longest-match agrees with BPE (recorded at generation
  time; the reference's trie is greedy, src/tokenizer.cpp:57-94, so
  exact-BPE agreement everywhere is not a property even the reference has)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenizers import Tokenizer, models, pre_tokenizers, trainers, decoders

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

CORPUS = [
    "hello world this is a test of the tokenizer fixture",
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "héllo ünïcode café naïve résumé",
    "日本語のテスト 中文测试 한국어 테스트",
    "emoji test 🙂🚀🔥 done",
    "numbers 0123456789 and punctuation !@#$%^&*()",
    "newlines\nand\ttabs are tricky",
    "spaces  double   triple    quadruple",
] * 50

CASES = [
    "hello world",
    " leading space",
    "trailing space ",
    "héllo ünïcode",
    "日本語テスト",
    "mixed 日本語 and english",
    "emoji 🙂 inline",
    "a\nb\tc",
    "spaces  doubled",
    "<|endoftext|> added token inline",
    "bytes outside vocab: ÿþ",
    "",
    # llama3-regex discriminators: digit-triple chunking, case-insensitive
    # contractions, newline-run handling, punct+newline coalescing
    "numbers 123456 end",
    "IT'S SHOUTING's test",
    "line\r\n\r\nbreaks  mixed",
    "dots...\n\nnext",
]

# Meta's Llama-3 pre-tokenizer regex (public, tiktoken lineage): differs
# from GPT-2's in case-insensitive contractions, an optional non-newline
# prefix before letter runs, 1-3 digit chunks, and newline coalescing.
LLAMA3_PAT = (r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
              r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
              r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+")


def build_llama_style():
    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(prepend_scheme="never")
    tok.decoder = decoders.Metaspace(prepend_scheme="never")
    trainer = trainers.BpeTrainer(
        vocab_size=420,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=[],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    # byte-fallback pieces <0x00>..<0xFF> appended contiguously (the layout
    # our Tokenizer detects via the "<0x00>" piece) + an added token
    fallback = [f"<0x{i:02X}>" for i in range(256)]
    tok.add_tokens(fallback)
    tok.add_special_tokens(["<|endoftext|>"])
    return tok


def build_gpt2_style():
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=640,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    return tok


def build_llama3_style():
    """Llama-3 pipeline: BPE + Sequence[Split(llama3 regex, isolated),
    ByteLevel(use_regex=False)] — the tiktoken-style pre-tokenization Meta
    ships in Llama-3's tokenizer.json."""
    import tokenizers as tklib
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(pattern=tklib.Regex(LLAMA3_PAT),
                             behavior="isolated", invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=640,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    return tok


def greedy_encode(vocab_bytes, data: bytes, byte_fallback_start: int):
    """The reference trie algorithm (yalm_tpu.tokenizer.Tokenizer.encode),
    re-implemented here so the golden records which cases agree with BPE."""
    trie = {}
    for i, w in enumerate(vocab_bytes):
        node = trie
        for b in w:
            node = node.setdefault(b, {})
        node[-1] = i
    out, i, n = [], 0, len(data)
    while i < n:
        node, best_id, best_len, j = trie, -1, 0, i
        while j < n:
            nxt = node.get(data[j])
            if nxt is None:
                break
            node = nxt
            j += 1
            if -1 in node:
                best_id, best_len = node[-1], j - i
        if best_id < 0:
            if byte_fallback_start >= 0:
                out.append(data[i] + byte_fallback_start)
            i += 1
        else:
            out.append(best_id)
            i += best_len
    return out


def main():
    os.makedirs(FIX, exist_ok=True)
    from yalm_tpu.convert import load_tokens
    golden = {}
    for name, builder in (("llama_style", build_llama_style),
                          ("gpt2_style", build_gpt2_style),
                          ("llama3_style", build_llama3_style)):
        tok = builder()
        path = os.path.join(FIX, f"{name}_tokenizer.json")
        tok.save(path, pretty=True)
        vocab_size = tok.get_vocab_size()
        vocab_bytes = load_tokens(path, vocab_size)
        bfs = next((i for i, t in enumerate(vocab_bytes) if t == b"<0x00>"),
                   -1)
        cases = []
        for s in CASES:
            enc = tok.encode(s, add_special_tokens=False)
            hf_ids = list(enc.ids)
            hf_decoded = tok.decode(hf_ids, skip_special_tokens=False)
            ours = greedy_encode(vocab_bytes, s.encode("utf-8"), bfs)
            cases.append({
                "text": s,
                "hf_ids": hf_ids,
                "hf_decoded": hf_decoded,
                "greedy_matches_bpe": ours == hf_ids,
            })
        agree = sum(c["greedy_matches_bpe"] for c in cases)
        print(f"{name}: vocab={vocab_size} byte_fallback_at={bfs} "
              f"greedy==bpe on {agree}/{len(cases)} cases")
        golden[name] = {"vocab_size": vocab_size, "cases": cases}
    with open(os.path.join(FIX, "tokenizer_golden.json"), "w") as f:
        json.dump(golden, f, ensure_ascii=False, indent=1)
    print("fixtures written to", FIX)


if __name__ == "__main__":
    main()

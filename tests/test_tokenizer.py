"""BPE tokenizer oracle tests (VERDICT r3 item 3).

The reference gets byte-level BPE from the `clip` package
(/root/reference/clip_fft.py:150).  The repo reimplements the merge
algorithm (models/clip/tokenizer.py); these tests assert it against an
INDEPENDENT oracle implementation of the same spec (greedy lowest-rank
adjacent-pair merging, left-to-right within a pass) on hand-built and
randomized synthetic merge tables, exercise the APHANTASIA_BPE_PATH
loading path end-to-end, and pin the byte-encoder bijection.  Real-vocab
goldens remain impossible here (zero egress, no clip package / HF cache
on disk — checked), so the synthetic tables are built to exercise every
branch the real vocab would: multi-level merge cascades, rank ties
broken by priority, repeated-character overlap, unknown pairs, and
multi-byte UTF-8 words.
"""
from __future__ import annotations

import gzip
import random

import numpy as np
import pytest

from aphantasia_tpu.models.clip import tokenizer as tk


# ---------------------------------------------------------------- oracle

def oracle_bpe(token: str, ranks: dict) -> str:
    """Independent implementation of OpenAI CLIP's BPE merge loop.

    Spec: the word starts as characters with '</w>' glued to the last;
    repeatedly pick the adjacent pair with the LOWEST rank present in the
    table and, in one left-to-right pass, merge every (non-overlapping)
    occurrence; stop when no adjacent pair is ranked.  Implemented here
    index-wise (scan positions, no word.index) so a bug in the repo's
    find-based walk cannot be mirrored.
    """
    if not token:
        return token
    syms = list(token[:-1]) + [token[-1] + "</w>"]
    if len(syms) == 1:
        return syms[0]
    while True:
        best_rank, best_pair = None, None
        for a, b in set(zip(syms, syms[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms) and syms[i] == best_pair[0]
                    and syms[i + 1] == best_pair[1]):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if len(syms) == 1:
            break
    return " ".join(syms)


def make_merges_file(tmp_path, merges):
    """Write a gzip merges file in the OpenAI layout (header line 0)."""
    path = tmp_path / "bpe_synth.txt.gz"
    lines = ["#version: 0.2 (synthetic test table)"]
    lines += [f"{a} {b}" for a, b in merges]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return str(path)


HAND_MERGES = [
    # cascade: h e -> he ; l l -> ll ; he ll -> hell ; hell o</w> -> hello</w>
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
    # priority trap: ('a','b') outranks ('b','c') — "abc" must become
    # ("ab","c</w>"), never ("a","bc</w>")
    ("a", "b"), ("b", "c"), ("ab", "c</w>"),
    # overlap: aa merging inside "aaa" must pair the LEFT two
    ("a", "a"),
    # end-of-word vs interior are distinct symbols
    ("c", "c</w>"),
]


@pytest.fixture
def synth_tok(tmp_path, monkeypatch):
    path = make_merges_file(tmp_path, HAND_MERGES)
    monkeypatch.setenv("APHANTASIA_BPE_PATH", path)
    tk._tokenizer.cache_clear()
    yield tk._tokenizer()
    tk._tokenizer.cache_clear()


# ------------------------------------------------------------ byte codec

def test_bytes_to_unicode_bijection():
    m = tk.bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable ASCII maps to itself (GPT-2 convention)
    for b in range(ord("!"), ord("~") + 1):
        assert m[b] == chr(b)
    inv = {v: k for k, v in m.items()}
    for text in ["hello", "héllo wörld", "日本語", "a\tb\nc", "\x00\xff"]:
        enc = "".join(m[b] for b in text.encode("utf-8"))
        assert bytes(inv[ch] for ch in enc).decode("utf-8") == text


# ---------------------------------------------------- merge-loop parity

def test_bpe_hand_cases(synth_tok):
    ranks = synth_tok.bpe_ranks
    cases = ["hello", "abc", "aaa", "aaaa", "cc", "accc", "xyz", "h", "he"]
    for word in cases:
        assert synth_tok.bpe(word) == oracle_bpe(word, ranks), word


def test_bpe_priority_over_position(synth_tok):
    # ('a','b') rank 4 < ('b','c') rank 5: greedy-by-rank means "abcx"
    # merges (a,b) first, leaving (b,c) unmatched forever — a rank-blind
    # position-greedy walk would produce "a bc x</w>" instead
    assert synth_tok.bpe("abcx") == "ab c x</w>"
    # with the cascade pair ("ab","c</w>") ranked, "abc" merges fully
    assert synth_tok.bpe("abc") == "abc</w>"
    # repeated chars: left-to-right non-overlapping within the pass
    assert synth_tok.bpe("aaa") == oracle_bpe("aaa", synth_tok.bpe_ranks)


def test_bpe_randomized_against_oracle(tmp_path, monkeypatch):
    """Random merge tables x random words: repo == oracle everywhere."""
    rng = random.Random(1234)
    alphabet = list("abcdef")
    for trial in range(20):
        # grow a random table the way BPE training would: merge results
        # become candidate symbols for later merges (cascades guaranteed)
        symbols = list(alphabet) + [c + "</w>" for c in alphabet]
        merges, seen = [], set()
        for _ in range(30):
            a = rng.choice(symbols)
            b = rng.choice(symbols)
            if a.endswith("</w>") or (a, b) in seen:
                continue
            seen.add((a, b))
            merges.append((a, b))
            symbols.append(a + b)
        (tmp_path / f"t{trial}").mkdir(exist_ok=True)
        path = make_merges_file(tmp_path / f"t{trial}", merges)
        tok = tk.SimpleTokenizer(path)
        for _ in range(40):
            word = "".join(rng.choice(alphabet)
                           for _ in range(rng.randint(1, 12)))
            assert tok.bpe(word) == oracle_bpe(word, tok.bpe_ranks), (
                trial, word, merges)


# ----------------------------------------------- vocab construction path

def test_vocab_layout_matches_openai_convention(synth_tok):
    """encoder ids: 256 byte symbols, then 256 byte+'</w>', then one id per
    merge in file order, then the two specials (the vocab layout real
    checkpoints' embedding rows are keyed to)."""
    enc = synth_tok.encoder
    assert enc["!"] == 0  # first byte symbol
    assert enc["!</w>"] == 256
    n_merge_base = 512
    assert enc["he"] == n_merge_base + 0
    assert enc["ll"] == n_merge_base + 1
    assert enc["hell"] == n_merge_base + 2
    assert enc["hello</w>"] == n_merge_base + 3
    assert enc["<|startoftext|>"] == n_merge_base + len(HAND_MERGES)
    assert enc["<|endoftext|>"] == n_merge_base + len(HAND_MERGES) + 1


def test_tokenize_uses_env_vocab(synth_tok, monkeypatch):
    ids = tk.tokenize("hello hello")[0]
    hid = synth_tok.encoder["hello</w>"]
    assert ids[0] == tk.SOT and ids[3] == tk.EOT
    np.testing.assert_array_equal(ids[1:3], [hid, hid])
    assert (ids[4:] == 0).all()


def test_tokenize_truncation_and_padding(synth_tok):
    long = " ".join(["xyz"] * 100)       # unmerged word -> 4 ids each
    ids = tk.tokenize(long, context_length=16)[0]
    assert ids.shape == (16,) and ids[0] == tk.SOT and ids[-1] == tk.EOT
    with pytest.raises(RuntimeError):
        tk.tokenize(long, context_length=16, truncate=False)


def test_encode_regex_and_cleaning(synth_tok):
    # whitespace collapse + lowercase + contraction split, per clip's regex
    a = synth_tok.encode("Hello,   HELLO!")
    b = synth_tok.encode("hello, hello!")
    assert a == b
    assert synth_tok.encode("it's") == (synth_tok.encode("it")
                                        + synth_tok.encode("'s"))
    # multi-byte utf-8 goes through the byte encoder without KeyError
    assert synth_tok.encode("héllo 日本") != []

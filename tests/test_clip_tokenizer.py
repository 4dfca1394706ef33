"""CLIP BPE tokenizer tests (synthetic merges; the published vocab file is
not shipped — format compatibility is exercised via a tiny gzip fixture)."""

import gzip

import numpy as np
import pytest

from diffbinaural_tpu.data.clip_tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
)

# NOTE: real CLIP merges never produce a token already present in the
# byte / byte</w> sections — the fixture respects that (ids stay bijective)
MERGES = [
    ("h", "e"),
    ("l", "l"),
    ("he", "ll"),
    ("hell", "o</w>"),
]


def make_tok():
    return SimpleTokenizer(MERGES)


def test_bytes_to_unicode_invertible():
    enc = bytes_to_unicode()
    assert len(enc) == 256
    assert len(set(enc.values())) == 256
    assert enc[ord("a")] == "a"  # printable ASCII maps to itself


def test_vocab_layout():
    tok = make_tok()
    # 256 bytes + 256 byte</w> + merges + 2 specials
    assert tok.vocab_size == 512 + len(MERGES) + 2
    assert tok.eot == tok.vocab_size - 1
    assert tok.sot == tok.vocab_size - 2


def test_bpe_merge_order():
    tok = make_tok()
    ids = tok.encode("hello")
    # merges fully collapse "hello" into the single token "hello</w>"
    assert ids == [tok.encoder["hello</w>"]]
    assert tok.decode(ids) == "hello"


def test_encode_unmerged_falls_back_to_bytes():
    tok = make_tok()
    ids = tok.encode("hi")
    assert ids == [tok.encoder["h"], tok.encoder["i</w>"]]


def test_lowercase_and_whitespace_cleanup():
    tok = make_tok()
    assert tok.encode("  HeLLo \n") == tok.encode("hello")


def test_tokenize_framing_and_padding():
    tok = make_tok()
    arr = tok.tokenize(["hello", "hello hello"], context_length=8)
    assert arr.shape == (2, 8) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot and arr[0, 2] == tok.eot
    assert (arr[0, 3:] == 0).all()
    assert arr[1, 0] == tok.sot and arr[1, 3] == tok.eot


def test_tokenize_overflow_raises_or_truncates():
    tok = make_tok()
    with pytest.raises(RuntimeError):
        tok.tokenize("hello " * 10, context_length=6)
    arr = tok.tokenize("hello " * 10, context_length=6, truncate=True)
    assert arr[0, -1] == tok.eot


def test_merges_file_format(tmp_path):
    """gzip file with a version header line, one merge per line."""
    path = tmp_path / "merges.txt.gz"
    lines = ["#version: tiny"] + [" ".join(m) for m in MERGES]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    tok = SimpleTokenizer(str(path))
    assert tok.encode("hello") == [tok.encoder["hello</w>"]]

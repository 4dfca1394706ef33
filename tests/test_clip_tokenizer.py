"""CLIP BPE tokenizer tests (synthetic merges; the published vocab file is
not shipped — format compatibility is exercised via a tiny gzip fixture)."""

import gzip

import numpy as np
import pytest

from diffbinaural_tpu.data.clip_tokenizer import (
    CLIP_VOCAB_SIZE,
    N_CLIP_MERGES,
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
    # file loads always use the published layout: vocab padded to 49408
    # with sot/eot at the published ids
    assert tok.vocab_size == CLIP_VOCAB_SIZE
    assert (tok.sot, tok.eot) == (49406, 49407)


def test_merges_file_truncates_to_clip_count(tmp_path):
    """The published file has more merge lines than clip uses; loading must
    slice to 48894 so the vocab stays 49408 with the published sot/eot ids
    (extra merges would silently shift every special id otherwise)."""
    path = tmp_path / "merges.txt"
    extra = [f"x{i} y{i}" for i in range(N_CLIP_MERGES + 50)]
    path.write_text("\n".join(["#version: big"] + extra), encoding="utf-8")
    tok = SimpleTokenizer(str(path))
    assert tok.vocab_size == CLIP_VOCAB_SIZE
    assert (tok.sot, tok.eot) == (49406, 49407)
    assert len(tok.bpe_ranks) == N_CLIP_MERGES


def test_default_tokenizer_published_layout_golden_ids():
    """Merges-free default: byte-token ids are id-compatible with the
    published CLIP vocab (bytes at 0..511, sot/eot 49406/49407)."""
    tok = SimpleTokenizer.default()
    assert tok.vocab_size == CLIP_VOCAB_SIZE
    assert (tok.sot, tok.eot) == (49406, 49407)
    ids = tok.encode("a photo of a dog")
    assert ids == [320, 79, 71, 78, 83, 334, 78, 325, 320, 67, 78, 326]
    assert tok.decode(ids) == "a photo of a dog"
    arr = tok.tokenize("a photo of a dog")
    assert arr.shape == (1, 77)
    assert arr[0, 0] == 49406 and arr[0, 13] == 49407


def test_underscore_and_unicode_numbers_not_dropped():
    """'_' is \\w but not \\p{L}/\\p{N} — CLIP's catch-all branch consumes
    it; it must not vanish from the byte stream. Non-decimal number chars
    (\\p{N} beyond \\d) tokenize as single number tokens."""
    tok = SimpleTokenizer.default()
    with_us = tok.encode("snake_case")
    without = tok.encode("snakecase")
    assert with_us != without
    assert tok.decode(with_us).replace(" ", "") == "snake_case"
    assert tok.encode("①") != []

"""CLIP BPE tokenizer: merge algorithm, framing, truncation."""

import gzip

import numpy as np
import pytest

from robustvlm_tpu.models.clip.tokenizer import (
    HashTokenizer,
    SimpleTokenizer,
    bytes_to_unicode,
    get_tokenizer,
    whitespace_clean,
)


def _write_merges(path, merges):
    """Synthetic bpe merges file: first line is a header (skipped)."""
    lines = ["#version: synthetic"] + [f"{a} {b}" for a, b in merges]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))


@pytest.fixture()
def tiny_tok(tmp_path):
    # merges teaching: c+a -> ca; ca+t</w> -> cat</w>
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    p = tmp_path / "merges.txt.gz"
    _write_merges(p, merges)
    return SimpleTokenizer(str(p))


class TestByteTable:
    def test_reversible_and_complete(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256


class TestBPE:
    def test_merges_applied(self, tiny_tok):
        # 'cat' -> fully merged single token 'cat</w>'
        assert tiny_tok.bpe("cat") == "cat</w>"
        assert tiny_tok.bpe("dog") == "dog</w>"
        # unknown word stays split (no merge rules for it)
        assert len(tiny_tok.bpe("xyz").split(" ")) == 3

    def test_encode_decode_roundtrip(self, tiny_tok):
        ids = tiny_tok.encode("cat dog cat")
        text = tiny_tok.decode(ids)
        assert text.strip() == "cat dog cat"

    def test_framing_and_padding(self, tiny_tok):
        out = tiny_tok(["cat"])
        assert out.shape == (1, 77)
        assert out[0, 0] == tiny_tok.sot
        assert out[0, 2] == tiny_tok.eot  # sot, 'cat</w>', eot
        assert (out[0, 3:] == 0).all()

    def test_truncation_keeps_eot(self, tiny_tok):
        long = " ".join(["cat"] * 200)
        out = tiny_tok([long])
        assert out.shape == (1, 77)
        assert out[0, -1] == tiny_tok.eot

    def test_lowercase_and_whitespace(self, tiny_tok):
        a = tiny_tok(["  CAT   dog "])
        b = tiny_tok(["cat dog"])
        np.testing.assert_array_equal(a, b)


class TestHashTokenizer:
    def test_deterministic_and_framed(self):
        t = HashTokenizer(512)
        a, b = t(["hello world"]), t(["hello world"])
        np.testing.assert_array_equal(a, b)
        assert a[0, 0] == t.sot and a[0, 3] == t.eot
        assert a.max() < 512

    def test_get_tokenizer_fallback(self, monkeypatch):
        monkeypatch.delenv("CLIP_BPE_PATH", raising=False)
        tok = get_tokenizer(None, context_length=16)
        assert isinstance(tok, HashTokenizer)
        assert tok(["a b"]).shape == (1, 16)


class TestClean:
    def test_whitespace_clean(self):
        assert whitespace_clean("a \t b\n c") == "a b c"

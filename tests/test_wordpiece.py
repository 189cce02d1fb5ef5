"""Greedy WordPiece segmentation (X3) — algorithm properties."""

from __future__ import annotations

import numpy as np

from dygiepp_spark.kernel.wordpiece import (UNK_ID, VOCAB, build_vocab,
                                            wordpiece_ids)


def _pieces(tok: str) -> list[str]:
    return [VOCAB[i] for i in wordpiece_ids(tok)]


def test_vocab_pinned_and_unique():
    v = build_vocab()
    assert v == VOCAB
    assert len(set(v)) == len(v)
    assert v[UNK_ID] == "[UNK]"


def test_greedy_longest_match_first():
    # "the" is in the vocab as a full subword — one piece, not t+h+e
    assert _pieces("the") == ["the"]
    # longest match wins at each position: "ation" beats "at"+"ion"
    assert _pieces("ation") == ["ation"]


def test_continuation_pieces_marked():
    ps = _pieces("thex")
    assert ps[0] == "the" and all(p.startswith("##") for p in ps[1:])
    # round-trip: strip ## and concatenate -> lowercased token
    assert "".join(p.removeprefix("##") for p in ps) == "thex"


def test_roundtrip_ascii_tokens():
    for tok in ["parser", "Spark", "graph.", "a", "multiform",
                "x1y2z3", "under-funded"]:
        ps = _pieces(tok)
        assert "".join(p.removeprefix("##") for p in ps) == tok.lower()


def test_byte_fallback_for_non_ascii():
    """Non-ASCII tokens segment into per-byte pieces (discriminative
    embeddings for multilingual crawl text), never a collapsed UNK."""
    ids_a = wordpiece_ids("naïve")
    ids_b = wordpiece_ids("naïf")
    assert UNK_ID not in ids_a and UNK_ID not in ids_b
    assert ids_a != ids_b
    # ï -> two UTF-8 bytes -> two <0xNN> continuation pieces
    assert any(p.startswith("##<0x") for p in _pieces("naïve"))
    zh1, zh2 = wordpiece_ids("中文"), wordpiece_ids("日本")
    assert zh1 != zh2 and UNK_ID not in zh1


def test_unk_only_for_empty():
    assert wordpiece_ids("") == (UNK_ID,)


def test_roundtrip_property_arbitrary_text():
    """Byte fallback makes segmentation total: every non-empty token
    reconstructs its lowercased utf-8 bytes from its pieces."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=1, max_size=24))
    def prop(tok):
        ids = wordpiece_ids(tok)
        assert UNK_ID not in ids
        # reconstruct bytes from display pieces
        out = b""
        for i in ids:
            p = VOCAB[i].removeprefix("##")
            if p.startswith("<0x") and p.endswith(">") and len(p) == 6:
                out += bytes([int(p[3:5], 16)])
            else:
                out += p.encode("ascii")
        assert out == tok.lower().encode("utf-8")

    prop()


def test_encode_mean_pools_pieces():
    """A token's embedding equals the mean of its piece embeddings."""
    from dygiepp_spark.kernel.weights import get_weights
    w = get_weights()
    pe = w["piece_emb"]
    got = np.vstack([pe[list(wordpiece_ids(t))].mean(axis=0)
                     for t in ["the", "thex"]])
    assert got.shape == (2, pe.shape[1])
    exp0 = pe[list(wordpiece_ids("the"))].mean(axis=0)
    assert np.allclose(got[0], exp0)
    assert pe.shape[0] == len(VOCAB)

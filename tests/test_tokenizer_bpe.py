"""Real-BPE parity: CLIPBPETokenizer vs transformers' CLIPTokenizer on the
same vocab/merges files (reference pipeline.py:54-60 delegates tokenization
to the SD2.1-bundled transformers CLIPTokenizer; this pins our pure-Python
reimplementation against it without needing the full 49k vocab download)."""

import json

import numpy as np
import pytest

from mvd_tpu.data.tokenizer import CLIPBPETokenizer, bytes_to_unicode

PROMPTS = [
    "a chair",
    "A red  CHAIR!",  # case folding + whitespace cleanup + punctuation
    "the object, rendered",
    "3d render of a chair",
    "an untokenizable zqxv word",  # falls back to byte/char pieces
    "",
    "it's the chair's render",  # contraction pieces ('s)
    "x" * 500,  # truncation to max_length
]

MERGES = [
    # per-word chains plus overlapping/conflicting pairs to exercise
    # rank-ordered merging and the within-word scan
    "c h", "t h", "th e</w>", "ch a", "a i", "cha i", "chai r</w>",
    "r e", "re d</w>", "o b", "j e", "e c", "c t</w>", "ob je",
    "r e</w>", "e n", "n d", "d e", "re n", "ren d", "e r", "e r</w>",
    "o f</w>", "a n</w>", "3 d</w>", "w o", "wo r", "wor d</w>",
]


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    base = list(bytes_to_unicode().values())
    vocab = base + [b + "</w>" for b in base]
    for m in MERGES:
        tok = "".join(m.split())
        if tok not in vocab:
            vocab.append(tok)
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = d / "vocab.json"
    merges_path = d / "merges.txt"
    vocab_path.write_text(json.dumps({t: i for i, t in enumerate(vocab)}))
    merges_path.write_text("#version: 0.2\n" + "\n".join(MERGES) + "\n")
    return str(vocab_path), str(merges_path)


def test_bpe_matches_transformers(fixture_files):
    transformers = pytest.importorskip("transformers")
    vocab_path, merges_path = fixture_files
    ref = transformers.CLIPTokenizer(vocab_path, merges_path)
    ours = CLIPBPETokenizer(vocab_path, merges_path, max_length=77)

    got = ours(PROMPTS)
    want = ref(
        PROMPTS,
        padding="max_length",
        max_length=77,
        truncation=True,
        return_tensors="np",
    )["input_ids"]
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_bpe_framing(fixture_files):
    vocab_path, merges_path = fixture_files
    tok = CLIPBPETokenizer(vocab_path, merges_path, max_length=77)
    ids = tok("a chair")[0]
    assert ids[0] == tok.bos
    assert tok.eos in ids
    assert ids.shape == (77,)
    # "chair" fully merges to one token via the MERGES chain
    assert len([i for i in ids if i not in (tok.bos, tok.eos)]) == 2

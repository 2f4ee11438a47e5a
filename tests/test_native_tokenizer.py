"""Native (C++) tokeniser parity with the python pipeline.

The native path must be byte-for-byte identical to
Dataset._tokenize_serial (vocab ids, skip rules, truncation, eos) —
including python str.split() unicode-whitespace semantics.
"""

import numpy as np
import pytest

from zero_tpu import native
from zero_tpu.data import Dataset
from zero_tpu.vocab import Vocab

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture()
def corpus(tmp_path):
    words = ["hello", "wörld", "日本語", "a", "b", "zz"]
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("<pad>\n<unk>\n<eos>\n" +
                          "\n".join(words) + "\n")
    src_lines = [
        "hello wörld 日本語",
        "a b hello",            # NBSP is python whitespace
        "   ",                        # blank pair side -> skip
        "a b a b a b a b a b",        # truncated at max_len
        "OOV hello a",           # thin space + unk token
        "b  a\tb",                    # whitespace runs + tab
        "　zz　",             # ideographic space strip
        "tail no newline",
    ]
    tgt_lines = [
        "a b", "hello", "zz", "b a", "日本語", "a", "b", "b b",
    ]
    src = tmp_path / "c.src"
    tgt = tmp_path / "c.tgt"
    src.write_text("\n".join(src_lines))   # no trailing newline
    tgt.write_text("\n".join(tgt_lines))
    return str(src), str(tgt), str(vocab_file)


def test_encode_corpus_matches_python(corpus):
    src, tgt, vocab_file = corpus
    v = Vocab(vocab_file)
    ds = Dataset(src, tgt, v, v, max_len=4, use_native=False)
    py = list(ds._tokenize_serial())
    nat = native.encode_corpus(src, tgt, vocab_file, vocab_file, 4)
    assert nat is not None
    assert len(py) == len(nat) == 7   # one pair skipped (blank side)
    for (ps, pt), (ns, nt) in zip(py, nat):
        assert ps == list(np.asarray(ns))
        assert pt == list(np.asarray(nt))
        assert ns.dtype == np.int32 and nt.dtype == np.int32


def test_dataset_native_path_equals_python(corpus):
    src, tgt, vocab_file = corpus
    v = Vocab(vocab_file)
    ds_py = Dataset(src, tgt, v, v, max_len=6, use_native=False)
    ds_nat = Dataset(src, tgt, v, v, max_len=6,
                     vocab_files=(vocab_file, vocab_file), use_native=True)
    py = [(list(s), list(t)) for s, t in ds_py.load_data()]
    nat = [(list(np.asarray(s)), list(np.asarray(t)))
           for s, t in ds_nat.load_data()]
    assert py == nat
    # second pass replays the cache identically
    nat2 = [(list(np.asarray(s)), list(np.asarray(t)))
            for s, t in ds_nat.load_data()]
    assert nat2 == nat


def test_dataset_batches_identical(corpus):
    """Full batching path (sort, bucket, pad) over native vs python ids."""
    src, tgt, vocab_file = corpus
    v = Vocab(vocab_file)
    kw = dict(max_len=8, batch_or_token="batch", pad_seq_multiple=4,
              pad_batch_multiple=2)
    ds_py = Dataset(src, tgt, v, v, use_native=False, **kw)
    ds_nat = Dataset(src, tgt, v, v, vocab_files=(vocab_file, vocab_file),
                     use_native=True, **kw)
    b_py = list(ds_py.batcher(3, buffer_size=100, shuffle=False))
    b_nat = list(ds_nat.batcher(3, buffer_size=100, shuffle=False))
    assert len(b_py) == len(b_nat)
    for a, b in zip(b_py, b_nat):
        np.testing.assert_array_equal(a["src"], b["src"])
        np.testing.assert_array_equal(a["tgt"], b["tgt"])
        np.testing.assert_array_equal(a["index"], b["index"])


def test_native_vocab_size_matches(corpus):
    _, _, vocab_file = corpus
    lib = native._load()
    h = lib.zt_vocab_load(vocab_file.encode())
    assert lib.zt_vocab_size(h) == Vocab(vocab_file).size()
    lib.zt_vocab_free(h)


def test_missing_file_returns_none(tmp_path, corpus):
    src, tgt, vocab_file = corpus
    assert native.encode_corpus(str(tmp_path / "nope"), tgt,
                                vocab_file, vocab_file, 4) is None


def test_blank_vocab_line_keeps_python_ids(tmp_path):
    """A blank vocab line becomes a real '' token in vocab.py; the native
    loader must assign the same ids to everything after it."""
    vocab_file = tmp_path / "v.txt"
    vocab_file.write_text("<pad>\n<unk>\n<eos>\nalpha\n\nbeta\n")
    v = Vocab(str(vocab_file))
    assert v.get_id("") == 4 and v.get_id("beta") == 5
    lib = native._load()
    h = lib.zt_vocab_load(str(vocab_file).encode())
    assert lib.zt_vocab_size(h) == v.size()
    lib.zt_vocab_free(h)
    src = tmp_path / "c.src"
    tgt = tmp_path / "c.tgt"
    src.write_text("alpha beta\n")
    tgt.write_text("beta alpha\n")
    py = list(Dataset(str(src), str(tgt), v, v, max_len=8,
                      use_native=False)._tokenize_serial())
    nat = native.encode_corpus(str(src), str(tgt), str(vocab_file),
                               str(vocab_file), 8)
    assert [(list(np.asarray(s)), list(np.asarray(t))) for s, t in nat] == \
        [(list(s), list(t)) for s, t in py]


def test_carriage_return_newlines_match_python(tmp_path):
    """Lone-\\r and \\r\\n terminated corpora must not misalign pairs:
    python text mode treats both as line breaks."""
    vocab_file = tmp_path / "v.txt"
    vocab_file.write_text("a\nb\nc\n")
    v = Vocab(str(vocab_file))
    src = tmp_path / "c.src"
    tgt = tmp_path / "c.tgt"
    src.write_bytes(b"a b\rb c\r\nc a\r")
    tgt.write_bytes(b"c\ra b\r\nb\n")
    py = list(Dataset(str(src), str(tgt), v, v, max_len=8,
                      use_native=False)._tokenize_serial())
    assert len(py) == 3
    nat = native.encode_corpus(str(src), str(tgt), str(vocab_file),
                               str(vocab_file), 8)
    assert [(list(np.asarray(s)), list(np.asarray(t))) for s, t in nat] == \
        [(list(s), list(t)) for s, t in py]


def test_invalid_utf8_falls_back_to_python(tmp_path):
    """Invalid UTF-8 must not be silently decoded latin-1: the native path
    reports failure so the caller's python path raises as it always did."""
    vocab_file = tmp_path / "v.txt"
    vocab_file.write_text("a\nb\n")
    src = tmp_path / "c.src"
    tgt = tmp_path / "c.tgt"
    src.write_bytes(b"a \xff\xfe b\n")
    tgt.write_bytes(b"b a\n")
    assert native.encode_corpus(str(src), str(tgt), str(vocab_file),
                                str(vocab_file), 8) is None
    # invalid vocab file likewise
    bad_vocab = tmp_path / "bad.txt"
    bad_vocab.write_bytes(b"a\n\xc3\x28\n")
    lib = native._load()
    assert not lib.zt_vocab_load(str(bad_vocab).encode())

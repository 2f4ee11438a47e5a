"""Host pipeline: parallel tokenisation parity + prefetcher shutdown."""

import threading
import time

import numpy as np
import pytest

from zero_tpu.data import Dataset
from zero_tpu.pipeline import Prefetcher
from zero_tpu.vocab import Vocab


def _mk_corpus(tmp_path, n=257):
    rs = np.random.RandomState(0)
    words = ["w%d" % i for i in range(50)]
    src = tmp_path / "c.src"
    tgt = tmp_path / "c.tgt"
    lines_s, lines_t = [], []
    for i in range(n):
        lines_s.append(" ".join(rs.choice(words, rs.randint(1, 12))))
        lines_t.append(" ".join(rs.choice(words, rs.randint(1, 12))))
    # blank lines must be skipped identically in both paths
    lines_s[5] = ""
    lines_t[17] = "   "
    src.write_text("\n".join(lines_s) + "\n")
    tgt.write_text("\n".join(lines_t) + "\n")
    vocab = Vocab()
    for w in words:
        vocab.insert(w)
    return str(src), str(tgt), vocab


@pytest.mark.parametrize("workers", [2, 4])
def test_parallel_tokenisation_matches_serial(tmp_path, workers):
    src, tgt, vocab = _mk_corpus(tmp_path)
    serial = Dataset(src, tgt, vocab, vocab, max_len=8, cache_ids=False)
    par = Dataset(src, tgt, vocab, vocab, max_len=8, cache_ids=False,
                  num_workers=workers)
    a = list(serial.load_data())
    b = list(par.load_data())
    assert a == b
    assert len(a) > 200


def test_parallel_tokenisation_feeds_id_cache(tmp_path):
    src, tgt, vocab = _mk_corpus(tmp_path)
    ds = Dataset(src, tgt, vocab, vocab, max_len=8, num_workers=2)
    first = list(ds.load_data())
    assert ds._id_cache is not None
    second = list(ds.load_data())  # replayed from cache
    assert first == second


def test_prefetcher_close_stops_worker():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    pf = Prefetcher(gen, maxsize=2)
    it = iter(pf)
    assert next(it) == 0
    pf.close()
    n_after_close = len(produced)
    time.sleep(0.3)
    # worker must stop producing promptly (bounded queue + stop flag)
    assert len(produced) <= n_after_close + 3
    assert not pf._thread.is_alive()


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(Prefetcher(gen, maxsize=2))


def test_prefetcher_passthrough_mode():
    assert list(Prefetcher(lambda: iter(range(5)), background=False)) == \
        list(range(5))


def test_threads_do_not_change_batch_stream(tmp_path):
    src, tgt, vocab = _mk_corpus(tmp_path)
    kw = dict(max_len=8, pad_seq_multiple=4, pad_batch_multiple=4)
    d1 = Dataset(src, tgt, vocab, vocab, **kw)
    d2 = Dataset(src, tgt, vocab, vocab, num_workers=3, **kw)
    b1 = list(d1.batcher(16, buffer_size=64, shuffle=False, train=False))
    b2 = list(Prefetcher(
        lambda: d2.batcher(16, buffer_size=64, shuffle=False, train=False),
        maxsize=4))
    assert len(b1) == len(b2)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["src"], y["src"])
        np.testing.assert_array_equal(x["tgt"], y["tgt"])
        assert x["index"] == y["index"]

import numpy as np
import pytest

from zero_tpu.data import Dataset, batch_indexer, round_up, token_indexer
from zero_tpu.vocab import Vocab


@pytest.fixture
def vocab(tmp_path):
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(["<pad>", "<unk>", "<eos>", "a", "b", "c", "d"]))
    return Vocab(str(vf))


def test_vocab_reserved_ids(vocab):
    assert vocab.pad() == 0
    assert vocab.get_id("<unk>") == 1
    assert vocab.eos() == 2
    assert vocab.get_id("a") == 3
    assert vocab.get_id("zzz") == 1  # unk fallback


def test_vocab_to_id_appends_eos(vocab):
    assert vocab.to_id(["a", "b"]) == [3, 4, vocab.eos()]
    assert vocab.to_id(["a"], append_eos=False) == [3]


def test_vocab_sort_build(tmp_path):
    v = Vocab()
    for tok in ["x", "y", "y", "z", "z", "z"]:
        v.insert(tok)
    v.sort_vocab()
    assert v.get_id("z") == 3
    assert v.get_id("y") == 4
    assert v.get_id("x") == 5


def test_batch_indexer():
    assert batch_indexer(10, 4) == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_token_indexer_budget():
    lengths = [[5, 5]] * 4 + [[50, 50]]
    groups = token_indexer(lengths, 20)
    # all indices covered exactly once
    flat = [i for g in groups for i in g]
    assert sorted(flat) == list(range(5))
    # cost of each batch (count * running max len) respects the budget rule
    for g in groups:
        if len(g) > 1:
            maxlen = max(max(lengths[i]) for i in g)
            assert (len(g) - 1) * maxlen < 20


def test_token_indexer_oversize_singleton():
    groups = token_indexer([[100, 100]], 20)
    assert groups == [[0]]


def _write_corpus(tmp_path, pairs):
    src = tmp_path / "src.txt"
    tgt = tmp_path / "tgt.txt"
    src.write_text("\n".join(p[0] for p in pairs) + "\n")
    tgt.write_text("\n".join(p[1] for p in pairs) + "\n")
    return str(src), str(tgt)


def test_dataset_batching(tmp_path, vocab):
    pairs = [("a b c", "b c"), ("a", "b"), ("c c c c", "d d d d"),
             ("a b", "c d")]
    src, tgt = _write_corpus(tmp_path, pairs)
    ds = Dataset(src, tgt, vocab, vocab, max_len=10, batch_or_token="batch",
                 data_leak_ratio=0.0)
    batches = list(ds.batcher(2, buffer_size=100, shuffle=False, train=False))
    total = sum(len(b["raw"]) for b in batches)
    assert total == 4
    for b in batches:
        assert b["src"].dtype == np.int32
        # padding is zeros after real tokens
        for row, (_, ids, _) in zip(b["src"], b["raw"]):
            assert list(row[:len(ids)]) == ids


def test_dataset_truncation(tmp_path, vocab):
    pairs = [("a " * 50, "b " * 50)]
    src, tgt = _write_corpus(tmp_path, pairs)
    ds = Dataset(src, tgt, vocab, vocab, max_len=5)
    (s, t), = list(ds.load_data())
    assert len(s) == 6  # 5 tokens + eos
    assert s[-1] == vocab.eos()


def test_dataset_leak_buffer(tmp_path, vocab):
    # 5 sentences, batch=4, leak ratio 0.5: tail of 1 < 2 is deferred when
    # train=True mid-stream but flushed at end only if >= threshold
    pairs = [("a b", "a b")] * 5
    src, tgt = _write_corpus(tmp_path, pairs)
    ds = Dataset(src, tgt, vocab, vocab, batch_or_token="batch",
                 data_leak_ratio=0.5)
    batches = list(ds.batcher(4, buffer_size=4, shuffle=False, train=True))
    # 4-batch emitted; leftover single sentence kept in leak buffer
    assert sum(len(b["raw"]) for b in batches) == 4
    assert len(ds.leak_buffer) == 1
    # next epoch re-integrates the leak buffer: 1 deferred + 5 new = 6
    batches2 = list(ds.batcher(4, buffer_size=4, shuffle=False, train=True))
    assert sum(len(b["raw"]) for b in batches2) == 6
    assert len(ds.leak_buffer) == 0


def test_shape_bucketing(tmp_path, vocab):
    pairs = [("a b c", "b"), ("a", "b c d")]
    src, tgt = _write_corpus(tmp_path, pairs)
    ds = Dataset(src, tgt, vocab, vocab, batch_or_token="batch",
                 pad_seq_multiple=16, pad_batch_multiple=8)
    batches = list(ds.batcher(2, shuffle=False, train=False))
    assert batches[0]["src"].shape == (8, 16)
    assert batches[0]["tgt"].shape == (8, 16)
    # padded rows are all-pad
    assert (batches[0]["src"][2:] == 0).all()


def test_round_up():
    assert round_up(5, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(0, 8) == 0
    assert round_up(5, 1) == 5


def test_id_cache_consistent_across_epochs(tmp_path, vocab):
    pairs = [("a b c", "b c"), ("a", "b"), ("c c", "d d")]
    src, tgt = _write_corpus(tmp_path, pairs)
    ds = Dataset(src, tgt, vocab, vocab, batch_or_token="batch",
                 cache_ids=True)
    first = list(ds.load_data())
    assert ds._id_cache is not None
    second = list(ds.load_data())
    assert first == second
    # cache off keeps streaming from disk
    ds2 = Dataset(src, tgt, vocab, vocab, cache_ids=False)
    list(ds2.load_data())
    assert ds2._id_cache is None


def test_token_mode_row_snapping_bounds_shapes():
    """Token-budget batches snap row counts to the geometric ladder so the
    number of distinct jit shapes stays O(log) (TPU compile discipline)."""
    from zero_tpu.data import snap_rows_ladder
    shapes = {snap_rows_ladder(n, 16) for n in range(1, 4096)}
    assert len(shapes) < 25
    for n in (1, 17, 300, 1500):
        assert snap_rows_ladder(n, 16) >= n
        assert snap_rows_ladder(n, 16) % 16 == 0
    # batch mode unaffected: plain multiple snapping
    from zero_tpu.data import round_up
    assert round_up(130, 16) == 144


def test_token_mode_dataset_yields_snapped_rows(tmp_path):
    import numpy as np
    from zero_tpu.data import Dataset, snap_rows_ladder
    from tests.helpers import tiny_vocab
    rs = np.random.RandomState(0)
    src = tmp_path / "s.txt"; tgt = tmp_path / "t.txt"
    with open(src, "w") as fs, open(tgt, "w") as ft:
        for _ in range(400):
            n = rs.randint(3, 14)
            fs.write(" ".join("w%d" % rs.randint(0, 10) for _ in range(n)) + "\n")
            ft.write(" ".join("w%d" % rs.randint(0, 10) for _ in range(n)) + "\n")
    ds = Dataset(str(src), str(tgt), tiny_vocab(), tiny_vocab(),
                 max_len=16, batch_or_token="token",
                 pad_seq_multiple=8, pad_batch_multiple=16)
    rows = set()
    for b in ds.batcher(128, buffer_size=100, shuffle=False, train=True):
        rows.add(b["src"].shape[0])
        assert b["src"].shape[0] == snap_rows_ladder(
            len(b["raw"]), 16) or b["src"].shape[0] >= len(b["raw"])
    assert rows <= {snap_rows_ladder(n, 16) for n in range(1, 513)}

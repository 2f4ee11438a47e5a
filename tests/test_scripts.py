"""Offline-script tests: checkpoint averaging, shuffle, analyzers."""

import numpy as np

from zero_tpu.saver import (Saver, _read_index, load_checkpoint_file,
                            save_checkpoint_file, _write_index)
from zero_tpu.scripts.bleu_over_length import bleu_over_length
from zero_tpu.scripts.checkpoint_averaging import average_checkpoints
from zero_tpu.scripts.evaluate_pos_translation_rate import evaluate
from zero_tpu.scripts.shuffle_corpus import shuffle_corpus


def test_checkpoint_averaging(tmp_path):
    d = tmp_path / "train"
    d.mkdir()
    names = []
    for i, val in enumerate([1.0, 2.0, 3.0]):
        tree = {"w": np.full((4,), val, np.float32),
                "nested": {"b": np.full((2, 2), val * 10, np.float32)}}
        save_checkpoint_file(str(d), "model-%d" % i, {"params": tree})
        names.append("model-%d" % i)
    _write_index(str(d), names)

    out = tmp_path / "avg"
    path = average_checkpoints(str(d), str(out), checkpoints=3)
    flat = load_checkpoint_file(path)
    np.testing.assert_allclose(flat["params/w"], np.full((4,), 2.0))
    np.testing.assert_allclose(flat["params/nested/b"], np.full((2, 2), 20.0))
    assert _read_index(str(out)) == ["model-avg"]


def test_checkpoint_averaging_respects_k(tmp_path):
    d = tmp_path / "train"
    d.mkdir()
    names = []
    for i, val in enumerate([1.0, 5.0, 7.0]):
        save_checkpoint_file(str(d), "model-%d" % i,
                             {"params": {"w": np.full((2,), val, np.float32)}})
        names.append("model-%d" % i)
    _write_index(str(d), names)
    path = average_checkpoints(str(d), str(tmp_path / "avg"), checkpoints=2)
    flat = load_checkpoint_file(path)
    np.testing.assert_allclose(flat["params/w"], np.full((2,), 6.0))


def test_shuffle_corpus_joint(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("\n".join("a%d" % i for i in range(20)) + "\n")
    b.write_text("\n".join("b%d" % i for i in range(20)) + "\n")
    outs = shuffle_corpus([str(a), str(b)], seed=3)
    la = open(outs[0]).read().split()
    lb = open(outs[1]).read().split()
    # same permutation applied jointly
    assert [x[1:] for x in la] == [x[1:] for x in lb]
    assert sorted(la) == sorted("a%d" % i for i in range(20))
    assert la != ["a%d" % i for i in range(20)]  # actually shuffled


def test_bleu_over_length_groups():
    src = [["x"], ["x", "x"], ["x"] * 3, ["x"] * 4]
    cand = [["a"], ["b", "b"], ["c"] * 3, ["d"] * 4]
    refs = [[["a"]], [["b", "b"]], [["c"] * 3], [["z"] * 4]]
    results = bleu_over_length(src, cand, refs, groups=2, n=1)
    assert len(results) == 2
    assert results[0][0] < results[1][0]  # avg length increases
    assert results[0][1] > results[1][1]  # first group perfect, second not


def test_pos_translation_rate():
    refs = [["the_DT cat_NN sat_VB"]]
    trans = ["the_DT cat_NN ran_VB"]
    p, r, f = evaluate(refs, trans, "NN", 1)
    assert p == 1.0 and r == 1.0
    p, r, f = evaluate(refs, trans, "VB", 1)
    assert p == 0.0 and r == 0.0


# -- synth-MT generator -------------------------------------------------------

def test_synth_mt_generator(tmp_path):
    from zero_tpu.scripts.make_synth_mt import SynthMT, generate

    out = str(tmp_path / "mt")
    generate(out, n_train=200, n_dev=50, n_test=10, vocab_size=500, seed=3)
    src = [l.split() for l in open(out + "/train.src")]
    tgt = [l.split() for l in open(out + "/train.tgt")]
    assert len(src) == len(tgt) == 200

    # deterministic: regenerating gives identical text
    out2 = str(tmp_path / "mt2")
    generate(out2, n_train=200, n_dev=50, n_test=10, vocab_size=500, seed=3)
    assert open(out + "/train.src").read() == open(out2 + "/train.src").read()
    assert open(out + "/train.tgt").read() == open(out2 + "/train.tgt").read()

    # the oracle transduction reproduces every target line
    task = SynthMT(vocab_size=500, seed=3)
    for s, t in zip(src, tgt):
        ids = [int(w[1:]) for w in s]
        assert task.translate(ids) == t
        # global agreement marker
        assert t[-1] == task.agree[len(ids) % 3]

    # every target token is in the generated vocab
    vocab = set(open(out + "/vocab.tgt").read().split())
    assert all(w in vocab for line in tgt for w in line)


# -- compile-cache warming ----------------------------------------------------

def test_warm_cache_shape_collection(tmp_path):
    """The warm tool's host-side replay must enumerate exactly the
    stacked shapes the train feed would produce: token-mode row counts
    on the geometric ladder, lengths on the pad multiple, maxes taken
    over each update_cycle group."""
    from zero_tpu.scripts.warm_cache import (collect_eval_shapes,
                                             collect_train_shapes)
    from zero_tpu.config import default_config
    from zero_tpu.train import _make_dataset
    from zero_tpu.vocab import Vocab

    rs = np.random.RandomState(5)
    words = ["w%d" % i for i in range(20)]
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["<pad>", "<unk>", "<eos>"] + words) + "\n")
    lines = [" ".join(rs.choice(words, rs.randint(3, 15)))
             for _ in range(300)]
    (tmp_path / "c.src").write_text("\n".join(lines) + "\n")
    (tmp_path / "c.tgt").write_text("\n".join(lines) + "\n")

    cfg = default_config()
    cfg.src_vocab = Vocab(str(tmp_path / "vocab.txt"))
    cfg.tgt_vocab = cfg.src_vocab
    cfg.src_train_file = str(tmp_path / "c.src")
    cfg.tgt_train_file = str(tmp_path / "c.tgt")
    cfg.max_len = 16
    cfg.batch_or_token = "token"
    cfg.token_size = 150
    cfg.update_cycle = 2
    cfg.pad_seq_multiple = 4
    cfg.pad_batch_multiple = 4
    cfg.eval_batch_size = 8

    ds = _make_dataset(cfg, cfg.src_train_file, cfg.tgt_train_file,
                       train=True, data_par=1)
    shapes = collect_train_shapes(cfg, ds, max_shapes=64)
    assert shapes, "no shapes collected"
    from zero_tpu.data import snap_rows_ladder
    for rows, slen, tlen in shapes:
        assert rows == snap_rows_ladder(rows, 4), (rows,)
        assert slen % 4 == 0 and tlen % 4 == 0, (slen, tlen)
        assert slen <= 16 and tlen <= 16

    dev = _make_dataset(cfg, cfg.src_train_file, cfg.tgt_train_file,
                        train=False, data_par=1)
    eval_shapes = collect_eval_shapes(cfg, dev, max_shapes=64)
    assert eval_shapes
    assert all(r == 8 for r, _ in eval_shapes), eval_shapes

    # deterministic: a second replay enumerates the same set
    ds2 = _make_dataset(cfg, cfg.src_train_file, cfg.tgt_train_file,
                        train=True, data_par=1)
    assert collect_train_shapes(cfg, ds2, max_shapes=64) == shapes

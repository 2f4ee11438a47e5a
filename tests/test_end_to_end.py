"""End-to-end driver test: train on a synthetic copy task via the real
train() driver, checkpoint, resume, evaluate with beam search + BLEU."""

import json
import os

import numpy as np
import pytest

from zero_tpu import run as cli
from zero_tpu import train as graph
from zero_tpu.config import default_config, save_parameters
from zero_tpu.vocab import Vocab

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`


def _write_corpus(path, lines):
    with open(path, "w") as w:
        for line in lines:
            w.write(line + "\n")


@pytest.fixture(scope="module")
def copy_task(tmp_path_factory):
    """A tiny copy task: target == source over a 12-word vocab."""
    root = tmp_path_factory.mktemp("copytask")
    rs = np.random.RandomState(0)
    words = ["tok%d" % i for i in range(12)]
    vocab_file = root / "vocab.txt"
    _write_corpus(vocab_file, ["<pad>", "<unk>", "<eos>"] + words)

    def make_split(n, fname):
        lines = [" ".join(rs.choice(words, rs.randint(3, 8)))
                 for _ in range(n)]
        _write_corpus(root / (fname + ".src"), lines)
        _write_corpus(root / (fname + ".tgt"), lines)

    make_split(400, "train")
    make_split(24, "dev")
    make_split(24, "test")
    return root


def _params(copy_task, out_dir, **over):
    p = default_config()
    p.model_name = "transformer"
    p.scope_name = "transformer"
    p.hidden_size = 32
    p.embed_size = 32
    p.filter_size = 64
    p.num_heads = 2
    p.num_encoder_layer = 1
    p.num_decoder_layer = 1
    p.dropout = 0.0
    p.relu_dropout = 0.0
    p.residual_dropout = 0.0
    p.attention_dropout = 0.0
    p.label_smooth = 0.1
    p.max_len = 16
    p.eval_max_len = 32
    p.batch_or_token = "batch"
    p.batch_size = 32
    p.eval_batch_size = 12
    p.token_size = 200
    p.beam_size = 2
    p.decode_length = 12
    p.decode_max_len = 24
    p.lrate = 3e-3
    p.lrate_strategy = "vanilla"
    p.warmup_steps = 20
    p.max_training_steps = 700
    p.disp_freq = 200
    p.save_freq = 200
    p.eval_freq = 350
    p.sample_freq = 0
    p.epoches = 200
    p.estop_patience = 100
    p.pad_seq_multiple = 4
    p.pad_batch_multiple = 4
    p.buffer_size = 400
    p.src_vocab_file = str(copy_task / "vocab.txt")
    p.tgt_vocab_file = str(copy_task / "vocab.txt")
    p.src_train_file = str(copy_task / "train.src")
    p.tgt_train_file = str(copy_task / "train.tgt")
    p.src_dev_file = str(copy_task / "dev.src")
    p.tgt_dev_file = str(copy_task / "dev.tgt")
    p.src_test_file = str(copy_task / "test.src")
    p.tgt_test_file = str(copy_task / "test.tgt")
    p.output_dir = str(out_dir)
    for k, v in over.items():
        setattr(p, k, v)
    p.src_vocab = Vocab(p.src_vocab_file)
    p.tgt_vocab = Vocab(p.tgt_vocab_file)
    return p


@pytest.fixture(scope="module")
def trained_dir(copy_task, tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    params = _params(copy_task, out)
    save_parameters(params, params.output_dir)
    params = cli.setup_recorder(params)
    graph.train(params)
    return out


def test_train_writes_checkpoints_and_record(trained_dir):
    assert os.path.exists(trained_dir / "checkpoint")
    assert os.path.exists(trained_dir / "record.json")
    record = json.load(open(trained_dir / "record.json"))
    assert record["step"] >= 700
    # best dir populated by eval-driven saves
    assert os.path.exists(trained_dir / "best" / "topk_checkpoint")


def test_evaluate_from_checkpoint(copy_task, trained_dir):
    params = _params(copy_task, trained_dir)
    bleu = graph.evaluate(params)
    # the copy task is learnable to near-perfection even by a tiny model
    assert bleu > 0.5, bleu
    out_file = trained_dir / "trans.txt"
    assert os.path.exists(out_file)
    hyp = open(out_file).read().strip().splitlines()
    ref = open(copy_task / "test.tgt").read().strip().splitlines()
    assert len(hyp) == len(ref)


def test_scorer_from_checkpoint(copy_task, trained_dir):
    params = _params(copy_task, trained_dir)
    scores, ppl = graph.scorer(params)
    assert len(scores) == 24
    assert ppl < 8.0  # trained model should beat uniform (vocab 15)


def test_resume_continues_from_recorder(copy_task, trained_dir):
    params = _params(copy_task, trained_dir, max_training_steps=710)
    params = cli.setup_recorder(params)
    assert params.recorder.step >= 700
    graph.train(params)
    record = json.load(open(trained_dir / "record.json"))
    assert record["step"] >= 710


def test_ensemble_of_same_model(copy_task, trained_dir):
    params = _params(copy_task, trained_dir)
    bleu = graph.ensemble([params, params])
    assert bleu > 0.5


@pytest.mark.parametrize("model_name", ["transformer_aan", "transformer_fuse"])
def test_variant_models_learn_copy_task(copy_task, tmp_path, model_name):
    """Full driver train -> eval for model variants (smaller budget)."""
    out = tmp_path / ("out_" + model_name)
    params = _params(copy_task, out, model_name=model_name,
                     scope_name=model_name, max_training_steps=700,
                     eval_freq=100000, save_freq=700, disp_freq=350)
    save_parameters(params, params.output_dir)
    params = cli.setup_recorder(params)
    graph.train(params)
    eval_params = _params(copy_task, out, model_name=model_name,
                          scope_name=model_name)
    bleu = graph.evaluate(eval_params)
    assert bleu > 0.5, (model_name, bleu)


def test_checkpoint_averaging_then_evaluate(copy_task, trained_dir, tmp_path):
    """Offline checkpoint averaging -> decode from the averaged model."""
    from zero_tpu.scripts.checkpoint_averaging import average_checkpoints
    avg_dir = tmp_path / "avg"
    average_checkpoints(str(trained_dir), str(avg_dir), checkpoints=3)
    params = _params(copy_task, avg_dir)
    bleu = graph.evaluate(params)
    assert bleu > 0.5, bleu

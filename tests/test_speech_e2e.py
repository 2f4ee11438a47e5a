"""End-to-end speech-translation driver test: train transformer_afs via
the real train() driver on a synthetic learnable task (audio frames
deterministically encode the target tokens), then evaluate with beam
search + BLEU through the checkpoint-restore path."""

import json
import os

import numpy as np
import pytest

from zero_tpu import run as cli
from zero_tpu import train as graph
from zero_tpu.config import default_config, save_parameters
from zero_tpu.vocab import Vocab

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`


@pytest.fixture(scope="module")
def speech_task(tmp_path_factory):
    """Synthetic 'audio': each token is rendered as 3 frames whose feature
    pattern identifies the token; perfectly learnable ASR->ST task."""
    root = tmp_path_factory.mktemp("speech_task")
    rs = np.random.RandomState(0)
    n_words = 10
    words = ["w%d" % i for i in range(n_words)]
    (root / "vocab.txt").write_text(
        "\n".join(["<pad>", "<unk>", "<eos>"] + words) + "\n")
    # a fixed random signature per token
    signatures = rs.randn(n_words, 16).astype(np.float32) * 2

    def make_split(n, name):
        man_lines, ref_lines = [], []
        for i in range(n):
            toks = rs.randint(0, n_words, rs.randint(2, 6))
            frames = np.repeat(signatures[toks], 3, axis=0)
            frames += rs.randn(*frames.shape).astype(np.float32) * 0.05
            fpath = root / ("%s_%d.npy" % (name, i))
            np.save(fpath, frames)
            text = " ".join(words[t] for t in toks)
            man_lines.append("%s\t%s\t%s" % (fpath.name, text, text))
            ref_lines.append(text)
        (root / (name + ".tsv")).write_text("\n".join(man_lines) + "\n")
        (root / (name + ".ref")).write_text("\n".join(ref_lines) + "\n")

    make_split(300, "train")
    make_split(16, "dev")
    make_split(16, "test")
    return root


def _params(root, out_dir, **over):
    p = default_config()
    p.model_name = "transformer_afs"
    p.scope_name = "transformer_afs"
    p.data_kind = "speech"
    p.hidden_size = 32
    p.embed_size = 32
    p.filter_size = 64
    p.num_heads = 2
    p.num_encoder_layer = 1
    p.num_st_encoder_layer = 1
    p.num_decoder_layer = 1
    p.audio_num_mel_bins = 16
    p.audio_frame_stride = 3
    p.max_frame_len = 32
    p.afs_mode = "t"
    p.afs_l0_scalar = 0.01
    p.ctc_enable = True
    p.ctc_alpha = 0.2
    p.dropout = 0.0
    p.relu_dropout = 0.0
    p.residual_dropout = 0.0
    p.attention_dropout = 0.0
    p.max_len = 8
    p.eval_max_len = 8
    p.batch_or_token = "batch"
    p.batch_size = 32
    p.eval_batch_size = 16
    p.beam_size = 2
    p.decode_length = 10
    p.decode_max_len = 16
    p.lrate = 3e-3
    p.lrate_strategy = "vanilla"
    p.max_training_steps = 900
    p.disp_freq = 300
    p.save_freq = 300
    p.eval_freq = 450
    p.sample_freq = 0
    p.epoches = 300
    p.estop_patience = 100
    p.pad_seq_multiple = 4
    p.pad_batch_multiple = 4
    p.buffer_size = 400
    p.src_vocab_file = str(root / "vocab.txt")
    p.tgt_vocab_file = str(root / "vocab.txt")
    p.src_train_file = str(root / "train.tsv")
    p.tgt_train_file = str(root / "train.ref")
    p.src_dev_file = str(root / "dev.tsv")
    p.tgt_dev_file = str(root / "dev.ref")
    p.src_test_file = str(root / "test.tsv")
    p.tgt_test_file = str(root / "test.ref")
    p.output_dir = str(out_dir)
    for k, v in over.items():
        setattr(p, k, v)
    p.src_vocab = Vocab(p.src_vocab_file)
    p.tgt_vocab = Vocab(p.tgt_vocab_file)
    return p


def test_speech_train_and_evaluate(speech_task, tmp_path):
    out = tmp_path / "out"
    params = _params(speech_task, out)
    save_parameters(params, params.output_dir)
    params = cli.setup_recorder(params)
    graph.train(params)

    record = json.load(open(out / "record.json"))
    assert record["step"] >= 900
    assert os.path.exists(out / "checkpoint")

    eval_params = _params(speech_task, out)
    bleu = graph.evaluate(eval_params)
    # the synthetic task is nearly deterministic; expect strong BLEU
    assert bleu > 0.5, bleu


def test_speech_context_training_runs(speech_task, tmp_path):
    out = tmp_path / "ctx_out"
    params = _params(speech_task, out, st_context=True,
                     context_max_frame_len=16, max_training_steps=30,
                     eval_freq=100000, save_freq=100000, disp_freq=10)
    save_parameters(params, params.output_dir)
    params = cli.setup_recorder(params)
    graph.train(params)
    record = json.load(open(out / "record.json"))
    assert record["step"] >= 30

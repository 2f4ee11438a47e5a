"""Preemption-safe training: SIGTERM -> orderly checkpoint -> resume.

TPU pods are preempted with SIGTERM plus a grace window; the reference
(a long-lived TF1 session) simply dies. The rebuild turns the signal
into a normal save (train.py:_on_sigterm + the per-step poll) so the
next `--mode train` on the same output_dir resumes via record.json.
"""

import json
import os
import signal
import subprocess
import sys
import time
import pytest

import numpy as np

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_corpus(d):
    rs = np.random.RandomState(3)
    words = ["tok%d" % i for i in range(12)]
    (d / "vocab.txt").write_text(
        "\n".join(["<pad>", "<unk>", "<eos>"] + words) + "\n")
    lines = [" ".join(rs.choice(words, rs.randint(3, 8)))
             for _ in range(200)]
    for f in ("train", "dev"):
        (d / (f + ".src")).write_text("\n".join(lines) + "\n")
        (d / (f + ".tgt")).write_text("\n".join(lines) + "\n")


def _params(d, max_steps):
    return ("model_name=transformer,scope_name=transformer,hidden_size=16,"
            "embed_size=16,filter_size=32,num_heads=2,num_encoder_layer=1,"
            "num_decoder_layer=1,dropout=0.0,residual_dropout=0.0,"
            "relu_dropout=0.0,attention_dropout=0.0,max_len=16,"
            "batch_or_token=batch,batch_size=16,eval_batch_size=16,"
            "beam_size=2,decode_length=12,decode_max_len=24,lrate=1e-3,"
            "lrate_strategy=vanilla,max_training_steps=%d,disp_freq=50,"
            "save_freq=100000,eval_freq=0,sample_freq=0,epoches=10000,"
            "pad_seq_multiple=4,pad_batch_multiple=4,"
            "src_vocab_file=%s/vocab.txt,tgt_vocab_file=%s/vocab.txt,"
            "src_train_file=%s/train.src,tgt_train_file=%s/train.tgt,"
            "src_dev_file=%s/dev.src,tgt_dev_file=%s/dev.tgt,"
            "output_dir=%s/out" % ((max_steps,) + (str(d),) * 7))


def _launch(d, max_steps, log_path):
    code = ("import jax; jax.config.update('jax_platforms','cpu'); "
            "from zero_tpu.run import main; "
            "main(['--mode','train','--parameters','%s'])"
            % _params(d, max_steps))
    logf = open(log_path, "w")
    return subprocess.Popen([sys.executable, "-c", code], cwd=REPO,
                            stdout=logf, stderr=subprocess.STDOUT)


def test_sigterm_checkpoints_and_resumes(tmp_path):
    _write_corpus(tmp_path)
    log1 = tmp_path / "run1.log"
    proc = _launch(tmp_path, max_steps=100000, log_path=log1)
    try:
        # wait for real steps (the first disp line), then preempt
        deadline = time.time() + 420
        while time.time() < deadline:
            if log1.exists() and ", loss " in log1.read_text():
                break
            if proc.poll() is not None:
                raise AssertionError(
                    "trainer exited early:\n" + log1.read_text()[-3000:])
            time.sleep(2)
        else:
            raise AssertionError(
                "no training step within 420 s:\n"
                + log1.read_text()[-3000:])
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, log1.read_text()[-3000:]
    text = log1.read_text()
    assert "SIGTERM received" in text, text[-3000:]

    # the orderly save exists and records real progress
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] > 0
    ckpts = [f for f in os.listdir(tmp_path / "out")
             if f.endswith(".npz")]
    assert "model-%d.npz" % record["step"] in ckpts, ckpts

    # resume: a fresh run restores the checkpoint and continues PAST the
    # preempted step to its (small) budget
    budget = record["step"] + 30
    log2 = tmp_path / "run2.log"
    proc2 = _launch(tmp_path, max_steps=budget, log_path=log2)
    try:
        proc2.wait(timeout=420)
    finally:
        if proc2.poll() is None:
            proc2.kill()
    text2 = log2.read_text()
    assert proc2.returncode == 0, text2[-3000:]
    assert "Restoring from" in text2, text2[-3000:]
    record2 = json.load(open(tmp_path / "out" / "record.json"))
    assert record2["step"] >= budget, (record2, budget)

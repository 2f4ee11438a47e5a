"""Multi-host training integration tests: 2 processes x 4 virtual CPU
devices train the copy task jointly via jax.distributed + GSPMD.

Covers fixed-shape batch mode, token bucketing through the deterministic
shared shape schedule with in-training primary-host eval/sampling, and
checkpoint save -> restart -> resume across both processes."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _mk_corpus(tmp_path):
    rs = np.random.RandomState(0)
    words = ["tok%d" % i for i in range(12)]
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["<pad>", "<unk>", "<eos>"] + words) + "\n")
    for name, n in (("train", 200), ("dev", 8)):
        lines = [" ".join(rs.choice(words, rs.randint(3, 8)))
                 for _ in range(n)]
        (tmp_path / (name + ".src")).write_text("\n".join(lines) + "\n")
        (tmp_path / (name + ".tgt")).write_text("\n".join(lines) + "\n")


def _run_workers(tmp_path, mode, max_steps, timeout=560):
    coordinator = "127.0.0.1:%d" % _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), str(tmp_path),
         mode, str(max_steps)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "WORKER_OK" in out, out[-3000:]
    return outs


def test_two_process_training(tmp_path):
    _mk_corpus(tmp_path)
    _run_workers(tmp_path, "batch", 12)
    # only process 0 writes checkpoints/records
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] >= 12
    assert os.path.exists(tmp_path / "out" / "checkpoint")


def test_two_process_token_bucketing_with_eval(tmp_path):
    """Token mode multi-host: the deterministic shared shape schedule
    keeps hosts in sync without communication, and the primary host runs
    mid-training eval + sampling with the score broadcast to all."""
    _mk_corpus(tmp_path)
    outs = _run_workers(tmp_path, "token", 16)
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] >= 16
    # the primary-host eval really ran and was recorded
    assert len(record["valid_script_scores"]) >= 1
    assert os.path.exists(tmp_path / "out" / "trans.txt")
    # both workers saw the broadcast score in their logs
    for out in outs:
        assert "BLEU" in out


def test_two_process_save_restart_resume(tmp_path):
    """Train 2-process to step 12 (saving at 6/12), restart both
    processes, and resume to step 20 from the shared checkpoint."""
    _mk_corpus(tmp_path)
    _run_workers(tmp_path, "batch", 12)
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] == 12

    outs = _run_workers(tmp_path, "batch", 20)
    for out in outs:
        assert "resumed_from=12" in out, out[-2000:]
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] == 20
    # the resumed run restored the step-12 checkpoint, not a fresh init
    for out in outs:
        assert "Restoring" in out, out[-2000:]


def test_two_process_zero1_save_eval_resume(tmp_path):
    """ZeRO-1 moments/EMA span both hosts, so checkpoint saves and the
    primary-host eval weight fetch must all-gather COLLECTIVELY
    (dist.host_fetchable) -- a primary-only jax.device_get on the
    cross-host-sharded state raises. Save -> restart -> resume proves
    the sharded state also round-trips through npz + re-device_put."""
    _mk_corpus(tmp_path)
    _run_workers(tmp_path, "zero1", 16)
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] >= 16
    # primary-host eval with the ZeRO-sharded EMA really ran
    assert len(record["valid_script_scores"]) >= 1

    outs = _run_workers(tmp_path, "zero1", 24)
    for out in outs:
        assert "resumed_from=16" in out, out[-2000:]
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] == 24
    # the resumed run restored the saved checkpoint, not a fresh init
    for out in outs:
        assert "Restoring" in out, out[-2000:]

"""Multi-host training integration test: 2 processes x 4 virtual CPU
devices train the copy task jointly via jax.distributed + GSPMD."""

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


def test_two_process_training(tmp_path):
    rs = np.random.RandomState(0)
    words = ["tok%d" % i for i in range(12)]
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["<pad>", "<unk>", "<eos>"] + words) + "\n")
    lines = [" ".join(rs.choice(words, rs.randint(3, 8)))
             for _ in range(200)]
    (tmp_path / "train.src").write_text("\n".join(lines) + "\n")
    (tmp_path / "train.tgt").write_text("\n".join(lines) + "\n")

    coordinator = "127.0.0.1:%d" % _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "WORKER_OK" in out, out[-3000:]

    # only process 0 writes checkpoints/records
    record = json.load(open(tmp_path / "out" / "record.json"))
    assert record["step"] >= 12
    assert os.path.exists(tmp_path / "out" / "checkpoint")

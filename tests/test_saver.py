"""Saver tests: latest-k rolloff, best-k ledger semantics, partial restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from zero_tpu.saver import Saver, _read_index


def _tree(val):
    return {"a": np.full((3,), val, np.float32),
            "nested": {"b": np.full((2,), val * 10, np.float32)}}


def test_latest_k_rolloff(tmp_path):
    s = Saver(checkpoints=2, output_dir=str(tmp_path))
    for step in [10, 20, 30]:
        s.save({"params": _tree(step)}, step)
    names = _read_index(str(tmp_path))
    assert names == ["model-20", "model-30"]
    assert not os.path.exists(tmp_path / "model-10.npz")


def test_best_k_ledger(tmp_path):
    s = Saver(checkpoints=5, output_dir=str(tmp_path), best_checkpoints=2)
    s.save({"params": _tree(1)}, 10, metric_score=10.0)
    s.save({"params": _tree(2)}, 20, metric_score=5.0)   # worse, still top-2
    s.save({"params": _tree(3)}, 30, metric_score=12.0)  # evicts 5.0
    ledger = open(tmp_path / "best" / "topk_checkpoint").read().splitlines()
    names = [line.split("\t")[0] for line in ledger]
    assert names == ["model-10", "model-30"]
    assert not os.path.exists(tmp_path / "best" / "model-20.npz")
    assert s.best_score == 12.0
    # metric.log records improvements only
    log = open(tmp_path / "best" / "metric.log").read()
    assert "10.0" in log and "12.0" in log and "5.0" not in log


def test_resume_best_score_from_metric_log(tmp_path):
    s = Saver(checkpoints=2, output_dir=str(tmp_path))
    s.save({"params": _tree(1)}, 10, metric_score=33.5)
    s2 = Saver(checkpoints=2, output_dir=str(tmp_path))
    assert s2.best_score == 33.5
    assert s2.topk_scores == [("model-10", 33.5)]


def test_partial_restore_keeps_missing(tmp_path, caplog):
    s = Saver(checkpoints=2, output_dir=str(tmp_path))
    s.save({"params": _tree(7)}, 10)
    # template with an extra leaf the checkpoint doesn't have
    template = _tree(0)
    template["extra"] = np.full((4,), -1.0, np.float32)
    restored = s.restore({"params": template})["params"]
    np.testing.assert_allclose(restored["a"], np.full((3,), 7.0))
    np.testing.assert_allclose(restored["extra"], np.full((4,), -1.0))


def test_restore_shape_mismatch_keeps_model_value(tmp_path):
    s = Saver(checkpoints=2, output_dir=str(tmp_path))
    s.save({"params": {"w": np.ones((4,), np.float32)}}, 10)
    template = {"w": np.zeros((6,), np.float32)}
    restored = s.restore({"params": template})["params"]
    assert restored["w"].shape == (6,)
    np.testing.assert_allclose(restored["w"], 0.0)


def test_restore_no_checkpoint_returns_template(tmp_path):
    s = Saver(checkpoints=2, output_dir=str(tmp_path / "empty"))
    template = {"w": np.ones((2,), np.float32)}
    restored = s.restore({"params": template})["params"]
    np.testing.assert_allclose(restored["w"], 1.0)


def test_async_save_and_restore(tmp_path):
    """Async saves land on disk (serialised), restore waits for them."""
    import jax.numpy as jnp
    s = Saver(checkpoints=3, output_dir=str(tmp_path), async_save=True)
    tree = {"w": jnp.ones((64, 64)), "b": jnp.zeros((8,))}
    for step in [10, 20]:
        s.save({"params": tree}, step, metric_score=float(step))
    restored = s.restore({"params": {"w": np.zeros((64, 64), np.float32),
                                     "b": np.ones((8,), np.float32)}})
    np.testing.assert_allclose(restored["params"]["w"], 1.0)
    np.testing.assert_allclose(restored["params"]["b"], 0.0)
    s.wait()
    assert _read_index(str(tmp_path)) == ["model-10", "model-20"]
    assert s.best_score == 20.0


def test_early_stop_patience_counts_exact_ties():
    """A score exactly equal to the historical best must NOT reset patience:
    the reference requires strict improvement (main.py:389-397)."""
    from zero_tpu.recorder import Recorder
    from zero_tpu.train import record_eval_score

    rec = Recorder()
    rec.history_scores = []
    rec.valid_script_scores = []
    rec.bad_counter = 0
    rec.estop = False

    assert not record_eval_score(rec, 100, 10.0, estop_patience=2)
    assert rec.bad_counter == 0
    # plateau: exact ties increment the counter
    assert not record_eval_score(rec, 200, 10.0, estop_patience=2)
    assert rec.bad_counter == 1
    assert not record_eval_score(rec, 300, 10.0, estop_patience=2)
    assert rec.bad_counter == 2
    assert record_eval_score(rec, 400, 10.0, estop_patience=2)
    assert rec.estop
    # strict improvement resets
    rec2 = Recorder()
    rec2.history_scores = []
    rec2.valid_script_scores = []
    rec2.bad_counter = 0
    rec2.estop = False
    record_eval_score(rec2, 100, 10.0, estop_patience=2)
    record_eval_score(rec2, 200, 9.0, estop_patience=2)
    assert rec2.bad_counter == 1
    record_eval_score(rec2, 300, 10.5, estop_patience=2)
    assert rec2.bad_counter == 0
    assert rec2.valid_script_scores == [[100, 10.0], [200, 9.0], [300, 10.5]]


def test_sharded_checkpoint_reassembly_and_sharded_save(tmp_path):
    """sharded-v1 format: (a) a hand-crafted 2-host checkpoint restores
    on one host by assembling the shards; (b) a single-process sharded
    save round-trips exactly (leaves are fully addressable, so they land
    under bare keys)."""
    import json as _json

    from zero_tpu.saver import (load_checkpoint_sharded,
                                save_checkpoint_sharded)

    # (a) two shard files, one leaf split by rows across "hosts"
    full = np.arange(32, dtype=np.float32).reshape(8, 4)
    d = tmp_path / "a"
    os.makedirs(d)
    np.savez(d / "model-5.shard0.npz", **{"params/w@0:4,0:4": full[:4]})
    np.savez(d / "model-5.shard1.npz", **{"params/w@4:8,0:4": full[4:]})
    with open(d / "model-5.shardmeta.json", "w") as w:
        _json.dump({"format": "sharded-v1", "nproc": 2,
                    "keys": {"params/w": [8, 4]}}, w)
    with open(d / "checkpoint", "w") as w:
        _json.dump({"latest": "model-5", "all": ["model-5"]}, w)

    saver = Saver(output_dir=str(d))
    out = saver.restore({"params": {"w": np.zeros((8, 4), np.float32)}})
    np.testing.assert_array_equal(out["params"]["w"], full)

    # missing key keeps the template (partial-restore semantics)
    out2 = saver.restore({"params": {"w": np.zeros((8, 4), np.float32),
                                     "extra": np.ones((2,), np.float32)}})
    np.testing.assert_array_equal(out2["params"]["extra"], np.ones((2,)))

    # (b) single-process sharded save -> restore round trip
    d2 = str(tmp_path / "b")
    trees = {"params": {"w": jnp.asarray(full), "b": jnp.zeros((4,))},
             "opt": None}
    save_checkpoint_sharded(d2, "model-7", trees)
    got = load_checkpoint_sharded(os.path.join(d2, "model-7"),
                                  {"params": {"w": jnp.zeros((8, 4)),
                                              "b": jnp.ones((4,))},
                                   "opt": None})
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), full)
    np.testing.assert_array_equal(np.asarray(got["params"]["b"]),
                                  np.zeros((4,)))
    assert got["opt"] is None


def test_saver_sharded_latest_and_eviction(tmp_path):
    """Saver(sharded=True) keeps the rolling index over shard files and
    evicts whole shard groups."""
    saver = Saver(checkpoints=2, output_dir=str(tmp_path), sharded=True)
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}}
    for step in (1, 2, 3):
        saver.save(dict(tree), step)
    saver.wait()
    names = _read_index(str(tmp_path))
    assert names == ["model-2", "model-3"]
    files = os.listdir(tmp_path)
    assert "model-1.shard0.npz" not in files
    assert "model-1.shardmeta.json" not in files
    assert "model-3.shard0.npz" in files
    restored = saver.restore({"params": {"w": jnp.zeros((2, 3))}})
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))

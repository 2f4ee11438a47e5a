"""Checkpointing: rolling latest-k + best-k-by-metric with a top-k ledger.

Behavioral counterpart of reference utils/saver.py:11-171:
  * latest-k checkpoints in output_dir, best-k in output_dir/best
  * ``topk_checkpoint`` ledger (name\\tscore lines) and ``metric.log``
    best-score history
  * param.json/record.json copied into best/ on improvement
  * name-based partial restore when the stored tree and the model tree
    differ (the reference's backup-restore path, saver.py:150-171)

Format: one .npz per checkpoint holding the flattened state pytree keyed by
tree path ('params/encoder/0/...', 'opt/...', 'ema/...', 'step'), plus a
``checkpoint`` JSON index per directory. Portable, dependency-free, and
mesh-agnostic (arrays are fetched to host on save, resharded on restore).
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from typing import List, Optional, Tuple

import jax
import numpy as np

log = logging.getLogger("zero_tpu.saver")


def _flatten(tree, prefix: str) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        flat[prefix + "/" + "/".join(parts)] = np.asarray(leaf)
    return flat


def _unflatten_into(template, saved: dict, prefix: str):
    """Fill a template pytree from saved arrays by path; keep the template
    value (with a warning) when a path is missing -- name-based partial
    restore."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        key = prefix + "/" + "/".join(parts)
        if key in saved:
            arr = saved[key]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
                log.warning("shape mismatch for %s: saved %s vs model %s; "
                            "keeping model value", key, arr.shape, leaf.shape)
                leaves.append(leaf)
            else:
                leaves.append(arr.astype(leaf.dtype)
                              if hasattr(leaf, "dtype") else arr)
        else:
            log.warning("%s missed in checkpoint", key)
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _read_index(directory: str) -> List[str]:
    path = os.path.join(directory, "checkpoint")
    if not os.path.exists(path):
        return []
    with open(path) as r:
        return json.load(r).get("all", [])


def _write_index(directory: str, names: List[str]) -> None:
    with open(os.path.join(directory, "checkpoint"), "w") as w:
        json.dump({"latest": names[-1] if names else None, "all": names}, w,
                  indent=2)


def save_checkpoint_file(directory: str, name: str, state_trees: dict) -> str:
    os.makedirs(directory, exist_ok=True)
    flat = {}
    for prefix, tree in state_trees.items():
        if tree is None:
            continue
        flat.update(_flatten(jax.device_get(tree), prefix))
    path = os.path.join(directory, name + ".npz")
    with open(path, "wb") as f:
        np.savez(f, **flat)
    return path


def load_checkpoint_file(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class Saver:
    """Latest-k + best-k checkpoint manager (reference utils/saver.py)."""

    def __init__(self, checkpoints: int = 5, output_dir: Optional[str] = None,
                 best_score: float = -1.0, best_checkpoints: int = 1,
                 async_save: bool = False):
        self.output_dir = output_dir or "./output"
        self.output_best_dir = os.path.join(self.output_dir, "best")
        self.max_keep = checkpoints
        self.best_checkpoints = best_checkpoints
        self.best_score = best_score
        # async mode: the device->host fetch + npz write run on a worker
        # thread over an ON-DEVICE SNAPSHOT (jnp.copy), so the training
        # loop's donated buffers are never touched after save() returns
        self.async_save = async_save
        self._pending = None

        # resume best score from metric.log
        metric_path = os.path.join(self.output_best_dir, "metric.log")
        if os.path.exists(metric_path):
            lines = open(metric_path).read().strip().splitlines()
            if lines:
                self.best_score = float(lines[-1].strip().split()[-1])

        # resume topk ledger
        self.topk_scores: List[Tuple[str, float]] = []
        topk_path = os.path.join(self.output_best_dir, "topk_checkpoint")
        if os.path.exists(topk_path):
            with open(topk_path) as r:
                for line in r:
                    name, score = line.strip().split("\t")
                    self.topk_scores.append((name, float(score)))

    def wait(self) -> None:
        """Block until a pending async save has finished."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def save(self, state_trees: dict, step: int,
             metric_score: Optional[float] = None) -> None:
        """state_trees: {'params': ..., 'opt': ..., 'ema': ..., 'extra': ...}

        With async_save, bookkeeping happens inline but the device->host
        fetch and file writes run on a worker thread over an on-device
        snapshot; saves are serialised (at most one in flight)."""
        if self.async_save:
            import threading

            import jax
            import jax.numpy as jnp

            self.wait()
            snapshot = jax.tree.map(
                lambda a: jnp.copy(a) if hasattr(a, "dtype") else a,
                state_trees)
            self._pending = threading.Thread(
                target=self._save_sync, args=(snapshot, step, metric_score),
                daemon=True)
            self._pending.start()
            return
        self._save_sync(state_trees, step, metric_score)

    def _save_sync(self, state_trees: dict, step: int,
                   metric_score: Optional[float] = None) -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        os.makedirs(self.output_best_dir, exist_ok=True)

        name = "model-%d" % int(step)
        save_checkpoint_file(self.output_dir, name, state_trees)
        names = [n for n in _read_index(self.output_dir) if n != name] + [name]
        while len(names) > self.max_keep:
            victim = names.pop(0)
            victim_path = os.path.join(self.output_dir, victim + ".npz")
            if os.path.exists(victim_path):
                os.remove(victim_path)
        _write_index(self.output_dir, names)

        if metric_score is not None and metric_score > self.best_score:
            self.best_score = metric_score
            for fname in ("param.json", "record.json"):
                src = os.path.join(self.output_dir, fname)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(self.output_best_dir, fname))
            with open(os.path.join(self.output_best_dir, "metric.log"),
                      "a") as w:
                w.write("Steps {}, Metric Score {}\n".format(step,
                                                             metric_score))

        if metric_score is not None and (
                len(self.topk_scores) < self.best_checkpoints
                or metric_score > min(v[1] for v in self.topk_scores)):
            save_checkpoint_file(self.output_best_dir, name, state_trees)
            self.topk_scores.append((name, float(metric_score)))
            self.topk_scores = sorted(
                self.topk_scores, key=lambda x: x[1])[-self.best_checkpoints:]
            # evict checkpoints that fell out of the top-k
            keep = {n for n, _ in self.topk_scores}
            for fname in os.listdir(self.output_best_dir):
                if fname.endswith(".npz") and fname[:-4] not in keep:
                    os.remove(os.path.join(self.output_best_dir, fname))
            _write_index(self.output_best_dir,
                         [n for n, _ in self.topk_scores])
            with open(os.path.join(self.output_best_dir, "topk_checkpoint"),
                      "w") as w:
                for n, s in self.topk_scores:
                    w.write("{}\t{}\n".format(n, s))

    def latest_path(self, path: Optional[str] = None) -> Optional[str]:
        check_dir = path if (path and os.path.exists(path)) else self.output_dir
        names = _read_index(check_dir)
        if not names:
            return None
        return os.path.join(check_dir, names[-1] + ".npz")

    def restore(self, templates: dict, path: Optional[str] = None):
        """Restore trees matching ``templates`` ({'params': tree, ...}) from
        the latest checkpoint in ``path`` or output_dir. Returns dict of
        restored trees (templates unchanged if no checkpoint found)."""
        self.wait()
        ckpt = self.latest_path(path)
        if ckpt is None:
            log.warning("No existing model detected")
            return templates
        log.info("Restoring from %s", ckpt)
        saved = load_checkpoint_file(ckpt)
        return {prefix: (_unflatten_into(tree, saved, prefix)
                         if tree is not None else None)
                for prefix, tree in templates.items()}

"""LR schedule zoo tests against the reference formulas (lrs/*.py)."""

import math

import pytest

from zero_tpu import lrs
from zero_tpu.config import default_config


def _cfg(**over):
    cfg = default_config()
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg


def test_noam_formula():
    s = lrs.NoamDecayLr(2.0, 0.0, 1e9, warmup_steps=400, hidden_size=512)
    for step in [0, 100, 399, 400, 1000, 10000]:
        s.step(step)
        expected = 2.0 * (512 ** -0.5) * min((step + 1) * 400 ** -1.5,
                                             (step + 1) ** -0.5)
        assert abs(s.get_lr() - expected) < 1e-12


def test_noam_peak_at_warmup():
    s = lrs.NoamDecayLr(1.0, 0.0, 1e9, warmup_steps=4000, hidden_size=512)
    vals = []
    for step in [1000, 3999, 4000, 8000]:
        s.step(step)
        vals.append(s.get_lr())
    assert vals[1] > vals[0]        # rising through warmup
    assert vals[3] < vals[2]        # decaying after


def test_gnmtp_warmup_and_decay():
    s = lrs.GNMTPDecayLr(1.0, 0.0, 1e9, warmup_steps=400, nstable=4,
                         lrdecay_start=600000, lrdecay_end=1200000)
    s.step(0)
    lr0 = s.get_lr()
    s.step(400)
    lr_peak = s.get_lr()
    assert lr_peak > lr0             # ramped toward x nstable
    assert abs(lr_peak - 1.0 * min(1 + 400 * 3 / 1600, 4)) < 1e-9
    s.step(1000000)
    assert s.get_lr() < lr0          # decayed far past the start


def test_epoch_decay():
    s = lrs.EpochDecayLr(1.0, 0.0, 1e9, decay=0.5)
    s.after_epoch(eidx=3)
    assert abs(s.get_lr() - 0.125) < 1e-12


def test_score_decay_patience_and_resume():
    s = lrs.ScoreDecayLr(1.0, 0.0, 1e9, decay=0.5, patience=2)
    s.after_eval(10.0)   # best
    s.after_eval(9.0)    # bad 1
    assert s.get_lr() == 1.0
    s.after_eval(8.0)    # bad 2 -> decay
    assert s.get_lr() == 0.5
    # history replay reproduces the same state (scorelr.py:30-32)
    s2 = lrs.ScoreDecayLr(1.0, 0.0, 1e9, history_scores=[10.0, 9.0, 8.0],
                          decay=0.5, patience=2)
    assert s2.get_lr() == 0.5
    assert s2.bad_counter == s.bad_counter


def test_cosine_warmup_then_restarts():
    s = lrs.CosineDecayLr(0.1, 0.0, 1.0, warmup_steps=100, decay=0.5,
                          t_mult=1, update_period=1000)
    s.step(50)
    warm = s.get_lr()
    assert 0.1 < warm < 1.0
    s.step(100)   # start of the first cosine period: max_lr
    assert abs(s.get_lr() - 1.0) < 1e-9
    s.step(600)   # mid-period: halfway of the cosine
    assert abs(s.get_lr() - 0.5) < 1e-9
    s.step(1100)  # second period: shrunk by decay
    assert abs(s.get_lr() - 0.5) < 1e-9  # restart peak = 1.0 * 0.5


def test_vanilla_and_clamp():
    s = lrs.VanillaLr(5.0, 0.0, 2.0)
    assert s.get_lr() == 2.0  # clamped to max


def test_factory_dispatch():
    for name, cls in [("noam", lrs.NoamDecayLr), ("gnmt+", lrs.GNMTPDecayLr),
                      ("epoch", lrs.EpochDecayLr), ("score", lrs.ScoreDecayLr),
                      ("vanilla", lrs.VanillaLr),
                      ("cosine", lrs.CosineDecayLr)]:
        cfg = _cfg(lrate_strategy=name)
        assert isinstance(lrs.get_lr(cfg), cls)
    with pytest.raises(NotImplementedError):
        lrs.get_lr(_cfg(lrate_strategy="nope"))

"""IBDecoder tests: target interleaving, unfold round-trip, pair-causal
masking, cached pair decode == full recompute, pair beam search."""

import jax
import jax.numpy as jnp
import numpy as np

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.models.transformer_ibdecoder import (interleave_target,
                                                   pair_causal_mask, unfold)
from zero_tpu.search import ib_beam_search
from tests.helpers import tiny_config, toy_batch

EOS = 2


def test_interleave_structure():
    # y = [5, 6, 7, 8, 9] + eos, padded
    tgt = jnp.asarray([[5, 6, 7, 8, 9, EOS, 0, 0]], jnp.int32)
    z = np.asarray(interleave_target(tgt, EOS))[0]
    # l2r: 5 6 7 eos ; r2l: 9 8 eos
    assert list(z[:8]) == [5, 9, 6, 8, 7, EOS, EOS, 0]


def test_interleave_single_token():
    tgt = jnp.asarray([[5, EOS, 0, 0]], jnp.int32)
    z = np.asarray(interleave_target(tgt, EOS))[0]
    # l2r: 5 eos ; r2l: eos
    assert list(z[:4]) == [5, EOS, EOS, 0]


def test_interleave_unfold_roundtrip():
    rs = np.random.RandomState(0)
    for _ in range(20):
        n = rs.randint(1, 12)
        y = list(rs.randint(3, 20, n))
        tgt = jnp.asarray([y + [EOS] + [0] * (14 - n)], jnp.int32)
        z = np.asarray(interleave_target(tgt, EOS))[0]
        assert unfold(z, EOS) == y


def test_pair_causal_mask():
    m = np.asarray(pair_causal_mask(6))[0, 0]
    # members of a pair see each other and everything before
    assert m[0, 1] == 1 and m[1, 0] == 1
    assert m[2, 3] == 1 and m[2, 0] == 1
    assert m[1, 2] == 0 and m[3, 4] == 0


def _setup():
    cfg = tiny_config(model_name="transformer_ibdecoder")
    model = get_model("transformer_ibdecoder")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    return cfg, model, params


def test_train_and_score_finite():
    cfg, model, params = _setup()
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    loss = float(model.train_fn(params, feats, cfg,
                                jax.random.PRNGKey(1))["loss"])
    assert np.isfinite(loss) and loss > 0
    score = model.score_fn(params, feats, cfg)["score"]
    assert np.isfinite(np.asarray(score)).all()


def test_pair_decode_matches_full_recompute():
    """Cached pair steps must emit the same logits as the full causal
    recompute over the z buffer (the dev-mode oracle, pairwise)."""
    cfg, model, params = _setup()
    feats = {k: jnp.asarray(v) for k, v in toy_batch(batch=2).items()}
    source = feats["source"]
    z = interleave_target(feats["target"], EOS)
    z_len = z.shape[1]

    inf = model.infer_fn(cfg)
    state = inf.encode(params, source)
    cache = inf.init_cache(params, state, 2, z_len)

    for i in range(z_len // 2):
        prev = z[:, max(2 * i - 2, 0):max(2 * i - 2, 0) + 2] \
            if i > 0 else jnp.zeros((2, 2), jnp.int32)
        logits_step, cache = inf.decode_pair(params, prev, state, cache,
                                             jnp.asarray(i))
        logits_full = inf.decode_prefix(params, z, state, jnp.asarray(i))
        np.testing.assert_allclose(np.asarray(logits_step),
                                   np.asarray(logits_full),
                                   rtol=1e-4, atol=1e-4)


def test_ib_beam_search_runs_and_unfolds():
    cfg, model, params = _setup()
    src = jnp.asarray(toy_batch(batch=3)["source"])
    out = ib_beam_search(params, src, model.infer_fn(cfg), cfg)
    assert out["seq"].shape[:2] == (3, cfg.beam_size)
    s = np.asarray(out["score"])
    assert (np.diff(s, axis=1) <= 1e-6).all()
    y = unfold(np.asarray(out["seq"])[0, 0], EOS)
    assert isinstance(y, list)


def test_ib_decode_fn_integration():
    from zero_tpu.train import make_decode_fn
    cfg, model, params = _setup()
    decode = make_decode_fn(cfg, model)
    batch = {"src": toy_batch(batch=2)["source"]}
    out = decode(params, batch)
    assert out["seq"].shape[0] == 2
    assert out["seq"].dtype == np.int32

"""ROBT tests: in-graph greedy decode vs a prefix-recompute oracle, the
augmented batch's shape/tag invariants, and the full robt train step."""

import jax
import jax.numpy as jnp
import numpy as np

import zero_tpu.models  # noqa: F401
from zero_tpu import robt
from zero_tpu.models.base import get_model
from zero_tpu.parallel import init_train_state, make_train_step
from tests.helpers import tiny_config, toy_batch

LANG_OFFSET = 3
NUM_LANGS = 2


def _cfg(**over):
    over.setdefault("model_name", "transformer_multilingual")
    return tiny_config(num_languages=NUM_LANGS, lang_id_offset=LANG_OFFSET,
                       **over)


def _ml_batch(batch=4, src_len=7, tgt_len=6):
    b = toy_batch(batch=batch, src_len=src_len, tgt_len=tgt_len)
    # leading target-language tag on the source
    b["source"][:, 0] = LANG_OFFSET + np.arange(batch) % NUM_LANGS
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_greedy_decode_matches_prefix_oracle():
    """Cache-based greedy == greedy over decode_prefix full recomputes."""
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = _ml_batch()["source"]
    inf = model.infer_fn(cfg)
    out_len = 6

    got = np.asarray(robt.greedy_decode(params, src, inf, cfg, out_len))

    # oracle: recompute the full decoder on the [B, T] prefix buffer each
    # step (dev-mode path), argmax with the same eos rules
    eos = cfg.tgt_vocab.eos()
    state = inf.encode(params, src)
    buf = np.zeros((src.shape[0], out_len), np.int32)
    done = np.zeros((src.shape[0],), bool)
    for t in range(out_len):
        logits = np.array(
            inf.decode_prefix(params, jnp.asarray(buf), state, t),
            np.float32, copy=True)
        if t < 1:
            logits[:, eos] = np.finfo(np.float32).min
        nxt = np.where(done, 0, logits.argmax(-1)).astype(np.int32)
        done |= nxt == eos
        buf[:, t] = nxt
    np.testing.assert_array_equal(got, buf)


def test_greedy_rows_are_source_shaped():
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = _ml_batch()["source"]
    toks = np.asarray(
        robt.greedy_decode(params, src, model.infer_fn(cfg), cfg, 8))
    eos = cfg.tgt_vocab.eos()
    for row in toks:
        hit = np.where(row == eos)[0]
        if hit.size:  # nothing but pad after the first eos
            np.testing.assert_array_equal(row[hit[0] + 1:], 0)


def test_augment_shapes_and_tags():
    cfg = _cfg()
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _ml_batch()
    aug = robt.make_augment(model, cfg)
    bt = jax.jit(aug)(params, feats, jax.random.PRNGKey(5))
    assert bt["source"].shape == feats["source"].shape
    np.testing.assert_array_equal(np.asarray(bt["target"]),
                                  np.asarray(feats["target"]))
    # synthetic sources keep the ORIGINAL direction tag
    np.testing.assert_array_equal(np.asarray(bt["source"][:, 0]),
                                  np.asarray(feats["source"][:, 0]))
    # all-pad target rows give all-pad synthetic rows
    feats_pad = dict(feats)
    feats_pad["target"] = feats["target"].at[1].set(0)
    bt_pad = jax.jit(aug)(params, feats_pad, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(bt_pad["source"][1]), 0)


def test_robt_train_step_runs_and_learns():
    cfg = _cfg(robt=True)
    model = get_model("transformer_multilingual")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, donate=False)
    feats = _ml_batch()
    batch = {k: v[None] for k, v in feats.items()}
    s1, m1 = step(state, batch, 1e-3, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    # params moved and the step is deterministic for a fixed rng
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s1.params)))
    assert moved
    _, m1b = step(state, batch, 1e-3, jax.random.PRNGKey(1))
    assert float(m1["loss"]) == float(m1b["loss"])


def test_robt_weight_zero_keeps_main_loss_scale():
    """robt_weight=0: total loss reduces to the real batch's loss value
    (computed with the robt rng split)."""
    cfg = _cfg(robt=True, robt_weight=0.0, dropout=0.0,
               residual_dropout=0.0, relu_dropout=0.0,
               attention_dropout=0.0)
    model = get_model("transformer_multilingual")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = _ml_batch()
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, donate=False)
    batch = {k: v[None] for k, v in feats.items()}
    _, metrics = step(state, batch, 0.0, jax.random.PRNGKey(1))
    r_main, _, _ = jax.random.split(jax.random.PRNGKey(1), 3)
    expect = float(model.train_fn(state.params, feats, cfg, r_main,
                                  step=0)["loss"])
    assert abs(float(metrics["loss"]) - expect) < 1e-5

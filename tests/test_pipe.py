"""Pipeline parallelism (GPipe schedule over a 'pipe' mesh axis).

An extension the reference lacks (its only parallelism is single-host
DP, SURVEY §2.3); the equivalence target is this framework's own
stacked-scan path: with dropout off, the pipelined train loss and
grads must match the plain lax.scan over the same [L, ...] stacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from zero_tpu.models.base import get_model
from zero_tpu.parallel import ring
from zero_tpu.parallel import pipe as pipe_mod
from zero_tpu.parallel.mesh import make_mesh, param_sharding
from tests.helpers import tiny_config, toy_batch


def _mesh(cfg):
    need = (cfg.mesh_data * cfg.mesh_model
            * getattr(cfg, "mesh_seq", 1) * cfg.mesh_pipe)
    if len(jax.devices()) < need:
        pytest.skip("needs %d devices" % need)
    return make_mesh(cfg)


def _cfg(**over):
    base = dict(dropout=0.0, relu_dropout=0.0, residual_dropout=0.0,
                attention_dropout=0.0, scan_layers=True,
                num_encoder_layer=4, num_decoder_layer=4)
    base.update(over)
    return tiny_config(**base)


def _loss_and_grads(model, params, feats, cfg, rng):
    loss = model.train_fn(params, feats, cfg, rng, step=0)["loss"]
    grads = jax.grad(
        lambda p: model.train_fn(p, feats, cfg, rng, step=0)["loss"])(params)
    return float(loss), grads


@pytest.mark.parametrize("microbatches", [0, 4])
@pytest.mark.parametrize("use_remat", [False, True])
def test_pipeline_matches_scan(microbatches, use_remat):
    cfg = _cfg(mesh_data=2, mesh_model=2, mesh_pipe=2,
               pp_microbatches=microbatches, use_remat=use_remat)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v)
             for k, v in toy_batch(batch=4, src_len=8, tgt_len=8).items()}
    rng = jax.random.PRNGKey(1)

    dense_loss, dense_g = _loss_and_grads(model, params, feats, cfg, rng)
    mesh = _mesh(cfg)
    ring.set_active_mesh(mesh)
    try:
        assert pipe_mod.pipe_degree() == 2
        pp_loss, pp_g = _loss_and_grads(model, params, feats, cfg, rng)
    finally:
        ring.set_active_mesh(None)

    np.testing.assert_allclose(pp_loss, dense_loss, atol=1e-6)
    errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        pp_g, dense_g)
    assert max(jax.tree.leaves(errs)) < 1e-6


@pytest.mark.parametrize("model_name", ["transformer", "transformer_fuse",
                                        "transformer_aan",
                                        "transformer_l0drop",
                                        "transformer_rela",
                                        "transformer_rpr"])
def test_pipeline_with_seq_matches_scan(model_name):
    """SP inside PP: the combined {'pipe','seq'} manual region (ring
    self-attention / seq-parallel AAN prefix mean on seq-local blocks)
    must reproduce the plain stacked scan's loss and grads exactly
    (dropout off). Covers ring-capable self-attention (transformer),
    the merged-attention AAN epilogue (fuse), the AAN block (aan), and
    post_encode composition (l0drop)."""
    cfg = _cfg(mesh_data=2, mesh_model=1, mesh_pipe=2, mesh_seq=2,
               model_name=model_name, scope_name=model_name)
    model = get_model(model_name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v)
             for k, v in toy_batch(batch=4, src_len=8, tgt_len=8).items()}
    rng = jax.random.PRNGKey(1)

    dense_loss, dense_g = _loss_and_grads(model, params, feats, cfg, rng)
    mesh = _mesh(cfg)
    ring.set_active_mesh(mesh)
    try:
        assert pipe_mod.pipe_degree() == 2 and ring.seq_degree() == 2
        pp_loss, pp_g = _loss_and_grads(model, params, feats, cfg, rng)
    finally:
        ring.set_active_mesh(None)

    np.testing.assert_allclose(pp_loss, dense_loss, atol=2e-6, rtol=2e-6)
    errs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        pp_g, dense_g)
    assert max(jax.tree.leaves(errs)) < 5e-6


def test_pipeline_with_seq_bf16_compiles():
    """bf16-compute SP-in-PP smoke: a bf16 leaf left seq-INVARIANT gets
    its cotangent psum'ed over 'seq' in bf16 at the checkpoint/scan
    transpose boundary, which crashes XLA CPU's AllReducePromotion pass
    outright ("Invalid binary instruction opcode copy", jaxlib 0.9.0) —
    pipe.py therefore pcasts params/consts to seq-varying on the fp32
    side (_vary_seq). A compile+run in the dryrun's bf16 configuration
    pins that: the failure mode is a process abort, not a wrong value."""
    cfg = _cfg(mesh_data=2, mesh_model=1, mesh_pipe=2, mesh_seq=2,
               use_remat=True, default_dtype="bfloat16")
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v)
             for k, v in toy_batch(batch=4, src_len=8, tgt_len=8).items()}
    rng = jax.random.PRNGKey(1)
    mesh = _mesh(cfg)
    ring.set_active_mesh(mesh)
    try:
        assert pipe_mod.pipe_degree() == 2 and ring.seq_degree() == 2
        # jit is required here (remat's closed_call cannot evaluate
        # eagerly inside shard_map) and matches how the train step
        # actually runs
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: model.train_fn(p, feats, cfg, rng,
                                     step=0)["loss"]))(params)
    finally:
        ring.set_active_mesh(None)
    assert np.isfinite(loss)
    assert all(np.all(np.isfinite(g)) for g in jax.tree.leaves(grads))


def test_pipeline_dropout_on_trains():
    """Dropout-on PP: masks differ from the dense run by design (per-
    microbatch keys); the loss must stay finite and the grads nonzero."""
    cfg = _cfg(mesh_data=1, mesh_model=1, mesh_pipe=2,
               dropout=0.1, attention_dropout=0.1, residual_dropout=0.1,
               relu_dropout=0.1)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v)
             for k, v in toy_batch(batch=4, src_len=8, tgt_len=8).items()}
    mesh = _mesh(cfg)
    ring.set_active_mesh(mesh)
    try:
        loss, grads = _loss_and_grads(model, params, feats, cfg,
                                      jax.random.PRNGKey(1))
    finally:
        ring.set_active_mesh(None)
    assert np.isfinite(loss)
    norms = [float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)]
    assert sum(norms) > 0 and all(np.isfinite(n) for n in norms)


def test_pipe_eligibility_fallbacks():
    cfg = _cfg(mesh_data=2, mesh_model=1, mesh_pipe=4)
    mesh = _mesh(cfg)
    ring.set_active_mesh(mesh)
    try:
        assert pipe_mod.pipe_degree() == 4
        assert pipe_mod.pipe_eligible(4, 8, 0)
        assert not pipe_mod.pipe_eligible(6, 8, 0)   # layers % pipe != 0
        assert not pipe_mod.pipe_eligible(4, 6, 0)   # batch % microbatches
        assert pipe_mod.pipe_eligible(8, 8, 8)
        assert not pipe_mod.pipe_eligible(8, 4, 8)   # batch < microbatches
    finally:
        ring.set_active_mesh(None)
    assert pipe_mod.pipe_degree() == 1
    assert not pipe_mod.pipe_eligible(4, 8, 0)       # no mesh -> scan


def test_param_sharding_pipe_shards_stacks():
    cfg = _cfg(mesh_data=2, mesh_model=2, mesh_pipe=2)
    mesh = _mesh(cfg)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    shardings = param_sharding(params, mesh)
    qkv = shardings["encoder"]["self"]["qkv"]["ws"][0].spec
    assert qkv[0] == "pipe" and qkv[-1] == "model"
    ln = shardings["decoder"]["ln1"]["scale"].spec
    assert ln[0] == "pipe"
    # non-stacked leaves stay off 'pipe'
    emb = shardings["src_embedding"].spec
    assert "pipe" not in tuple(emb)

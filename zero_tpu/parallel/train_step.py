"""The jitted SPMD training step: grads, accumulation, clipping, Adam, EMA.

Replaces the reference's tower graphs + feed_dict + cycle ops
(utils/cycle.py:47-135, utils/parallel.py:134-208, main.py:22-45):
  * gradient accumulation = lax.scan over stacked microbatches inside the
    step (update_cycle semantics: final grad/loss are means over cycles)
  * gradient averaging across data-parallel shards happens implicitly: the
    loss is a global mean under GSPMD, no explicit psum needed
  * clipping by global norm after averaging (cycle.py:97-101)
  * Adam with the learning rate passed from the host each step (the
    reference's lr placeholder, main.py:157,292)
  * optional EMA of weights (cycle.py:114-127)
  * safe_nan: skip the update in-graph when loss/gnorm is non-finite or
    gnorm exceeds gnorm_upper_bound (main.py:320-332)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zero_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: Optional[Any]  # EMA param tree or None
    step: jax.Array


def make_optimizer(cfg):
    return optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.epsilon)


def init_train_state(model, cfg, rng, mesh=None) -> TrainState:
    params = model.init_fn(rng, cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    ema = jax.tree.map(jnp.copy, params) if cfg.ema_decay > 0 else None
    state = TrainState(params=params, opt_state=opt_state, ema=ema,
                       step=jnp.zeros((), jnp.int32))
    if mesh is not None:
        pspec = mesh_lib.param_sharding(params, mesh)
        mspec = _moment_sharding(params, pspec, mesh, cfg)
        # ZeRO-3 (FSDP): the params THEMSELVES shard over 'data' (same
        # spec rule as the moments); GSPMD inserts the per-use weight
        # all-gathers in forward/backward and reduce-scatters the grads
        pspec_params = mspec if int(getattr(cfg, "zero_stage", 0)) >= 3 \
            else pspec
        state = TrainState(
            params=jax.device_put(params, pspec_params),
            opt_state=jax.device_put(opt_state,
                                     _opt_sharding(opt_state, mspec, mesh)),
            # EMA is param-shaped per-step state like the moments: it
            # shards ZeRO-style too (gathered transparently when eval
            # swaps it in / the saver fetches it to host)
            ema=jax.device_put(ema, mspec) if ema is not None else None,
            step=jax.device_put(state.step, mesh_lib.replicated(mesh)))
    return state


def _moment_sharding(params, param_sharding_tree, mesh, cfg):
    """Sharding tree for param-shaped optimizer moments: the param
    shardings, plus ZeRO-1 sharding over 'data' when zero_stage >= 1
    (mesh.py:zero1_sharding)."""
    if int(getattr(cfg, "zero_stage", 0)) >= 1:
        return mesh_lib.zero1_sharding(params, mesh, param_sharding_tree)
    return param_sharding_tree


def _opt_sharding(opt_state, moment_sharding_tree, mesh):
    """Adam m/v mirror the moment shardings; scalars replicated."""
    def mk(leaf):
        return mesh_lib.replicated(mesh)
    # ScaleByAdamState(count, mu, nu): mu/nu are param-shaped trees
    state = opt_state
    if isinstance(state, optax.ScaleByAdamState):
        return optax.ScaleByAdamState(
            count=mesh_lib.replicated(mesh),
            mu=moment_sharding_tree,
            nu=moment_sharding_tree)
    return jax.tree.map(mk, state)


def stack_microbatches(batches):
    """Stack update_cycle host feature dicts into [C, B, ...] arrays,
    padding each to the common per-dimension max (reference feeds per-GPU
    placeholders of independent shapes, main.py:268-294; one stacked scan
    input replaces them). Works for any key set / rank (text token
    matrices, audio feature tensors, masks)."""
    out = {}
    for k in batches[0]:
        arrs = [np.asarray(b[k]) for b in batches]
        ndim = arrs[0].ndim
        maxes = [max(a.shape[d] for a in arrs) for d in range(ndim)]
        padded = [np.pad(a, [(0, maxes[d] - a.shape[d]) for d in range(ndim)])
                  for a in arrs]
        out[k] = np.stack(padded, axis=0)
    return out


def make_train_step(model, cfg, mesh=None, donate: bool = True):
    """Build the jitted step:
    (state, batch, lr, rng) -> (state, metrics).

    ``batch`` leaves are [C, B, L] int32 with C = update_cycle (C=1 is a
    squeezed fast path inside the same function).
    """
    tx = make_optimizer(cfg)
    clip_norm = float(cfg.clip_grad_norm or 0.0)
    ema_decay = float(cfg.ema_decay)
    safe_nan = bool(cfg.safe_nan)
    gnorm_bound = float(cfg.gnorm_upper_bound)
    zstage = int(getattr(cfg, "zero_stage", 0)) if mesh is not None else 0
    dp_on = mesh is not None and int(mesh.shape.get("data", 1)) > 1
    zero1 = zstage >= 1 and dp_on
    # ZeRO-2 = ZeRO-1 + gradients pinned to the moment shard layout: the
    # DP reduction lowers to a reduce-scatter (each chip keeps only its
    # 1/data_par grad shard), the gnorm/clip/Adam math runs on shards,
    # and with gradient accumulation the scan CARRY itself is sharded,
    # so no replicated gradient tree ever persists. Params stay
    # replicated (that is stage 3's job).
    zero2 = zstage >= 2 and dp_on
    zero3 = zstage >= 3 and dp_on

    robt_on = bool(getattr(cfg, "robt", False))
    if robt_on:
        from zero_tpu import robt as robt_lib
        augment = robt_lib.make_augment(model, cfg)
        robt_weight = float(getattr(cfg, "robt_weight", 1.0))

    def loss_fn(params, feats, rng, step):
        if not robt_on:
            return model.train_fn(params, feats, cfg, rng, step=step)["loss"]
        # ROBT (robt.py): also train on the in-graph back-translated pair;
        # final loss = weighted mean of the real and synthetic batches
        r_main, r_bt, r_lang = jax.random.split(rng, 3)
        loss = model.train_fn(params, feats, cfg, r_main, step=step)["loss"]
        bt_feats = augment(params, feats, r_lang)
        bt_loss = model.train_fn(params, bt_feats, cfg, r_bt,
                                 step=step)["loss"]
        return (loss + robt_weight * bt_loss) / (1.0 + robt_weight)

    def step_fn(state: TrainState, batch, lr, rng):
        params = state.params
        cycles = next(iter(batch.values())).shape[0]

        zspec = pspec = None
        if zero1:
            pspec = mesh_lib.param_sharding(params, mesh,
                                            warn_unsharded=False)
            zspec = mesh_lib.zero1_sharding(params, mesh, pspec)

        grad_fn = jax.value_and_grad(loss_fn)

        if cycles == 1:
            feats = {k: v[0] for k, v in batch.items()}
            loss, grads = grad_fn(params, feats, rng, state.step)
        else:
            def micro(carry, xs):
                gsum, lsum = carry
                feats, key = xs
                l, g = grad_fn(params, feats, key, state.step)
                gsum = jax.tree.map(jnp.add, gsum, g)
                if zero2 and zspec is not None:
                    # ZeRO-2: the accumulator is sharded, so each
                    # microbatch grad reduce-scatters into it and the
                    # carried tree is 1/data_par per chip
                    gsum = jax.lax.with_sharding_constraint(gsum, zspec)
                return (gsum, lsum + l), None

            zero_g = jax.tree.map(jnp.zeros_like, params)
            if zero2 and zspec is not None:
                zero_g = jax.lax.with_sharding_constraint(zero_g, zspec)
            keys = jax.random.split(rng, cycles)
            (gsum, lsum), _ = jax.lax.scan(
                micro, (zero_g, jnp.zeros((), jnp.float32)), (batch, keys))
            grads = jax.tree.map(lambda g: g / cycles, gsum)
            loss = lsum / cycles

        if zero2 and zspec is not None:
            # ZeRO-2/3: pin the grads to the moment layout so the DP grad
            # reduction lowers to one reduce-scatter (each chip keeps only
            # its own shard) instead of all-reduce-then-slice; the
            # gnorm/clip below run on the shards (psum of partial squares)
            grads = jax.lax.with_sharding_constraint(grads, zspec)

        gnorm = optax.global_norm(grads)
        if clip_norm > 0:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, params)
        if zspec is not None and isinstance(new_opt_state,
                                            optax.ScaleByAdamState):
            # pin the ZeRO-1 moment layout through the step: without the
            # constraint GSPMD may re-replicate mu/nu, silently undoing
            # the memory saving. The Adam elementwise math then runs
            # sharded and the weight delta is all-gathered at the param
            # update below -- exactly the ZeRO-1 schedule.
            new_opt_state = optax.ScaleByAdamState(
                count=new_opt_state.count,
                mu=jax.lax.with_sharding_constraint(new_opt_state.mu, zspec),
                nu=jax.lax.with_sharding_constraint(new_opt_state.nu, zspec))
        new_params = jax.tree.map(
            lambda p, u: (p - lr * u.astype(p.dtype)), params, updates)
        if pspec is not None:
            # ZeRO-1: params come OUT replicated over 'data' -- the
            # weight-delta all-gather happens here, once, instead of
            # GSPMD propagating the sharded layout into the next step's
            # forward pass. ZeRO-3 (zero_stage>=3) keeps the params
            # SHARDED over 'data' (1/data_par per chip, FSDP): the
            # all-gather moves to each weight's point of use in the next
            # forward/backward, trading one collective per step for
            # per-chip param memory.
            new_params = jax.lax.with_sharding_constraint(
                new_params, zspec if zero3 else pspec)

        if safe_nan:
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm) \
                & (gnorm < gnorm_bound)
            new_params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params)
            new_opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt_state,
                state.opt_state)

        new_ema = state.ema
        if state.ema is not None:
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema, new_params)
            if zspec is not None:
                new_ema = jax.lax.with_sharding_constraint(new_ema, zspec)

        pnorm = optax.global_norm(new_params)
        metrics = {"loss": loss, "gnorm": gnorm, "pnorm": pnorm}
        return TrainState(params=new_params, opt_state=new_opt_state,
                          ema=new_ema, step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_score_step(model, cfg):
    """Jitted teacher-forced scoring: (params, feats) -> [B] scores."""
    @jax.jit
    def score(params, feats):
        return model.score_fn(params, feats, cfg)["score"]
    return score

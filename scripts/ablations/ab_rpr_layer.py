"""Full encoder-layer A/B: base vs RPR (one-hot form) fwd+bwd at bench
shapes, isolating where transformer_rpr_train's residual MFU gap lives
(the attention-core ablation ab_rpr.py shows +0.06 ms, but the full
model measures ~+49 ms/step over base)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import tiny_config
from zero_tpu.models import transformer as base
from zero_tpu.models import transformer_rpr as rpr_model


def rng_stream(rng):
    c = [0]

    def f():
        c[0] += 1
        return jax.random.fold_in(rng, c[0])
    return f


def main():
    cfg = tiny_config(hidden_size=512, embed_size=512, filter_size=2048,
                      num_heads=8, max_relative_position=16,
                      default_dtype="bfloat16",
                      dropout=0.1, attention_dropout=0.1, relu_dropout=0.1,
                      residual_dropout=0.1)
    B, L = 256, 128
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, L, 512), jnp.bfloat16)
    keep = jnp.ones((B, 1, L, L), jnp.float32)
    key = jax.random.PRNGKey(0)

    for name, init_fn, layer_fn in (
            ("base", base.init_enc_layer, base.enc_layer),
            ("rpr", rpr_model.init_enc_layer, rpr_model.enc_layer)):
        p = init_fn(key, cfg, 0)
        p = jax.tree.map(lambda a: a, p)

        def loss(p, x, rng, layer_fn=layer_fn):
            y = layer_fn(p, x, keep, cfg, rng_stream(rng))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0,)))
        o = g(p, x, key)
        float(jax.tree.leaves(o)[0].sum().astype(jnp.float32))
        t0 = time.perf_counter()
        for i in range(10):
            o = g(p, x, jax.random.fold_in(key, i))
        float(jax.tree.leaves(o)[0].sum().astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 10
        print("%-5s %7.3f ms/layer fwd+bwd" % (name, dt * 1e3))


if __name__ == "__main__":
    main()

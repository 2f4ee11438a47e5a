"""RPR attention-core variants, fwd+bwd on the chip at bench shapes.

BENCH_r03 measured transformer_rpr_train at 31.1% MFU vs base 41.7%
(gathered-einsum form); the first skew rewrite made it WORSE (18.7%).
This ablation times the candidate forms in isolation so the default is
picked from evidence, not theory (CLAUDE.md: compare fwd+bwd, never
fwd-only, on the tunnel).

Variants (self-attention core only, no projections):
  none        plain softmax attention (the floor)
  gather      r3 default: [L,L,dh] table gather + q-batched einsums
  skew255     full-offset table matmul + pad/reshape skew (2L-1 wide)
  gatherax    q @ table^T -> [B,H,L,2M+1], take_along_axis on the minor
              dim with the clipped distance ids
  onehot      q @ table^T -> [B,H,L,2M+1], expand with a constant
              [L, 2M+1, L] one-hot matmul (einsum)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from zero_tpu.ops import rpr


def variants(maxrel, L):
    ids = rpr.relative_positions_matrix(L, L, maxrel)          # [L, L]

    def v_none(q, k, v, tk, tv):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    def v_gather(q, k, v, tk, tv):
        r_k = rpr.gather_embeddings(tk, ids)
        logits = rpr.logits_with_rpr(q, k, r_k)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        r_v = rpr.gather_embeddings(tv, ids)
        return rpr.output_with_rpr(w, v, r_v)

    def v_skew255(q, k, v, tk, tv):
        logits = rpr.logits_with_rpr_skew(q, k, tk, maxrel)
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        return rpr.output_with_rpr_skew(w, v, tv, maxrel)

    def v_gatherax(q, k, v, tk, tv):
        qr = jnp.einsum("bhqd,md->bhqm", q, tk.astype(q.dtype))
        rel = jnp.take_along_axis(
            qr, jnp.broadcast_to(ids[None, None], q.shape[:2] + ids.shape),
            axis=-1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + rel
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        # value side: bucket-sum the weights, then one dense matmul
        m = tv.shape[0]
        oh = jax.nn.one_hot(ids, m, dtype=q.dtype)             # [L, L, M]
        wb = jnp.einsum("bhqk,qkm->bhqm", w, oh)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v) \
            + jnp.einsum("bhqm,md->bhqd", wb, tv.astype(q.dtype))

    def v_onehot(q, k, v, tk, tv):
        m = tk.shape[0]
        oh = jax.nn.one_hot(ids, m, dtype=q.dtype)             # [L, L, M]
        qr = jnp.einsum("bhqd,md->bhqm", q, tk.astype(q.dtype))
        rel = jnp.einsum("bhqm,qkm->bhqk", qr, oh)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + rel
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        wb = jnp.einsum("bhqk,qkm->bhqm", w, oh)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v) \
            + jnp.einsum("bhqm,md->bhqd", wb, tv.astype(q.dtype))

    return {"none": v_none, "gather": v_gather, "skew255": v_skew255,
            "gatherax": v_gatherax, "onehot": v_onehot}


def main():
    B, H, L, dh, maxrel = 64, 8, 128, 64, 16
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, L, dh), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, L, dh), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, L, dh), jnp.bfloat16)
    tk = jnp.asarray(rs.randn(2 * maxrel + 1, dh), jnp.float32)
    tv = jnp.asarray(rs.randn(2 * maxrel + 1, dh), jnp.float32)

    results = {}
    for name, fn in variants(maxrel, L).items():
        def loss(q, k, v, tk, tv, fn=fn):
            return jnp.sum(fn(q, k, v, tk, tv).astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 3, 4)))
        o = g(q, k, v, tk, tv)
        float(o[0].sum().astype(jnp.float32))     # drain queue (CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(10):
            o = g(q, k, v, tk, tv)
        got = float(o[0].sum().astype(jnp.float32))
        dt = (time.perf_counter() - t0) / 10
        results[name] = dt * 1e3
        print("%-9s %7.3f ms/fwdbwd  (chk %.1f)" % (name, dt * 1e3, got))

    base = results.get("none")
    for name, ms in results.items():
        print("%-9s overhead vs none: %+6.3f ms (%.2fx)"
              % (name, ms - base, ms / base))


if __name__ == "__main__":
    main()

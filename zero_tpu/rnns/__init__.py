"""RNN cell zoo + scan drivers (L1).

Functional counterpart of reference rnns/: GRU (gru.py:13-57), LSTM with
concat [h,c] state (lstm.py:13-68), SRU (sru.py:13-64), ATR twin-gate
(atr.py:13-60), LRN (lrn.py:13-53), oLRN (olrn.py:13-58); plus the masked
``rnn`` scan with state carry-through on pad positions (rnn.py:41-49) and
the two-cell conditional ``cond_rnn`` attention driver (rnn.py:70-171).

Design: cells precompute all input projections once per sequence
(``fetch``) so the lax.scan body touches only hidden-state matmuls --
the same trick the reference uses to keep the scan light, and the one
that matters on TPU (the fetch matmuls batch over [B*L] onto the MXU).
Each cell is a CellDef of pure functions over a param dict.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from zero_tpu.ops import attention as attn_mod
from zero_tpu.ops import initializers as inits
from zero_tpu.ops import nn


class CellDef(NamedTuple):
    name: str
    state_mult: int  # hidden-state width multiplier (lstm/sru carry [h,c])
    init: Callable   # (key, d_in, d, ln, weight_init) -> params
    fetch: Callable  # (params, x, ln) -> tuple of projected inputs
    step: Callable   # (params, h_prev, xs, ln) -> h_new
    get_hidden: Callable  # (h) -> hidden output


def _lin(key, i, d_in, d_out, bias, ln, weight_init):
    return nn.init_linear(jax.random.fold_in(key, i), d_in, d_out, bias=bias,
                          ln=ln, weight_init=weight_init)


# -- GRU ---------------------------------------------------------------------

def _gru_init(key, d_in, d, ln, wi):
    return {"gate_x": _lin(key, 0, d_in, 2 * d, False, ln, wi),
            "hide_x": _lin(key, 1, d_in, d, False, ln, wi),
            "gate_h": _lin(key, 2, d, 2 * d, True, ln, wi),
            "hide_h": _lin(key, 3, d, d, True, ln, wi)}


def _gru_fetch(p, x, ln):
    return (nn.linear(p["gate_x"], x, ln=ln), nn.linear(p["hide_x"], x, ln=ln))


def _gru_step(p, h_, xs, ln):
    x_g, x_h = xs
    h_g = nn.linear(p["gate_h"], h_, ln=ln)
    z, r = jnp.split(jax.nn.sigmoid(x_g + h_g), 2, axis=-1)
    h_h = nn.linear(p["hide_h"], h_ * r, ln=ln)
    h = jnp.tanh(x_h + h_h)
    return z * h_ + (1.0 - z) * h


# -- LSTM --------------------------------------------------------------------

def _lstm_init(key, d_in, d, ln, wi):
    return {"gate_x": _lin(key, 0, d_in, 3 * d, False, ln, wi),
            "hide_x": _lin(key, 1, d_in, d, False, ln, wi),
            "gate_h": _lin(key, 2, d, 3 * d, True, ln, wi),
            "hide_h": _lin(key, 3, d, d, True, ln, wi)}


def _lstm_fetch(p, x, ln):
    return (nn.linear(p["gate_x"], x, ln=ln), nn.linear(p["hide_x"], x, ln=ln))


def _lstm_step(p, h_full, xs, ln):
    x_g, x_c = xs
    h_, c_ = jnp.split(h_full, 2, axis=-1)
    h_g = nn.linear(p["gate_h"], h_, ln=ln)
    i, f, o = jnp.split(jax.nn.sigmoid(x_g + h_g), 3, axis=-1)
    h_c = jnp.tanh(x_c + nn.linear(p["hide_h"], h_, ln=ln))
    c = i * h_c + f * c_
    h = o * jnp.tanh(c)
    return jnp.concatenate([h, c], axis=-1)


def _half(h):
    return jnp.split(h, 2, axis=-1)[0]


# -- SRU ---------------------------------------------------------------------

def _sru_init(key, d_in, d, ln, wi):
    return {"hide_x": _lin(key, 0, d_in, 4 * d, False, ln, wi),
            "v_f": wi(jax.random.fold_in(key, 1), (1, d)),
            "v_r": wi(jax.random.fold_in(key, 2), (1, d))}


def _sru_fetch(p, x, ln):
    return (nn.linear(p["hide_x"], x, ln=ln),)


def _sru_step(p, h_full, xs, ln):
    x = xs[0]
    x_r, x_f, x_c, x_h = jnp.split(x, 4, axis=-1)
    h_, c_ = jnp.split(h_full, 2, axis=-1)
    v_f = p["v_f"].astype(x.dtype)
    v_r = p["v_r"].astype(x.dtype)
    f = jax.nn.sigmoid(x_f + v_f * c_)
    c = f * c_ + (1.0 - f) * x_c
    r = jax.nn.sigmoid(x_r + v_r * c_)
    h = r * c + (1.0 - r) * x_h
    return jnp.concatenate([h, c], axis=-1)


# -- ATR ---------------------------------------------------------------------

def _atr_init(key, d_in, d, ln, wi):
    return {"hide_x": _lin(key, 0, d_in, d, False, ln, wi),
            "hide_h": _lin(key, 1, d, d, True, ln, wi)}


def _atr_fetch(p, x, ln):
    return (nn.linear(p["hide_x"], x, ln=ln),)


def _atr_step(p, h_, xs, ln):
    p_in = xs[0]
    q = nn.linear(p["hide_h"], h_, ln=ln)
    f = jax.nn.sigmoid(p_in - q)
    i = jax.nn.sigmoid(p_in + q)
    return i * p_in + f * h_


# -- LRN / oLRN --------------------------------------------------------------

def _lrn_init(key, d_in, d, ln, wi):
    return {"hide_x": _lin(key, 0, d_in, 3 * d, False, ln, wi)}


def _lrn_fetch(p, x, ln):
    return (nn.linear(p["hide_x"], x, ln=ln),)


def _lrn_step(p, h_, xs, ln):
    pp, q, r = jnp.split(xs[0], 3, axis=-1)
    i = jax.nn.sigmoid(pp + h_)
    f = jax.nn.sigmoid(q - h_)
    return i * r + f * h_


def _olrn_init(key, d_in, d, ln, wi):
    return {"hide_x": _lin(key, 0, d_in, 4 * d, False, ln, wi)}


def _olrn_fetch(p, x, ln):
    return (nn.linear(p["hide_x"], x, ln=ln),)


def _olrn_step(p, h_, xs, ln):
    pp, q, r, s = jnp.split(xs[0], 4, axis=-1)
    i = jax.nn.sigmoid(pp + h_)
    f = jax.nn.sigmoid(q - h_)
    h = i * r + f * h_
    o = jax.nn.sigmoid(s - h)
    return o * h


_CELLS = {
    "gru": CellDef("gru", 1, _gru_init, _gru_fetch, _gru_step, lambda h: h),
    "lstm": CellDef("lstm", 2, _lstm_init, _lstm_fetch, _lstm_step, _half),
    "sru": CellDef("sru", 2, _sru_init, _sru_fetch, _sru_step, _half),
    "atr": CellDef("atr", 1, _atr_init, _atr_fetch, _atr_step, lambda h: h),
    "lrn": CellDef("lrn", 1, _lrn_init, _lrn_fetch, _lrn_step, lambda h: h),
    "olrn": CellDef("olrn", 1, _olrn_init, _olrn_fetch, _olrn_step,
                    lambda h: h),
}


def get_cell(name: str) -> CellDef:
    name = name.lower()
    if name not in _CELLS:
        raise NotImplementedError("%s is not supported" % name)
    return _CELLS[name]


def init_state_params(key, cell: CellDef, d_in: int, d: int, ln, weight_init):
    """The '<cell>_init' projection used to derive the initial state from an
    evidence vector (reference cell.py:26-38)."""
    return nn.init_linear(key, d_in, d * cell.state_mult, bias=True, ln=ln,
                          weight_init=weight_init)


def init_state_from(params, cell: CellDef, x, ln=False):
    return nn.linear(params, x, ln=ln)


def zero_state(cell: CellDef, batch: int, d: int, dtype=jnp.float32):
    return jnp.zeros((batch, d * cell.state_mult), dtype)


# ---------------------------------------------------------------------------
# scan drivers
# ---------------------------------------------------------------------------

def rnn(cell: CellDef, params, x, d: int, mask=None, ln=False,
        init_state=None):
    """Masked unidirectional RNN over [B, L, d_in].

    Pad positions carry the previous state through: h = m*h + (1-m)*h_
    (reference rnn.py:41-49). Returns ((outputs, last_state),
    (hidden_outputs, hidden_last)).
    """
    batch, length = x.shape[0], x.shape[1]
    if init_state is None:
        init_state = zero_state(cell, batch, d, x.dtype)
    if mask is None:
        mask = jnp.ones((batch, length), x.dtype)

    fetched = cell.fetch(params, x, ln)          # tuple of [B, L, *]
    xs = tuple(jnp.swapaxes(v, 0, 1) for v in fetched)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(x.dtype)

    def step(h_, inp):
        m, vs = inp
        h = cell.step(params, h_, vs, ln)
        h = m * h + (1.0 - m) * h_
        return h, h

    last, outputs = jax.lax.scan(step, init_state, (mask_t, xs))
    outputs = jnp.swapaxes(outputs, 0, 1)
    return ((outputs, last),
            (cell.get_hidden(outputs), cell.get_hidden(last)))


def init_cond_rnn(key, cell_name: str, d_in: int, d_mem: int, d: int,
                  ln=False, weight_init=None, one2one=False,
                  att_num_heads: int = 1):
    """Params for cond_rnn: lower cell (input side), higher cell (context
    side), attention + memory projection (reference rnn.py:91-116)."""
    weight_init = weight_init or inits.variance_scaling(1.0, "uniform")
    cell = get_cell(cell_name)
    params = {
        "lower": cell.init(jax.random.fold_in(key, 0), d_in, d, ln,
                           weight_init),
        "higher": cell.init(jax.random.fold_in(key, 1), d_mem, d, ln,
                            weight_init),
    }
    if not one2one:
        params["context_att"] = nn.init_linear(
            jax.random.fold_in(key, 2), d_mem, d_mem, bias=False, ln=ln,
            weight_init=weight_init)
        # the attention query is the lower cell's hidden output, width d
        params["attention"] = attn_mod.init_additive_attention(
            jax.random.fold_in(key, 3), d, d_mem, d_mem,
            num_heads=att_num_heads, weight_init=weight_init)
    return params


def cond_rnn(cell_name: str, params, x, memory, d: int, init_state=None,
             mask=None, mem_mask=None, ln=False, one2one=False,
             num_heads: int = 1):
    """Conditional RNN: per step, lower cell -> additive attention over
    memory -> higher cell (reference rnn.py:119-146). one2one feeds
    memory position t directly (the CAEncoder mode).

    Returns ((outputs, last_state), (hidden_outputs, hidden_last),
    contexts, attention_weights).
    """
    cell = get_cell(cell_name)
    batch, length = x.shape[0], x.shape[1]
    d_mem = memory.shape[-1]
    if init_state is None:
        init_state = zero_state(cell, batch, d, x.dtype)
    if mask is None:
        mask = jnp.ones((batch, length), x.dtype)
    if mem_mask is None:
        mem_mask = jnp.ones((batch, memory.shape[1]), x.dtype)

    fetched = cell.fetch(params["lower"], x, ln)
    xs = tuple(jnp.swapaxes(v, 0, 1) for v in fetched)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(x.dtype)

    if one2one:
        mem_fetched = cell.fetch(params["higher"], memory, ln)
        mem_xs = tuple(jnp.swapaxes(v, 0, 1) for v in mem_fetched)
        mem_t = jnp.swapaxes(memory, 0, 1)
        proj_memories = None
    else:
        proj_memories = nn.linear(params["context_att"], memory, ln=ln)

    init_context = jnp.zeros((batch, d_mem), x.dtype)
    init_weight = jnp.zeros((batch, num_heads, memory.shape[1]), jnp.float32)

    def step(carry, inp):
        t, h_ = carry
        if one2one:
            m, vs, c_c, c = inp
        else:
            m, vs = inp

        s = cell.step(params["lower"], h_, vs, ln)
        s = m * s + (1.0 - m) * h_

        if one2one:
            a = (jnp.arange(memory.shape[1])[None, :] == t)
            a = jnp.tile(a.astype(jnp.float32)[:, None, :],
                         (batch, num_heads, 1))
        else:
            vle = attn_mod.additive_attention(
                params["attention"], cell.get_hidden(s), memory, mem_mask,
                num_heads=num_heads, proj_memory=proj_memories)
            a, c = vle["weights"], vle["output"]
            c_c = cell.fetch(params["higher"], c, ln)

        h = cell.step(params["higher"], s, c_c, ln)
        h = m * h + (1.0 - m) * s
        return (t + 1, h), (h, c, a)

    xs_all = (mask_t, xs) + ((mem_xs, mem_t) if one2one else ())
    (_, last), (outputs, contexts, weights) = jax.lax.scan(
        step, (jnp.asarray(0, jnp.int32), init_state), xs_all)

    outputs = jnp.swapaxes(outputs, 0, 1)
    contexts = jnp.swapaxes(contexts, 0, 1)
    weights = jnp.transpose(weights, (1, 2, 0, 3))
    return ((outputs, last),
            (cell.get_hidden(outputs), cell.get_hidden(last)),
            contexts, weights)


def cond_rnn_step(cell_name: str, params, h_, x_t, memory, mem_mask,
                  proj_memories, ln=False, num_heads: int = 1):
    """One decode step of cond_rnn (for cached beam search): x_t [B, d_in].

    Returns (new_state, hidden, context)."""
    cell = get_cell(cell_name)
    vs = cell.fetch(params["lower"], x_t[:, None, :], ln)
    vs = tuple(v[:, 0] for v in vs)
    s = cell.step(params["lower"], h_, vs, ln)
    vle = attn_mod.additive_attention(
        params["attention"], cell.get_hidden(s), memory, mem_mask,
        num_heads=num_heads, proj_memory=proj_memories)
    c = vle["output"]
    c_c = cell.fetch(params["higher"], c[:, None, :], ln)
    c_c = tuple(v[:, 0] for v in c_c)
    h = cell.step(params["higher"], s, c_c, ln)
    return h, cell.get_hidden(h), c

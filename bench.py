"""Benchmark suite: the BASELINE.json configs on the available chip(s).

Prints ONE JSON line whose headline is transformer-base training
throughput (tokens/s/chip), with MFU from an analytic FLOP count and the
other configs (beam-4 decode, AAN decode, deep-20L fuse train, AFS speech
train) under "configs". Full per-window detail goes to BENCH_DETAILS.json.

Measurement protocol (axon tunnel-aware; see CLAUDE.md):
  * short dispatch windows closed by ONE scalar fetch that depends on the
    whole chain (pnorm / decoded ids) -- per-step fetches would measure
    tunnel RTT, and block_until_ready alone has unclear semantics there;
  * every window's implied FLOP/s is checked against the device's peak:
    windows above the roofline are measurement artifacts (r1 recorded
    physically impossible 640k-1.25M tok/s this way) and are discarded;
  * the headline is the MEDIAN of valid windows (best is in details).

vs_baseline divides by 20000 tokens/s -- a representative TF1-era
transformer-base per-GPU throughput (the reference publishes no
throughput numbers; BASELINE.md "no tokens/sec figures anywhere").
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

BASELINE_TOKENS_PER_SEC = 20000.0
# BENCH_SMOKE=1: tiny shapes / one window, for CI smoke tests of the
# harness itself (numbers are meaningless in this mode)
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))
WARMUP_STEPS = 2
STEPS_PER_WINDOW = 2 if SMOKE else 12
N_WINDOWS = 1 if SMOKE else 3
TIME_BUDGET_S = 1200.0  # stop spawning new families past this

# bf16 peak FLOP/s by TPU generation (public spec sheets)
_PEAKS = (("v6", 918e12), ("v5p", 459e12), ("v5", 197e12), ("v4", 275e12))


def device_peak_flops():
    import jax

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        return None  # CPU fallback: no meaningful roofline
    kind = getattr(dev, "device_kind", "").lower().replace(" ", "")
    for tag, peak in _PEAKS:
        if tag in kind:
            return peak
    return 197e12  # conservative default: v5e


def transformer_train_flops(cfg, rows, src_len, tgt_len):
    """Analytic fwd+bwd matmul FLOPs of one transformer train step.

    Per-token forward cost: encoder layer = qkvo 8d^2 + attention 4*Ls*d +
    FFN 4df; decoder layer adds cross-attn q,o 4d^2 + 4*Ls*d (k/v counted
    once per source token); logits 2dV per target token. Backward ~= 2x
    forward. All-dense synthetic batches make every token real.
    """
    d = cfg.hidden_size
    f = cfg.filter_size
    Le, Ld = cfg.num_encoder_layer, cfg.num_decoder_layer
    V = cfg.src_vocab.size()
    enc_tok = Le * (8 * d * d + 4 * src_len * d + 4 * d * f)
    dec_tok = Ld * (8 * d * d + 4 * tgt_len * d + 4 * d * d
                    + 4 * src_len * d + 4 * d * f)
    dec_src_tok = Ld * (4 * d * d)
    logits_tok = 2 * d * V
    fwd = rows * (src_len * (enc_tok + dec_src_tok)
                  + tgt_len * (dec_tok + logits_tok))
    return 3.0 * fwd


def _measure_windows(run_window, work_per_window, flops_per_work, peak):
    """Time N_WINDOWS calls; drop windows whose implied FLOP/s exceeds the
    roofline (tunnel artifacts). Returns (dict, valid) with work/s stats.

    Variance guard (VERDICT r3 weak #5: a 2.3x window collapse slipped
    through silently): any window >1.5x off the median is flagged loudly
    and up to 2 extra windows are measured so the median rests on more
    evidence; ALL windows stay in the record."""
    windows = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        run_window()
        windows.append(time.perf_counter() - t0)

    def rates_of(ws):
        return [work_per_window / dt for dt in ws]

    def split(rates):
        valid, dropped = [], []
        for r in rates:
            implied = r * (flops_per_work or 0.0)
            if peak is not None and flops_per_work and implied > peak:
                dropped.append(r)
            else:
                valid.append(r)
        return valid, dropped

    def outliers(valid):
        if len(valid) < 2:
            return []
        med = statistics.median(valid)
        return [r for r in valid if r > 1.5 * med or r < med / 1.5]

    valid, dropped = split(rates_of(windows))
    extra = 0
    while valid and outliers(valid) and extra < 2:
        extra += 1
        t0 = time.perf_counter()
        run_window()
        windows.append(time.perf_counter() - t0)
        valid, dropped = split(rates_of(windows))

    out = {
        "windows_work_per_sec": [round(r, 1) for r in rates_of(windows)],
        "dropped_above_roofline": [round(r, 1) for r in dropped],
    }
    if not valid:
        out["error"] = "all %d windows above the roofline" % len(windows)
        return out, None
    if outliers(valid):
        out["window_variance_flag"] = [round(r, 1) for r in outliers(valid)]
    med = statistics.median(valid)
    out["median_work_per_sec"] = round(med, 1)
    out["best_work_per_sec"] = round(max(valid), 1)
    if peak is not None and flops_per_work:
        out["mfu_median"] = round(med * flops_per_work / peak, 4)
        out["mfu_best"] = round(max(valid) * flops_per_work / peak, 4)
    return out, med


def bench_train(cfg, rows, src_len, tgt_len, flops_per_step=None,
                vocab_hi=None, donate=False):
    import jax

    from zero_tpu.models.base import get_model
    from zero_tpu.parallel import (batch_sharding, init_train_state,
                                   make_mesh, make_train_step)

    n_chips = len(jax.devices())
    cfg.mesh_model = 1
    cfg.mesh_data = n_chips
    mesh = make_mesh(cfg)
    model = get_model(cfg.model_name)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step_fn = make_train_step(model, cfg, mesh, donate=donate)

    cycles = max(int(cfg.update_cycle), 1)
    rs = np.random.RandomState(0)
    hi = vocab_hi or (cfg.src_vocab.size() - 1)
    batch = {
        "source": rs.randint(3, hi, (cycles, rows * n_chips, src_len))
        .astype(np.int32),
        "target": rs.randint(3, hi, (cycles, rows * n_chips, tgt_len))
        .astype(np.int32),
    }
    db = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    rng = jax.random.PRNGKey(1)
    tokens_per_step = cycles * rows * n_chips * tgt_len

    t0 = time.perf_counter()
    for i in range(WARMUP_STEPS):
        state, metrics = step_fn(state, db, 1e-4, jax.random.fold_in(rng, i))
    float(metrics["pnorm"])
    compile_s = time.perf_counter() - t0

    holder = {"state": state, "i": 0}

    def run_window():
        st = holder["state"]
        for _ in range(STEPS_PER_WINDOW):
            holder["i"] += 1
            st, m = step_fn(st, db, 1e-4,
                            jax.random.fold_in(rng, 100 + holder["i"]))
        float(m["pnorm"])
        holder["state"] = st

    peak = device_peak_flops()
    if flops_per_step is None:
        flops_per_step = transformer_train_flops(cfg, rows * n_chips,
                                                 src_len, tgt_len)
    flops_per_token = flops_per_step / tokens_per_step
    work_per_window = tokens_per_step * STEPS_PER_WINDOW
    out, med = _measure_windows(run_window, work_per_window,
                                flops_per_token, peak)
    out.update({
        "unit": "target-tokens/s",
        "batch": [cycles, rows * n_chips, src_len],
        "compile_plus_warmup_s": round(compile_s, 1),
        "flops_per_step": flops_per_step,
        "n_chips": n_chips,
    })
    if med is not None:
        out["tokens_per_sec_per_chip"] = round(med / n_chips, 1)
    return out


def bench_decode(model_name, batch_rows=32, src_len=32, cfg_overrides=None):
    """Beam-4 full-length decode sentences/sec (BASELINE.json north star)."""
    import jax

    from __graft_entry__ import _base_config
    from zero_tpu.train import make_decode_fn

    cfg = _base_config()
    cfg.model_name = model_name
    cfg.scope_name = model_name
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = src_len + 50
    for k, v in (cfg_overrides or {}).items():
        setattr(cfg, k, v)

    from zero_tpu.models.base import get_model

    model = get_model(model_name)
    weights = model.init_fn(jax.random.PRNGKey(0), cfg)
    decode = make_decode_fn(cfg, model)

    rs = np.random.RandomState(0)
    batch = {"src": rs.randint(3, 30000, (batch_rows, src_len))
             .astype(np.int32)}

    t0 = time.perf_counter()
    out = decode(weights, batch)
    np.asarray(out["seq"])
    compile_s = time.perf_counter() - t0

    # amortise the end-of-window scalar-fetch RTT (~25 ms over the
    # tunnel): 2-call windows inflated every decode call by ~12 ms
    calls_per_window = 2 if SMOKE else 6

    def run_window():
        o = None
        for _ in range(calls_per_window):
            o = decode(weights, batch)
        np.asarray(o["seq"])  # forces the chain

    out, med = _measure_windows(run_window, calls_per_window * batch_rows,
                                None, None)
    out.update({
        "unit": "sentences/s",
        "beam": 4,
        "batch_rows": batch_rows,
        "src_len": src_len,
        "decode_steps": cfg.decode_max_len,
        "compile_s": round(compile_s, 1),
    })
    if med is not None:
        out["sentences_per_sec"] = round(med, 1)
    return out


def bench_big():
    """transformer-big (d=1024): the reference's headline WMT14 config
    (docs/depth_scale_init_and_merged_attention/README.md:67-68). Tests
    the d=512-granularity MFU hypothesis from r2: at d=1024 the matmuls
    tile the MXU better, so MFU should beat the base config's."""
    from __graft_entry__ import _base_config

    cfg = _base_config()
    cfg.hidden_size = 1024
    cfg.embed_size = 1024
    cfg.filter_size = 4096
    cfg.num_heads = 16
    cfg.residual_dropout = 0.3  # reference big setting (same cost as 0.1)
    # 210M params + Adam + B=128 L=128 activations exceed the 16 GB chip
    # without remat (measured RESOURCE_EXHAUSTED); the dots policy keeps
    # matmul outputs resident (fits) and recomputes only elementwise +
    # attention scores: 50.4% MFU vs 45.9% full-recompute (r4, docs/mfu.md)
    cfg.use_remat = True
    cfg.remat_policy = "dots"
    return bench_train(cfg, rows=128, src_len=128, tgt_len=128,
                       vocab_hi=30000)


def moe_train_flops(cfg, rows, src_len, tgt_len):
    """Base transformer FLOPs with the dense FFN replaced by the MoE
    terms: top_k expert FFNs per token (capacity drops make this an
    upper bound, so MFU is conservative), the [B,S,E,C] dispatch +
    combine einsums, and the router projection."""
    import math as _math

    from zero_tpu.ops.moe import capacity

    d = cfg.hidden_size
    f = cfg.filter_size
    e = int(cfg.moe_num_experts)
    k = int(cfg.moe_top_k)
    Le, Ld = cfg.num_encoder_layer, cfg.num_decoder_layer
    base = transformer_train_flops(cfg, rows, src_len, tgt_len)
    layers = [(Le, src_len), (Ld, tgt_len)]
    extra = 0.0
    for n_layers, s in layers:
        c = capacity(s, e, float(cfg.moe_capacity_factor), k)
        per_tok = ((k - 1) * 4 * d * f      # extra expert FFNs beyond dense
                   + 4 * e * c * d          # dispatch + combine einsums
                   + 2 * d * e)             # router
        extra += rows * s * n_layers * per_tok
    return base + 3.0 * extra


def bench_moe():
    """Mixture-of-experts transformer (Switch top-1, 8 experts): the r3
    expert-parallel extension measured single-chip (all experts local;
    the all-to-alls are free, so this isolates the static-shape dispatch
    overhead vs the dense FFN). Multi-chip EP needs real hardware
    (STATUS.md deferred)."""
    from __graft_entry__ import _base_config

    cfg = _base_config()
    cfg.model_name = cfg.scope_name = "transformer_moe"
    cfg.moe_num_experts = 8
    cfg.moe_top_k = 1
    cfg.moe_capacity_factor = 1.25
    # 8 experts x 12 layers of [E, d, f] stacks + their [E, B*C, f]
    # hidden activations exceed the 16 GB chip at B=256 without remat
    # (RESOURCE_EXHAUSTED in a FRESH process, r4 -- not the r3 cache
    # inheritance); the transformer-big policy fits: per-layer remat +
    # B=128 (the model is big-scale, ~245M params; B=256 OOMs even
    # WITH remat)
    cfg.use_remat = True
    cfg.remat_policy = "dots"
    rows, L = 128, 128
    return bench_train(cfg, rows, L, L, vocab_hi=30000,
                       flops_per_step=moe_train_flops(cfg, rows, L, L))


def _rela_config():
    """transformer_rela at base geometry: same matmul budget as softmax
    (relu weights + gated RMSNorm epilogue), so the transformer FLOPs
    model holds and the published 0.93x train ratio is directly
    comparable."""
    from __graft_entry__ import _base_config

    cfg = _base_config()
    cfg.model_name = cfg.scope_name = "transformer_rela"
    return cfg


def rpr_train_flops(cfg, rows, src_len, tgt_len):
    """Base transformer FLOPs + the RPR extras: relative-key logits and
    relative-value accumulation add 4*L*d per self-attention token."""
    base = transformer_train_flops(cfg, rows, src_len, tgt_len)
    d = cfg.hidden_size
    Le, Ld = cfg.num_encoder_layer, cfg.num_decoder_layer
    extra = rows * (src_len * Le * 4 * src_len * d
                    + tgt_len * Ld * 4 * tgt_len * d)
    return base + 3.0 * extra


def bench_rpr():
    """BASELINE config 3: Transformer + RPR relative positions."""
    from zero_tpu.config import load_config_file
    from __graft_entry__ import _base_config

    cfg = _base_config()
    cfg.override_from_dict({
        k: v for k, v in load_config_file(
            "configs/transformer_rpr_rela.json").items()
        if not k.startswith("_") and not k.endswith("_file")})
    cfg.update_cycle = 1
    rows, L = 256, 128
    return bench_train(cfg, rows, L, L, vocab_hi=30000,
                       flops_per_step=rpr_train_flops(cfg, rows, L, L))


def bench_deep(num_encoder_layer=20, scan_layers=False, rows=128, L=128):
    """Deep fuse stack (BASELINE config 4). r2 benched 64x64, a shape the
    r2 ablations showed underutilises the chip; r3 uses a realistic step.
    30L runs with scan_layers (one compiled layer body; the non-scan 30L
    compile is unbounded on the tunnel)."""
    from zero_tpu.config import load_config_file
    from __graft_entry__ import _base_config

    cfg = _base_config()
    cfg.override_from_dict({
        k: v for k, v in load_config_file(
            "configs/deep_transformer_fuse_l0drop.json").items()
        if not k.startswith("_") and not k.endswith("_file")})
    cfg.update_cycle = 1
    cfg.num_encoder_layer = num_encoder_layer
    cfg.scan_layers = scan_layers
    cfg.remat_policy = "dots"  # keep matmul outputs; recompute the rest
    # flops: fuse decoder = 2 sublayers (cross qkvo + aan + ffn); count the
    # dominant matmuls with the same rules as the base formula
    d, f = cfg.hidden_size, cfg.filter_size
    Le, Ld = cfg.num_encoder_layer, cfg.num_decoder_layer
    V = cfg.src_vocab.size()
    enc_tok = Le * (8 * d * d + 4 * L * d + 4 * d * f)
    dec_tok = Ld * (8 * d * d + 8 * L * d + 4 * d * f)
    fwd = rows * L * (enc_tok + dec_tok + 2 * d * V)
    # MODEL FLOPs (3x fwd), the same convention as every other config:
    # remat recompute is overhead the MFU pays, not work it is credited
    # for. (r3 counted 4x here -- its 51.7%/48.4% deep MFUs are NOT
    # comparable to r4's; tok/s is the cross-round metric.)
    flops = 3.0 * fwd
    return bench_train(cfg, rows, L, L, flops_per_step=flops)


def bench_afs_speech():
    import jax

    from zero_tpu.config import load_config_file
    from __graft_entry__ import _base_config
    from zero_tpu.models.base import get_model
    from zero_tpu.parallel import (batch_sharding, init_train_state,
                                   make_mesh, make_train_step)

    cfg = _base_config(vocab_size=8000)
    cfg.override_from_dict({
        k: v for k, v in load_config_file(
            "configs/speech_afs_mustc.json").items()
        if not k.startswith("_") and not k.endswith("_file")})
    cfg.update_cycle = 1
    if jax.devices()[0].platform != "tpu":
        cfg.use_flash_attention = False  # pallas kernel is TPU-only

    n_chips = len(jax.devices())
    cfg.mesh_model = 1
    cfg.mesh_data = n_chips
    mesh = make_mesh(cfg)
    model = get_model(cfg.model_name)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step_fn = make_train_step(model, cfg, mesh, donate=False)

    rows, frames, tgt_len = 8 * n_chips, 1024, 64
    rs = np.random.RandomState(0)
    batch = {
        "audio": rs.randn(1, rows, frames, cfg.audio_num_mel_bins)
        .astype(np.float32),
        "audio_mask": np.ones((1, rows, frames), np.float32),
        "target": rs.randint(3, 7000, (1, rows, tgt_len)).astype(np.int32),
    }
    if cfg.ctc_enable:
        batch["transcript"] = rs.randint(
            3, max(int(cfg.coarse_label_base), 10),
            (1, rows, tgt_len)).astype(np.int32)
    db = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    rng = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    for i in range(WARMUP_STEPS):
        state, metrics = step_fn(state, db, 1e-4, jax.random.fold_in(rng, i))
    float(metrics["pnorm"])
    compile_s = time.perf_counter() - t0

    holder = {"state": state, "i": 0}

    def run_window():
        st = holder["state"]
        for _ in range(STEPS_PER_WINDOW):
            holder["i"] += 1
            st, m = step_fn(st, db, 1e-4,
                            jax.random.fold_in(rng, 100 + holder["i"]))
        float(m["pnorm"])
        holder["state"] = st

    frames_per_window = rows * frames * STEPS_PER_WINDOW
    out, med = _measure_windows(run_window, frames_per_window, None, None)
    out.update({
        "unit": "audio-frames/s",
        "batch": [rows, frames, tgt_len],
        "compile_plus_warmup_s": round(compile_s, 1),
        "n_chips": n_chips,
    })
    if med is not None:
        out["frames_per_sec_per_chip"] = round(med / n_chips, 1)
    return out


def _config_registry():
    """name -> zero-arg callable, in run order. Comments give the
    BASELINE.json / reference-docs provenance of each config."""
    from __graft_entry__ import _base_config

    rows, L = (8, 16) if SMOKE else (256, 128)
    reg = {}
    # 1. headline: transformer-base train throughput at a realistic
    #    WMT-scale step (BASELINE.json config 1)
    reg["transformer_base_train"] = \
        lambda: bench_train(_base_config(), rows=rows, src_len=L,
                            tgt_len=L, vocab_hi=30000)
    # 2. beam-4 decode (BASELINE.json north-star second metric)
    reg["transformer_base_decode_beam4"] = \
        lambda: bench_decode("transformer", batch_rows=4 if SMOKE else 32,
                             src_len=8 if SMOKE else 32)
    # 3. AAN O(1)-cache decode (reference README.md:32 headline claim)
    reg["transformer_aan_decode_beam4"] = \
        lambda: bench_decode("transformer_aan",
                             batch_rows=4 if SMOKE else 32,
                             src_len=8 if SMOKE else 32)
    if SMOKE:
        return reg
    # 3b. serving-batch decode scaling: sentences/s must be
    #     monotonically non-decreasing in batch rows (VERDICT r2 #1)
    for b in (64, 128, 256, 1):
        reg["transformer_base_decode_beam4_b%d" % b] = \
            (lambda b=b: bench_decode("transformer", batch_rows=b,
                                      src_len=32))
    # 3c. ReLA sparse-attention decode (reference publishes speed
    #     ratios vs softmax: docs/rela_sparse_attention/README.md)
    reg["transformer_rela_decode_beam4"] = \
        lambda: bench_decode("transformer_rela", batch_rows=32, src_len=32)
    # 4. deep 20L/30L fuse + depth-scaled init (BASELINE config 4;
    #    30L = the reference's deepest published stack)
    reg["deep20_fuse_train"] = bench_deep
    reg["deep30_fuse_train"] = \
        lambda: bench_deep(num_encoder_layer=30, scan_layers=True)
    # 5. AFS speech translation preset (BASELINE.json config 5)
    reg["afs_speech_train"] = bench_afs_speech
    # 6. BASELINE config 3: RPR train (completes 5/5 configs)
    reg["transformer_rpr_train"] = bench_rpr
    # 7. transformer-big (d=1024): reference headline WMT14 config
    reg["transformer_big_train"] = bench_big
    # 8. MoE (Switch top-1, 8 experts): r3 expert-parallel extension,
    #    single-chip dispatch-overhead measurement
    reg["transformer_moe_train"] = bench_moe
    # 9. ReLA train ratio vs softmax (reference publishes 0.93x,
    #    docs/rela_sparse_attention/README.md:100)
    reg["transformer_rela_train"] = \
        lambda: bench_train(_rela_config(), rows=rows, src_len=L,
                            tgt_len=L, vocab_hi=30000)
    # 10. L0Drop compacted decode speedup at a long-source shape
    #     (reference publishes 1.20x char-MT / 1.65x doc-sum decode
    #     speedups from dropping encoder outputs,
    #     docs/l0drop/README.md:29-30). Static-k compaction at 50%
    #     vs the uncompacted gated path isolates the mechanical win.
    reg["l0drop_decode_full_L128"] = \
        lambda: bench_decode("transformer_l0drop", batch_rows=32,
                             src_len=128,
                             cfg_overrides={"l0_compact_ratio": 0.0})
    reg["l0drop_decode_compact50_L128"] = \
        lambda: bench_decode("transformer_l0drop", batch_rows=32,
                             src_len=128,
                             cfg_overrides={"l0_compact_ratio": 0.5})
    # 10b. ...measured r4: at MT shapes (src 128) the pair is FLAT
    #      (~200 vs ~200 sent/s) because the decode step is dominated
    #      by the logits matmul + target self-attention + FFN; halving
    #      a 128-position cross memory saves ~nothing. The reference's
    #      1.65x is a SUMMARIZATION number (long sources). This pair
    #      reproduces that regime: src 1024 compacted to 25%, fixed
    #      80-step decode budget so both run identical step counts.
    reg["l0drop_decode_full_L1024"] = \
        lambda: bench_decode("transformer_l0drop", batch_rows=32,
                             src_len=1024,
                             cfg_overrides={"l0_compact_ratio": 0.0,
                                            "decode_max_len": 80})
    reg["l0drop_decode_compact25_L1024"] = \
        lambda: bench_decode("transformer_l0drop", batch_rows=32,
                             src_len=1024,
                             cfg_overrides={"l0_compact_ratio": 0.25,
                                            "decode_max_len": 80})
    return reg


# --- evidence-streaming harness (VERDICT r4 #1) ---------------------------
#
# r4's driver run was killed by its timeout with an EMPTY tail: the old
# parent printed its one summary line and wrote BENCH_DETAILS.json only
# after ALL configs finished, so a timeout anywhere lost everything even
# though every finished child's result was in hand. The r5 protocol:
#   * configs are grouped into FAMILIES, one fresh child process per
#     family (one TPU-client init + persistent-cache session per family;
#     r4's one-process-per-CONFIG multiplied init+compile cost ~17x,
#     which is what blew the driver budget);
#   * a child prints one JSON line per config THE MOMENT it finishes;
#     the parent consumes those live, rewrites BENCH_DETAILS.json after
#     every config, and prints a full CUMULATIVE summary line (the same
#     schema as the final line) after every config -- so a kill at any
#     instant leaves the last stdout line a complete, parseable summary
#     of everything measured so far;
#   * per-family watchdogs replace the single generous per-config one;
#     a family timeout keeps the configs that already streamed out.

FAMILIES = [
    # (family, configs, timeout_s) -- ordered by evidence value: the
    # headline + north-star decode first, then the r3/r4 gaps (rela
    # train, moe, l0drop L1024), then the rest. The three base-geometry
    # train variants share ONE child (one TPU-client init; none is an
    # OOM risk); moe/afs/deep keep their own children. Timeouts budget
    # for a COLD compile cache: the rela train step alone measured
    # 621 s compile+warmup cold (r5) -- the r4 420 s watchdog killed it.
    ("train_base", ["transformer_base_train"], 480),
    ("decode", ["transformer_base_decode_beam4",
                "transformer_aan_decode_beam4",
                "transformer_rela_decode_beam4",
                "transformer_base_decode_beam4_b64",
                "transformer_base_decode_beam4_b128",
                "transformer_base_decode_beam4_b256",
                "transformer_base_decode_beam4_b1"], 700),
    ("train_variants", ["transformer_rela_train", "transformer_rpr_train",
                        "transformer_big_train"], 1100),
    ("train_moe", ["transformer_moe_train"], 540),
    ("l0drop_decode", ["l0drop_decode_full_L1024",
                       "l0drop_decode_compact25_L1024",
                       "l0drop_decode_full_L128",
                       "l0drop_decode_compact50_L128"], 800),
    ("afs", ["afs_speech_train"], 540),
    ("train_deep", ["deep20_fuse_train", "deep30_fuse_train"], 1000),
]
SMOKE_FAMILIES = [
    ("train_base", ["transformer_base_train"], 900),
    ("decode", ["transformer_base_decode_beam4",
                "transformer_aan_decode_beam4"], 900),
]


def _run_child(names) -> None:
    """Child mode: run the given configs sequentially in this (fresh)
    process, printing each result as its own flushed JSON line the moment
    it finishes. Fresh processes per FAMILY keep the r3 lesson (a
    degraded TPU client poisons later configs; jax.clear_caches() does
    not reclaim chip state) without r4's per-config init+compile bill."""
    import signal
    import sys

    def _init_timeout(signum, frame):
        print(json.dumps({"__config__": names[0],
                          "error": "TPU backend init timed out after "
                                   "300 s (axon tunnel down?)"}),
              flush=True)
        os._exit(0)

    signal.signal(signal.SIGALRM, _init_timeout)
    signal.alarm(300)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/zero_tpu_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()          # blocks here if the tunnel is down
    signal.alarm(0)
    if jax.default_backend() == "tpu":
        # hardware PRNG, same policy as run.py:setup_prng
        jax.config.update("jax_default_prng_impl", "rbg")

    registry = _config_registry()
    for name in names:
        try:
            result = registry[name]()
        except Exception as e:
            result = {"error": "%s: %s" % (type(e).__name__, e)}
        result["__config__"] = name
        result.setdefault("device", str(jax.devices()[0]))
        result.setdefault("device_kind",
                          getattr(jax.devices()[0], "device_kind", "?"))
        result.setdefault("peak_flops", device_peak_flops())
        print(json.dumps(result), flush=True)
        sys.stdout.flush()


def _spawn_family(family, names, timeout_s, on_result):
    """Run one family child, streaming each config line to on_result as
    it arrives. On watchdog expiry the child is killed (by pid) and the
    configs that never reported get an explanatory error entry."""
    import subprocess
    import sys
    import threading

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--family", family],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    seen = []
    stderr_buf = []

    def _read_out():
        for ln in proc.stdout:
            ln = ln.strip()
            if not (ln.startswith("{") and ln.endswith("}")):
                continue
            try:
                result = json.loads(ln)
            except ValueError:
                continue
            name = result.pop("__config__", None)
            if name:
                seen.append(name)
                on_result(name, result)

    def _read_err():
        for ln in proc.stderr:
            stderr_buf.append(ln)

    t_out = threading.Thread(target=_read_out, daemon=True)
    t_err = threading.Thread(target=_read_err, daemon=True)
    t_out.start()
    t_err.start()
    timed_out = False
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.kill()
        proc.wait()
    t_out.join(timeout=10)
    t_err.join(timeout=10)
    for name in names:
        if name in seen:
            continue
        if timed_out:
            on_result(name, {
                "error": "family '%s' hit its %.0f s watchdog before this "
                         "config reported (earlier streamed results kept)"
                         % (family, timeout_s)})
        else:
            on_result(name, {
                "error": "family child rc=%d before this config reported: "
                         "%s" % (proc.returncode,
                                 "".join(stderr_buf)[-1500:])})


def _derive(cfgs):
    """Idempotent derived metrics over whatever has been measured so far:
    serving latency, the decode-scaling curve, and published-ratio
    comparisons (ReLA vs softmax, L0Drop compaction speedups)."""

    def sps(name):
        return cfgs.get(name, {}).get("sentences_per_sec")

    if sps("transformer_base_decode_beam4_b1"):
        cfgs["transformer_base_decode_beam4_b1"][
            "latency_ms_per_sentence"] = round(
            1000.0 / sps("transformer_base_decode_beam4_b1"), 1)
    curve = {}
    for b, key in ((32, "transformer_base_decode_beam4"),
                   (64, "transformer_base_decode_beam4_b64"),
                   (128, "transformer_base_decode_beam4_b128"),
                   (256, "transformer_base_decode_beam4_b256")):
        if sps(key):
            curve["b%d" % b] = sps(key)
    if curve:
        # the r2 regression criterion: larger serving batches never LOSE
        # absolute sentences/s vs B=32
        cfgs["decode_scaling"] = dict(
            curve,
            b128_over_b32=(round(curve["b128"] / curve["b32"], 3)
                           if "b128" in curve and "b32" in curve else None),
            b256_over_b64=(round(curve["b256"] / curve["b64"], 3)
                           if "b256" in curve and "b64" in curve else None),
            non_decreasing_vs_b32=(
                all(v >= curve["b32"] for v in curve.values())
                if "b32" in curve else None))
    if sps("transformer_rela_decode_beam4") and \
            sps("transformer_base_decode_beam4"):
        cfgs["transformer_rela_decode_beam4"]["speed_vs_softmax"] = round(
            sps("transformer_rela_decode_beam4")
            / sps("transformer_base_decode_beam4"), 3)
    base_tps = cfgs.get("transformer_base_train",
                        {}).get("median_work_per_sec")
    rela_tps = cfgs.get("transformer_rela_train",
                        {}).get("median_work_per_sec")
    if base_tps and rela_tps:
        cfgs["transformer_rela_train"]["speed_vs_softmax"] = round(
            rela_tps / base_tps, 3)
    for full, compact in (("l0drop_decode_full_L128",
                           "l0drop_decode_compact50_L128"),
                          ("l0drop_decode_full_L1024",
                           "l0drop_decode_compact25_L1024")):
        if sps(full) and sps(compact):
            cfgs[compact]["speedup_vs_uncompacted"] = round(
                sps(compact) / sps(full), 3)


def _summary_line(cfgs):
    base = cfgs.get("transformer_base_train", {})
    per_chip = base.get("tokens_per_sec_per_chip")
    return {
        "metric": "train_tokens_per_sec_per_chip",
        "value": per_chip,
        "unit": "tokens/s/chip",
        "vs_baseline": (round(per_chip / BASELINE_TOKENS_PER_SEC, 3)
                        if per_chip else None),
        "mfu": base.get("mfu_median"),
        "decode_beam4_sentences_per_sec": cfgs.get(
            "transformer_base_decode_beam4", {}).get("sentences_per_sec"),
        "configs": {k: {kk: vv for kk, vv in v.items()
                        if kk in ("tokens_per_sec_per_chip", "mfu_median",
                                  "sentences_per_sec",
                                  "frames_per_sec_per_chip", "error",
                                  "skipped", "b128_over_b32",
                                  "b256_over_b64", "speed_vs_softmax",
                                  "speedup_vs_uncompacted",
                                  "non_decreasing_vs_b32",
                                  "window_variance_flag")}
                    for k, v in cfgs.items()},
    }


def main():
    # Parent/child split: the parent NEVER initializes a TPU client; each
    # FAMILY of configs runs in its own child process with a clean
    # backend, a watchdog, and the shared persistent XLA compile cache.
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--family":
        fams = dict((f, c) for f, c, _ in
                    (SMOKE_FAMILIES if SMOKE else FAMILIES))
        _run_child(fams[sys.argv[2]])
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--config":
        _run_child([sys.argv[2]])   # single-config mode for ablation use
        return

    started = time.perf_counter()
    details = {"configs": {},
               "isolation": "one fresh process per config family"}
    cfgs = details["configs"]

    def on_result(name, result):
        for key in ("device", "device_kind", "peak_flops"):
            if key in result:
                details.setdefault(key, result.pop(key))
        cfgs[name] = result
        _derive(cfgs)
        details["total_bench_s"] = round(time.perf_counter() - started, 1)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=1)
        # cumulative summary after EVERY config: if this run is killed at
        # any point, the last stdout line is a parseable summary of all
        # evidence so far (r4's empty-tail failure mode cannot recur)
        print(json.dumps(_summary_line(cfgs)), flush=True)

    for family, names, timeout_s in (SMOKE_FAMILIES if SMOKE else FAMILIES):
        elapsed = time.perf_counter() - started
        if elapsed > TIME_BUDGET_S:
            for name in names:
                cfgs[name] = {"skipped": "time budget exhausted"}
            continue
        # never let one family push the whole run far past the budget
        effective = min(timeout_s, max(120.0, TIME_BUDGET_S + 420 - elapsed))
        _spawn_family(family, names, effective, on_result)

    _derive(cfgs)
    details["total_bench_s"] = round(time.perf_counter() - started, 1)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)
    print(json.dumps(_summary_line(cfgs)), flush=True)


if __name__ == "__main__":
    main()

"""Ablation bench: isolate remaining non-matmul step costs on the chip.

Run from repo root: python scripts/ablations/mb_mfu.py <variant> (one variant per process
so OOMs/compiles don't interact).
"""
import os
import sys

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if jax.default_backend() == "tpu":
    jax.config.update("jax_default_prng_impl", "rbg")

from bench import bench_train
from __graft_entry__ import _base_config

variant = sys.argv[1]
over = {}
if variant == "default":
    pass
elif variant == "nodrop":
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0)
elif variant == "flash":
    over = dict(use_flash_attention=True)
elif variant == "flash_nodrop":
    over = dict(use_flash_attention=True, dropout=0.0, residual_dropout=0.0,
                relu_dropout=0.0, attention_dropout=0.0)
elif variant == "no_attn_drop":
    over = dict(attention_dropout=0.0)
elif variant == "remat":
    over = dict(use_remat=True)
elif variant == "fused_ffn":
    over = dict(use_fused_ffn=True)
elif variant == "fused_ffn_nodrop":
    over = dict(use_fused_ffn=True, dropout=0.0, residual_dropout=0.0,
                relu_dropout=0.0, attention_dropout=0.0)
elif variant == "donate":
    pass
else:
    raise SystemExit("unknown variant %s" % variant)

cfg = _base_config(**over)
out = bench_train(cfg, rows=256, src_len=128, tgt_len=128, vocab_hi=30000,
                  donate=(variant == "donate"))
print(variant, "->", out.get("median_work_per_sec"), "tok/s, mfu",
      out.get("mfu_median"), out.get("windows_work_per_sec"),
      out.get("error", ""))

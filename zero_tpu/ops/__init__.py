"""Tensor-op library (L1): functional JAX ops with explicit param pytrees.

Equivalent surface to the reference's func.py + modules/ (linear,
dot/additive attention, norms, FFN, timing signal, attention bias,
RPR, ReLA, Fixup, L0 hard-concrete gates), designed TPU-first: static
shapes, preallocated decode caches, bf16-friendly masking.
"""

from zero_tpu.ops import common, initializers, nn, attention, rpr, rela, fixup, l0norm  # noqa: F401

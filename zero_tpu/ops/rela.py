"""ReLA: rectified linear sparse attention.

The math lives in ops.attention (``relu=True`` switches _attn_core to
multiply-masking + ReLU, and ``gated_rms_norm`` is the stabilising epilogue)
-- counterpart of reference modules/rela.py:14-109. This module re-exports
those entry points under the reference's names.
"""

from zero_tpu.ops.attention import (  # noqa: F401
    attn_train,
    gated_rms_norm,
    init_attention,
    self_attn_step,
    cross_attn_step,
    cross_attn_precompute,
)

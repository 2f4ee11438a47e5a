"""Model zoo (L2): name registry of functional seq2seq models.

Equivalent of reference models/model.py:11-41. Each model registers a
ModelSpec of pure functions; importing this package registers everything
(the reference does dynamic module loading, util.py:298-307 -- explicit
imports are kept here so jit tracing sees a stable set).
"""

from zero_tpu.models.base import ModelSpec, get_model, model_register  # noqa: F401

# import for registration side effects
from zero_tpu.models import transformer  # noqa: F401
from zero_tpu.models import transformer_rpr  # noqa: F401
from zero_tpu.models import transformer_aan  # noqa: F401
from zero_tpu.models import transformer_fuse  # noqa: F401
from zero_tpu.models import transformer_rela  # noqa: F401
from zero_tpu.models import transformer_fixup  # noqa: F401
from zero_tpu.models import transformer_l0drop  # noqa: F401
from zero_tpu.models import rnnsearch  # noqa: F401
from zero_tpu.models import deepnmt  # noqa: F401
from zero_tpu.models import rnnsearch_deepatt  # noqa: F401
from zero_tpu.models import transformer_afs  # noqa: F401
from zero_tpu.models import transformer_ibdecoder  # noqa: F401
from zero_tpu.models import transformer_multilingual  # noqa: F401
from zero_tpu.models import transformer_clsr  # noqa: F401
from zero_tpu.models import transformer_moe  # noqa: F401

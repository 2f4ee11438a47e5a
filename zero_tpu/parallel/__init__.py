"""Parallel execution (L4): device mesh, param sharding, jitted train step.

TPU-native replacement for the reference's in-graph GPU towers
(utils/parallel.py), gradient-averaging (":134-208") and gradient-
accumulation cycle ops (utils/cycle.py): one jitted SPMD step over a
('data', 'model') Mesh; XLA/GSPMD inserts the collectives over ICI.
"""

from zero_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, param_sharding, batch_sharding, shard_tree)
from zero_tpu.parallel.ring import (  # noqa: F401
    ring_self_attention, set_active_mesh)
from zero_tpu.parallel.train_step import (  # noqa: F401
    TrainState, init_train_state, make_train_step, stack_microbatches)

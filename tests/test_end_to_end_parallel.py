"""End-to-end driver runs with the extension mesh axes active.

Covers the train()-driver wiring the unit suites can't: make_mesh from
config with seq/pipe axes, ring.set_active_mesh publication, and the
pipelined/ring-routed train step learning a real (tiny) task through
the full CLI path on the 8-device CPU mesh.
"""

import numpy as np
import pytest

from zero_tpu import run as cli
from zero_tpu import train as graph
from zero_tpu.config import default_config, save_parameters
from zero_tpu.vocab import Vocab

from tests.test_end_to_end import _params, copy_task  # noqa: F401

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`


def _train_and_eval(copy_task, out, **over):  # noqa: F811
    params = _params(copy_task, out, max_training_steps=700,
                     eval_freq=100000, save_freq=700, disp_freq=350,
                     lrate=5e-3, **over)
    save_parameters(params, params.output_dir)
    params = cli.setup_recorder(params)
    graph.train(params)
    eval_params = _params(copy_task, out, **over)
    return graph.evaluate(eval_params)


def test_train_with_sequence_parallel_mesh(copy_task, tmp_path):  # noqa: F811
    """mesh_seq=2: driver publishes the mesh, eligible self-attention
    rides the ring route, and the model still learns the copy task."""
    bleu = _train_and_eval(copy_task, tmp_path / "sp",
                           mesh_data=2, mesh_model=2, mesh_seq=2)
    assert bleu > 0.5, bleu


def test_train_with_pipeline_parallel_mesh(copy_task, tmp_path):  # noqa: F811
    """mesh_pipe=2 + scan_layers: the GPipe schedule trains through the
    full driver (2 enc / 2 dec layers, 2 stages)."""
    bleu = _train_and_eval(copy_task, tmp_path / "pp",
                           mesh_data=4, mesh_model=1, mesh_pipe=2,
                           scan_layers=True,
                           num_encoder_layer=2, num_decoder_layer=2)
    assert bleu > 0.5, bleu


def test_train_with_expert_parallel_mesh(copy_task, tmp_path):  # noqa: F811
    """mesh_expert=4 + transformer_moe: expert-stacked FFN weights shard
    over the 'expert' axis and the GSPMD all-to-all dispatch trains the
    copy task through the full driver, then decodes (lossless eval
    routing keeps the cache==dev property under the sharded mesh)."""
    bleu = _train_and_eval(copy_task, tmp_path / "ep",
                           mesh_data=2, mesh_model=1, mesh_expert=4,
                           model_name="transformer_moe",
                           scope_name="transformer_moe",
                           moe_num_experts=4, moe_top_k=1,
                           moe_capacity_factor=2.0)
    assert bleu > 0.5, bleu

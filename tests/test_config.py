import json
import os

from zero_tpu.config import default_config, merge_params, save_parameters


def test_defaults_present():
    cfg = default_config()
    assert cfg.beam_size == 4
    assert cfg.lrate_strategy == "gnmt+"
    assert cfg.batch_or_token == "token"
    assert cfg.num_heads == 8


def test_parse_coercion():
    cfg = default_config()
    cfg.parse("beam_size=8,lrate=0.001,model_name=transformer,"
              "shared_source_target_embedding=True,gpus=[0,1]")
    assert cfg.beam_size == 8 and isinstance(cfg.beam_size, int)
    assert abs(cfg.lrate - 0.001) < 1e-12
    assert cfg.model_name == "transformer"
    assert cfg.shared_source_target_embedding is True
    assert cfg.gpus == [0, 1]


def test_parse_nested_commas():
    cfg = default_config()
    cfg.parse("gpus=[0,1,2],beam_size=2")
    assert cfg.gpus == [0, 1, 2]
    assert cfg.beam_size == 2


def test_merge_priority(tmp_path):
    # cmdline > saved param.json > config file > defaults (run.py:367-376)
    out = tmp_path / "out"
    out.mkdir()
    with open(out / "param.json", "w") as w:
        json.dump({"beam_size": 6, "hidden_size": 256, "lrate": 0.5}, w)
    cfg_file = tmp_path / "config.json"
    with open(cfg_file, "w") as w:
        json.dump({"hidden_size": 128, "filter_size": 99}, w)

    cfg = default_config()
    cfg.output_dir = str(out)
    cfg = merge_params(cfg, config_file=str(cfg_file),
                       parameters="lrate=0.125")
    assert cfg.lrate == 0.125          # cmdline wins
    assert cfg.hidden_size == 128      # config file overrides saved
    assert cfg.beam_size == 6          # saved beats defaults
    assert cfg.filter_size == 99


def test_config_file_python_literal(tmp_path):
    p = tmp_path / "conf.py"
    p.write_text("{'hidden_size': 64, 'dropout': 0.2}")
    cfg = default_config()
    cfg = merge_params(cfg, config_file=str(p), output_dir=str(tmp_path))
    assert cfg.hidden_size == 64


def test_save_round_trip(tmp_path):
    cfg = default_config()
    cfg.beam_size = 12
    save_parameters(cfg, str(tmp_path))
    assert os.path.exists(tmp_path / "param.json")
    cfg2 = default_config()
    cfg2 = merge_params(cfg2, output_dir=str(tmp_path))
    assert cfg2.beam_size == 12

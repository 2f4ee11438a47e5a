"""Worker process for the multi-host integration tests (run via
subprocess).

Usage: python tests/dist_worker.py <coordinator> <nproc> <pid> <data_dir>
           [mode] [max_steps]
Each process owns 4 virtual CPU devices; the job trains the tiny copy
task with 8-way global data parallelism across 2 hosts.

mode "batch" (default): fixed-size batches, no eval.
mode "token": token bucketing (the deterministic shared shape schedule)
    with in-training primary-host eval + sampling.
mode "zero1": token mode + zero_stage=1 + EMA -- optimizer state shards
    over 'data' across the hosts, exercising the collective
    host_fetchable path for checkpoint saves and eval weight fetches.
mode "zero3shard": zero_stage=3 (params themselves cross-host-sharded)
    + sharded checkpoints -- each host writes only its own shard file
    and NO host ever all-gathers the full state (asserted: the
    host_fetchable spy must count zero calls through save/eval).
max_steps: override max_training_steps (resume tests run the worker
    twice with increasing values).
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    coordinator, nproc, pid, data_dir = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "batch"
    max_steps = int(sys.argv[6]) if len(sys.argv) > 6 else 12
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from zero_tpu import run as cli
    from zero_tpu import train as graph
    from zero_tpu.config import default_config, save_parameters
    from zero_tpu.parallel import distributed as dist
    from zero_tpu.vocab import Vocab

    p = default_config()
    p.dist_coordinator = coordinator
    p.dist_num_processes = int(nproc)
    p.dist_process_id = int(pid)
    dist.maybe_initialize(p)
    assert jax.process_count() == int(nproc)
    assert jax.device_count() == 4 * int(nproc)

    p.model_name = "transformer"
    p.scope_name = "transformer"
    fetch_calls = {"n": 0}
    if mode == "zero1":
        # ZeRO-1 moments/EMA shard over 'data' ACROSS the two hosts, so
        # every checkpoint fetch and primary-host eval weight fetch must
        # go through the collective dist.host_fetchable path
        p.zero_stage = 1
        p.ema_decay = 0.999
        mode = "token"
    elif mode == "zero3shard":
        # ZeRO-3 + sharded checkpoints: params/moments/EMA span both
        # hosts; saves must write per-host shard files WITHOUT any host
        # materializing the full tree -- spy on host_fetchable (the
        # monolithic path's all-gather) and prove it is never called
        p.zero_stage = 3
        p.ema_decay = 0.999
        mode = "token"
        orig_fetch = dist.host_fetchable

        def _spy(tree):
            fetch_calls["n"] += 1
            return orig_fetch(tree)
        dist.host_fetchable = _spy
    p.hidden_size = 32
    p.embed_size = 32
    p.filter_size = 64
    p.num_heads = 2
    p.num_encoder_layer = 1
    p.num_decoder_layer = 1
    p.dropout = p.relu_dropout = p.residual_dropout = p.attention_dropout = 0.0
    p.max_len = 16
    zero3shard = p.zero_stage == 3
    if mode == "token":
        p.batch_or_token = "token"
        p.token_size = 100
        p.eval_freq = 8
        # sampling decodes host-local batches via a collective weight
        # fetch -- exactly the full-tree materialization zero3shard
        # asserts never happens, so it stays off there
        p.sample_freq = 0 if zero3shard else 8
        p.eval_batch_size = 8
        p.beam_size = 2
        p.decode_length = 12
        p.decode_max_len = 24
        p.src_dev_file = os.path.join(data_dir, "dev.src")
        p.tgt_dev_file = os.path.join(data_dir, "dev.tgt")
    else:
        p.batch_or_token = "batch"
        p.batch_size = 8
        p.eval_freq = 0
        p.sample_freq = 0
        p.src_dev_file = ""
        p.tgt_dev_file = ""
    p.lrate = 3e-3
    p.lrate_strategy = "vanilla"
    p.max_training_steps = max_steps
    p.disp_freq = 4
    p.save_freq = 6
    p.epoches = 50
    p.compilation_cache_dir = ""
    p.src_vocab_file = os.path.join(data_dir, "vocab.txt")
    p.tgt_vocab_file = os.path.join(data_dir, "vocab.txt")
    p.src_train_file = os.path.join(data_dir, "train.src")
    p.tgt_train_file = os.path.join(data_dir, "train.tgt")
    p.src_test_file = ""
    p.tgt_test_file = ""
    p.output_dir = os.path.join(data_dir, "out")
    p.src_vocab = Vocab(p.src_vocab_file)
    p.tgt_vocab = Vocab(p.tgt_vocab_file)

    if dist.is_primary():
        save_parameters(p, p.output_dir)
    p = cli.setup_recorder(p)
    resumed_from = p.recorder.step
    graph.train(p)
    if zero3shard:
        assert fetch_calls["n"] == 0, (
            "sharded-checkpoint run materialized the full state via "
            "host_fetchable %d time(s)" % fetch_calls["n"])
        print("NO_FULL_STATE_FETCH ok")
    print("WORKER_OK pid=%s step=%d resumed_from=%d"
          % (pid, p.recorder.step, resumed_from))


if __name__ == "__main__":
    main()

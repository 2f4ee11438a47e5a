"""Training / evaluation / scoring / ensemble drivers (L5).

Counterpart of reference main.py: the epoch/step loop with gradient-
accumulation grouping, NaN abort (or safe_nan skip), periodic
disp/save/eval/sample triggers, mid-epoch resume by skipping `lidx`
batches, dev-BLEU-driven best checkpointing + early stop, EMA weight swap
for eval, final evaluation; plus the eval/score/ensemble entry points.
The reference's tower replication + feed_dict becomes one jitted SPMD step
on a ('data','model') mesh fed by a prefetching, double-buffered pipeline.
"""

from __future__ import annotations

import logging
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from zero_tpu import evalu, lrs
from zero_tpu.data import Dataset
from zero_tpu.models.base import get_model
from zero_tpu.parallel import (init_train_state, make_mesh, make_train_step,
                               stack_microbatches)
from zero_tpu.parallel import distributed as dist
from zero_tpu.parallel import ring
from zero_tpu.parallel.train_step import make_score_step
from zero_tpu.pipeline import Prefetcher
from zero_tpu.saver import Saver
from zero_tpu.search import beam_search

log = logging.getLogger("zero_tpu.train")


def _is_speech(params) -> bool:
    return getattr(params, "data_kind", "text") == "speech"


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(max(a, 1), max(b, 1))


def _make_dataset(params, src, tgt, train=True, data_par: int = 1):
    # the batch dim is sharded over the mesh 'data' axis: pad every batch
    # to a multiple of the data-parallel degree
    bmult = _lcm(params.pad_batch_multiple, data_par) if train else 1
    eval_rows = _lcm(params.eval_batch_size, data_par)
    if _is_speech(params):
        from zero_tpu.audio import SpeechDataset
        # src is the TSV manifest (features \t transcript \t translation);
        # tgt_*_file still names the reference translations for BLEU
        return SpeechDataset(
            src, params.src_vocab, params.tgt_vocab,
            max_len=params.max_len if train else params.eval_max_len,
            max_frame_len=params.max_frame_len,
            batch_or_token=params.batch_or_token if train else "batch",
            data_leak_ratio=params.data_leak_ratio,
            num_mels=params.audio_num_mel_bins,
            pad_seq_multiple=params.pad_seq_multiple,
            pad_batch_multiple=bmult,
            pad_batch_to=0 if train else eval_rows,
            coarse_label_base=params.coarse_label_base,
            context=params.st_context,
            context_max_frame_len=params.context_max_frame_len)
    return Dataset(src, tgt, params.src_vocab, params.tgt_vocab,
                   max_len=params.max_len if train else params.eval_max_len,
                   batch_or_token=params.batch_or_token if train else "batch",
                   data_leak_ratio=params.data_leak_ratio,
                   pad_seq_multiple=params.pad_seq_multiple,
                   pad_batch_multiple=bmult,
                   # eval batches all share one batch shape so the jitted
                   # beam search compiles once per sequence bucket
                   pad_batch_to=0 if train else eval_rows,
                   # reference process_num: forked tokeniser workers for the
                   # first (uncached) pass over the training corpus
                   num_workers=params.process_num if train else 0,
                   # the C++ tokeniser path (exact parity, threaded)
                   vocab_files=(params.src_vocab_file, params.tgt_vocab_file),
                   use_native=params.native_tokenizer)


def _batch_source(params, batch):
    """Dataset batch dict -> the model's encode input (text token matrix or
    the speech {'audio','mask'} dict)."""
    if "src_mask" in batch:
        src = {"audio": jnp.asarray(batch["src"]),
               "mask": jnp.asarray(batch["src_mask"])}
        if "context" in batch:
            src["context"] = jnp.asarray(batch["context"])
            src["context_mask"] = jnp.asarray(batch["context_mask"])
        return src
    return jnp.asarray(batch["src"])


def _batch_features(params, batch):
    """Dataset batch dict -> training/scoring feature dict."""
    if "src_mask" in batch:
        feats = {"audio": batch["src"], "audio_mask": batch["src_mask"],
                 "target": batch["tgt"]}
        if "transcript" in batch:
            feats["transcript"] = batch["transcript"]
        if "context" in batch:
            feats["context"] = batch["context"]
            feats["context_mask"] = batch["context_mask"]
        return feats
    return {"source": batch["src"], "target": batch["tgt"]}


def _pad_rows(source, mult: int):
    """Pad every array leaf's axis 0 up to a multiple of ``mult`` with
    zeros. All-pad rows are legal everywhere (shape-padding invariant);
    returns (padded_source, original_rows)."""
    leaves = jax.tree.leaves(source)
    rows = int(leaves[0].shape[0])
    target = -(-rows // mult) * mult
    if target == rows:
        return source, rows

    def pad(x):
        width = [(0, target - rows)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), width)
    return jax.tree.map(pad, source), rows


def _mesh_decode(run_fn, params, mesh):
    """Wrap a jitted beam-search ``run_fn(weights, source)`` so its batch
    rows are sharded over the mesh 'data' axis: multi-chip decode, the
    counterpart of the reference's N-GPU eval round-robin
    (evalu.py:66-92 + main.py:48-62 placeholder groups). Weights keep
    whatever sharding they carry (replicated for DP, Megatron specs for
    TP, 'data'-sharded for ZeRO-3) -- GSPMD partitions the whole search.
    COLLECTIVE under multi-host (put_eval_batch/fetch_decode_output)."""
    from zero_tpu.parallel import distributed as dist

    data_par = int(mesh.shape["data"])

    def decode(weights, batch):
        source = _batch_source(params, batch)
        source, rows = _pad_rows(source, data_par)
        out = run_fn(weights, dist.put_eval_batch(source, mesh))
        out = dist.fetch_decode_output(out)
        return {k: (v[:rows] if getattr(v, "ndim", 0) > 0 else v)
                for k, v in out.items()}
    return decode


def make_decode_fn(params, model=None, inference=None, mesh=None):
    """Jitted beam-search callable over dataset batch dicts.

    With ``mesh``, batch rows are sharded over the mesh 'data' axis and
    the weights may be mesh-sharded (TP/ZeRO-3); without it, a plain
    single-device jit over host-local weights.
    """
    model = model or get_model(params.model_name)
    inference = inference or model.infer_fn(params)

    if params.model_name == "transformer_ibdecoder":
        from zero_tpu.models.transformer_ibdecoder import unfold
        from zero_tpu.search import ib_beam_search

        @jax.jit
        def _run_ib(weights, source):
            return ib_beam_search(weights, source, inference, params)

        raw_ib = (_mesh_decode(_run_ib, params, mesh) if mesh is not None
                  else lambda weights, batch:
                  _run_ib(weights, _batch_source(params, batch)))

        def decode_ib(weights, batch):
            out = raw_ib(weights, batch)
            z = np.asarray(out["seq"])
            b, k, z_len = z.shape
            y = np.zeros((b, k, z_len), np.int32)
            for bi in range(b):
                for ki in range(k):
                    toks = unfold(z[bi, ki], params.tgt_vocab.eos())
                    y[bi, ki, :len(toks)] = toks
            return {"seq": y, "score": np.asarray(out["score"])}
        return decode_ib

    @jax.jit
    def _run(weights, source):
        return beam_search(weights, source, inference, params)

    if mesh is not None:
        return _mesh_decode(_run, params, mesh)

    def decode(weights, batch):
        return _run(weights, _batch_source(params, batch))
    return decode


def _pad_group_batch(batch, host_group):
    """Pad a host batch to the shape schedule of its cross-host group.

    Every array key is padded to the per-key maximum over the group
    (rows on axis 0, length on axis 1) so each key -- src/tgt, but also
    speech transcript/context, whose lengths are independent of src/tgt
    -- ends up shape-identical across hosts. Zero rows/columns are
    ordinary padding: all-pad rows are legal everywhere in the framework
    (shape-padding invariant).
    """
    out = dict(batch)

    def pad_to(x, length, axis):
        width = [(0, 0)] * x.ndim
        width[axis] = (0, length - x.shape[axis])
        return np.pad(x, width) if length > x.shape[axis] else x

    for key, val in batch.items():
        if not (hasattr(val, "shape") and getattr(val, "ndim", 0) >= 2):
            continue
        rows = max(b[key].shape[0] for b in host_group)
        length = max(b[key].shape[1] for b in host_group)
        out[key] = pad_to(pad_to(val, length, 1), rows, 0)
    return out


def _local_weights(weights):
    """Materialize global params on this host as numpy leaves so the
    primary's local decode jit can re-place them: replicated leaves fetch
    directly; cross-host-sharded leaves (ZeRO-1 EMA, ZeRO-3 params) are
    all-gathered first. COLLECTIVE under multi-host (dist.host_fetchable)
    -- call from ALL processes, outside any is_primary() guard."""
    return jax.tree.map(lambda x: np.asarray(x),
                        dist.host_fetchable(weights))


def _dev_eval(params, decode, weights, dev_dataset, out_prefix: str):
    translations, scores, indices = evalu.decoding(
        lambda batch: decode(weights, batch), dev_dataset, params)
    bleu = evalu.eval_metric(translations, params.tgt_dev_file, indices)
    if out_prefix:
        evalu.dump_translation(translations, out_prefix, indices)
    return bleu, translations


def train(params) -> bool:
    # Preemption safety: TPU pods are routinely preempted with SIGTERM +
    # a grace window. An orderly handler turns that into a normal
    # checkpoint + recorder save and a clean exit, so `--mode train` on
    # the same output_dir resumes mid-epoch (record.json fast-forward)
    # with nothing lost but the steps since the last save. The flag is
    # polled once per step; the handler itself does no jax work (it may
    # fire inside a dispatch).
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True

    try:
        prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:           # not the main thread (library use)
        prev_sigterm = None
    try:
        return _train(params, preempted)
    finally:
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)


def _train(params, preempted) -> bool:
    model = get_model(params.model_name)
    nproc = dist.process_count()
    pid = dist.process_index()
    mesh = make_mesh(params)
    log.info("Mesh: %s", mesh)
    ring.set_active_mesh(mesh)  # enables ring attention when 'seq' > 1
    data_par = int(mesh.shape["data"])
    # Multi-host batches must be shape-identical across hosts. Token
    # bucketing stays available: every host builds the SAME deterministic
    # batch stream (np.random is seeded identically in run.py, and the
    # old round-robin already relied on stream equality), takes one batch
    # of each consecutive group of nproc, and pads it to the group's max
    # shape -- a shared shape schedule with zero communication.
    # In-training dev eval decodes over the WHOLE mesh: the eval stream
    # is identical on every host, so all processes feed their device
    # shards of every batch and all-gather the outputs (collective;
    # _mesh_decode). Every mesh axis rides: DP shards the rows,
    # TP/ZeRO/PP/EP weight shardings flow into the decode jit as input
    # layouts GSPMD partitions around (pipe-stacked layer slices become
    # per-layer gathers, expert stacks keep their all-to-all dispatch),
    # and a 'seq' axis shards the eval encoder through ring attention
    # when lengths divide (lq=1 decode steps and cross-attention stay
    # dense). Equality oracles: tests/test_decode_sharded.py
    # (seq/pipe/expert legs) -- so the reference's always-on dev-BLEU
    # gating (main.py:356-404) holds under every parallelism mode.
    # sampling decodes each host's OWN last batch (host-local content, so
    # it cannot ride the collective mesh decode): the primary fetches the
    # weights (collective) and decodes locally -- which needs the params
    # replicated, so TP disables sampling under multi-host
    sample_on_primary = nproc > 1 and int(mesh.shape.get("model", 1)) == 1
    if nproc > 1 and int(mesh.shape.get("model", 1)) > 1 \
            and params.sample_freq > 0:
        log.warning("multi-host with tensor parallelism: in-training "
                    "sampling disabled (sample batches are host-local); "
                    "dev eval itself stays on via the collective mesh "
                    "decode")
        params.sample_freq = 0

    train_dataset = _make_dataset(params, params.src_train_file,
                                  params.tgt_train_file, train=True,
                                  data_par=max(data_par // max(nproc, 1), 1))
    dev_dataset = _make_dataset(params, params.src_dev_file,
                                params.tgt_dev_file, train=False,
                                data_par=data_par)

    # model + optimizer state (sharded over the mesh)
    rng = jax.random.PRNGKey(params.random_seed)
    state = init_train_state(model, params, rng, mesh)
    num_params = sum(int(np.prod(x.shape))
                     for x in jax.tree.leaves(state.params))
    log.info("Total trainable variables size: %d", num_params)
    from zero_tpu.parallel.mesh import per_device_bytes
    mb = 1024.0 * 1024.0
    log.info("Per-chip state: params %.1f MB, optimizer %.1f MB, "
             "EMA %.1f MB (zero_stage=%d)",
             per_device_bytes(state.params) / mb,
             per_device_bytes(state.opt_state) / mb,
             per_device_bytes(state.ema) / mb,
             int(getattr(params, "zero_stage", 0)))

    step_fn = make_train_step(model, params, mesh)
    # batch rows shard over the mesh 'data' axis; weights keep their mesh
    # shardings (replicated / TP / ZeRO) -- every chip decodes
    decode = make_decode_fn(params, model, mesh=mesh)
    # plain host-local jit for multi-host primary sampling only
    decode_local = make_decode_fn(params, model) if sample_on_primary \
        else None

    # sharded checkpoints: with ZeRO state spanning hosts, the monolithic
    # format all-gathers the FULL params+moments+EMA to every host per
    # save (the memory ZeRO-3 exists to avoid); the sharded format has
    # each host write only its own shards (saver.py sharded-v1).
    # sharded_checkpoint: "auto" (on iff multi-host + zero_stage>0),
    # or an explicit bool.
    sharded_pref = getattr(params, "sharded_checkpoint", "auto")
    if sharded_pref == "auto":
        sharded_ckpt = nproc > 1 and int(getattr(params, "zero_stage",
                                                 0)) > 0
    else:
        sharded_ckpt = bool(sharded_pref)
    saver = Saver(checkpoints=params.checkpoints,
                  output_dir=params.output_dir,
                  best_checkpoints=params.best_checkpoints,
                  async_save=bool(getattr(params, "async_checkpoint", False)),
                  sharded=sharded_ckpt)

    def _save_all(state, step, bleu=None):
        """Checkpoint + recorder. COLLECTIVE under multi-host: either the
        host_fetchable all-gather (monolithic) or per-host shard writes
        (sharded) -- every process must reach this call together."""
        trees = {"params": state.params, "opt": state.opt_state,
                 "ema": state.ema}
        if saver.sharded:
            saver.save(trees, step, bleu)   # each host writes its shards
        else:
            trees = dist.host_fetchable(trees)
            if dist.is_primary():
                saver.save(trees, step, bleu)
        if dist.is_primary():
            recorder.save_to_json(
                os.path.join(params.output_dir, "record.json"))

    # warm start from a pretrained model, then own dir (main.py:222-226).
    # Restored leaves are host numpy; put them back on the INITIAL
    # state's shardings explicitly (TP/pipe param layout, ZeRO-1 moment
    # layout) rather than letting jit re-place uncommitted arrays.
    def _reshard_like(tree, like):
        if tree is None:
            return None
        return jax.tree.map(
            lambda a, l: jax.device_put(a, l.sharding)
            if hasattr(l, "sharding") else a, tree, like)

    def _adopt(state, restored):
        return state._replace(
            params=_reshard_like(restored["params"], state.params),
            opt_state=_reshard_like(restored["opt"], state.opt_state),
            ema=_reshard_like(restored["ema"], state.ema))

    templates = {"params": state.params, "opt": state.opt_state,
                 "ema": state.ema}
    if params.pretrained_model:
        state = _adopt(state, saver.restore(templates,
                                            params.pretrained_model))
    state = _adopt(state, saver.restore(
        {"params": state.params, "opt": state.opt_state, "ema": state.ema}))

    recorder = params.recorder
    adapt_lr = lrs.get_lr(params)
    adapt_lr.lrate = recorder.lrate

    state = state._replace(step=jnp.asarray(recorder.step, jnp.int32))

    cycle = max(int(params.update_cycle), 1)
    data_rng = jax.random.PRNGKey(params.random_seed + 7)
    should_stop = False
    # host-side step mirror of state.step: fetching the device scalar every
    # step would serialize dispatch through the host (the axon tunnel RTT
    # makes that catastrophic); both are (re)set from the recorder on resume
    step = int(recorder.step)

    for epoch in range(recorder.epoch, params.epoches + 1):
        log.info("Training at Epoch %d", epoch)
        adapt_lr.before_epoch(eidx=epoch)

        # resume point must be captured before the feed threads start:
        # recorder.lidx mutates as steps complete
        resume_epoch, resume_lidx = recorder.epoch, recorder.lidx

        host_queue = Prefetcher(
            lambda: train_dataset.batcher(
                params.batch_size if params.batch_or_token == "batch"
                else params.token_size,
                buffer_size=params.buffer_size,
                shuffle=params.shuffle_batch, train=True),
            maxsize=params.output_queue_size)

        def grouped_device_batches():
            """cross-host grouping + update_cycle grouping + stacking +
            host->device transfer.

            Runs on the feed thread so the device_put of the NEXT batch
            overlaps the current step's execution (true double buffering;
            PARITY §2.2). Multi-host: each process takes position `pid`
            of every consecutive group of nproc batches, padded to the
            group's max shape so the global batch (the concatenation
            across hosts) is well-formed without communication.
            """
            micro_group = []
            host_group = []
            lidx = -1
            for batch in host_queue:
                lidx += 1
                host_group.append(batch)
                if len(host_group) < nproc:
                    continue
                mine = host_group[pid]
                if nproc > 1:
                    mine = _pad_group_batch(mine, host_group)
                host_group = []
                # mid-epoch resume: skip consumed groups (main.py:257-264)
                if epoch == resume_epoch and lidx <= resume_lidx:
                    continue
                micro_group.append(mine)
                if len(micro_group) < cycle:
                    continue
                stacked = stack_microbatches(
                    [_batch_features(params, b) for b in micro_group])
                token_count = int(sum((b["tgt"] > 0).sum()
                                      for b in micro_group))
                shapes = [tuple(b["src"].shape) for b in micro_group]
                sample_batch = micro_group[-1]
                micro_group = []
                device_batch = dist.put_global_batch(stacked, mesh,
                                                     batch_axis=1)
                yield device_batch, token_count, shapes, lidx, sample_batch

        feed = Prefetcher(grouped_device_batches, maxsize=2)

        # tokens/s is measured over the whole disp interval (fetch-to-fetch):
        # dispatch is deeply pipelined on TPU, so the last step's dispatch
        # time says nothing about throughput
        window_tokens = 0
        window_start = time.time()

        for device_batch, token_count, shapes, lidx, batch in feed:
            adapt_lr.step(step)
            lr = adapt_lr.get_lr()

            if params.profiler_dir and step == params.profiler_start_step:
                jax.profiler.start_trace(params.profiler_dir)
                log.info("profiler trace started -> %s", params.profiler_dir)

            state, metrics = step_fn(state, device_batch, lr,
                                     jax.random.fold_in(data_rng, step))
            step += 1
            window_tokens += token_count

            if params.profiler_dir and step == params.profiler_stop_step:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                log.info("profiler trace stopped")

            if step % params.disp_freq == 0:
                loss = float(metrics["loss"])   # drains the dispatch queue
                gnorm = float(metrics["gnorm"])
                pnorm = float(metrics["pnorm"])
                now = time.time()
                duration = now - window_start
                rate = window_tokens / max(duration, 1e-6)
                window_start = now
                window_tokens = 0
                if not params.safe_nan and (np.isnan(loss) or np.isinf(loss)):
                    log.error("Nan or Inf raised at step %d; abort training",
                              step)
                    recorder.estop = True
                    break
                log.info("%d/%d, loss %.3f, gnorm %.2f, pnorm %.2f, "
                         "lr %.6f, batch %s, tokens %d, UD %.3f s, "
                         "%.0f tokens/s",
                         epoch, step, loss, gnorm, pnorm, lr,
                         shapes, token_count, duration,
                         rate)

            recorder.step = step
            recorder.lidx = lidx
            recorder.lrate = float(lr)
            recorder.epoch = epoch

            # Preemption check. Single-host: act on the local flag
            # directly. Multi-host: SIGTERM may reach hosts at different
            # steps (or only some hosts), and _save_all is COLLECTIVE --
            # acting on the local flag alone would deadlock the job at
            # shutdown. Instead every host all-reduces its flag at a
            # shared cadence (tiny scalar collective, every
            # preempt_sync_freq steps) so all hosts take the
            # checkpoint-and-exit branch at the same step.
            preempt_now = preempted["flag"] if nproc == 1 else False
            if nproc > 1 and step % max(
                    int(getattr(params, "preempt_sync_freq", 10)), 1) == 0:
                from jax.experimental import multihost_utils
                preempt_now = bool(multihost_utils.process_allgather(
                    np.int32(preempted["flag"])).max())
            if preempt_now:
                preempted["flag"] = True   # consistent on EVERY host now
                log.warning("SIGTERM received: checkpointing at step %d "
                            "and exiting for preemption", step)
                _save_all(state, step)
                should_stop = True
                break

            if params.save_freq > 0 and step % params.save_freq == 0:
                _save_all(state, step)

            if params.sample_freq > 0 and step % params.sample_freq == 0:
                if nproc == 1:
                    _sample_decode(params, decode,
                                   _eval_weights(params, state), batch)
                elif sample_on_primary:
                    # collective weight fetch on ALL hosts; primary decodes
                    # its own last batch with the host-local jit
                    w = _local_weights(_eval_weights(params, state))
                    if dist.is_primary():
                        _sample_decode(params, decode_local, w, batch)
                # keep the pause out of tokens/s (drop the window's tokens)
                window_start = time.time()
                window_tokens = 0

            if params.eval_freq > 0 and step % params.eval_freq == 0:
                # collective mesh decode: every host feeds its device
                # shards of the (identical) dev stream and all-gathers the
                # outputs, so every host computes the same translations
                # and the same BLEU -- lr schedules and early stop stay in
                # sync with no broadcast (main.py:356-404 runs mid-training
                # eval; the reference's N-GPU eval becomes the 'data'-axis
                # batch sharding inside _mesh_decode)
                bleu, _ = _dev_eval(
                    params, decode, _eval_weights(params, state),
                    dev_dataset,
                    os.path.join(params.output_dir, "trans.txt")
                    if dist.is_primary() else "")
                log.info("Step %d, BLEU %.4f, Best BLEU %.4f", step, bleu,
                         max(saver.best_score, bleu))
                stop_now = record_eval_score(recorder, step, float(bleu),
                                             params.estop_patience)
                _save_all(state, step, bleu)
                adapt_lr.after_eval(float(bleu))
                if stop_now:
                    log.info("Early stopped at step %d", step)
                    break
                # keep the pause out of tokens/s (tokens counted during the
                # pause window are dropped with it)
                window_start = time.time()
                window_tokens = 0

            if step >= params.max_training_steps:
                should_stop = True
                break

        # stop the feed threads promptly so an abandoned epoch (early stop,
        # NaN abort, max steps) cannot keep consuming the dataset generator
        feed.close()
        host_queue.close()
        if recorder.estop or should_stop:
            break
        recorder.lidx = -1
        adapt_lr.after_epoch(eidx=epoch)
        recorder.epoch = epoch + 1

    # final save + eval (main.py:441-466). The preempt flag must agree
    # across hosts before gating the COLLECTIVE final eval: a host whose
    # SIGTERM arrived after the last in-loop sync would otherwise skip
    # the eval other hosts enter (deadlock) -- re-sync it once here.
    if nproc > 1:
        from jax.experimental import multihost_utils
        preempted["flag"] = bool(multihost_utils.process_allgather(
            np.int32(preempted["flag"])).max())
    step = int(state.step)
    _save_all(state, step)
    if preempted["flag"]:
        pass    # exit inside the grace window; skip the final dev eval
    elif params.src_dev_file:
        # collective mesh decode (see the in-training eval path)
        bleu, _ = _dev_eval(params, decode, _eval_weights(params, state),
                            dev_dataset,
                            os.path.join(params.output_dir, "trans.txt")
                            if dist.is_primary() else "")
        log.info("Final BLEU %.4f at step %d", bleu, step)
        _save_all(state, step, bleu)
    saver.wait()
    log.info("Training finished at step %d", step)
    return True


def record_eval_score(recorder, step, bleu, estop_patience):
    """Append an eval score and update the early-stop patience counter.

    Patience counts every eval that does not STRICTLY improve on the
    historical best: the reference checks ``bleu > max(prior scores)``
    against the scores recorded BEFORE this eval (main.py:389-397), so an
    exact tie with the best still increments the counter. Returns True when
    patience is exhausted and training should stop.
    """
    prior_scores = [v[1] for v in recorder.valid_script_scores]
    recorder.history_scores.append([step, bleu])
    recorder.valid_script_scores.append([step, bleu])
    if not prior_scores or bleu > max(prior_scores):
        recorder.bad_counter = 0
        return False
    recorder.bad_counter += 1
    if recorder.bad_counter > estop_patience:
        recorder.estop = True
        return True
    return False


def _eval_weights(params, state):
    """EMA weight swap for eval when enabled (main.py:357-371)."""
    if params.ema_decay > 0 and state.ema is not None:
        return state.ema
    return state.params


def _sample_decode(params, decode, weights, batch) -> None:
    """Decode a handful of training sentences for human inspection
    (main.py:407-421)."""
    n = min(5, len(batch["raw"]))
    small = {k: (v[:n] if hasattr(v, "__getitem__")
                 and not isinstance(v, dict) else v)
             for k, v in batch.items()}
    out = decode(weights, small)
    src = batch["src"][:n]
    seqs = np.asarray(out["seq"])
    for i in range(n):
        src_toks = evalu.decode_target_token(src[i], params.src_vocab)
        ref_toks = evalu.decode_target_token(batch["tgt"][i],
                                             params.tgt_vocab)
        hyp_toks = evalu.decode_target_token(seqs[i][0], params.tgt_vocab)
        log.info("sample %d", i)
        log.info("source:      %s", " ".join(src_toks))
        log.info("reference:   %s", " ".join(ref_toks))
        log.info("translation: %s", " ".join(hyp_toks))


def _restore_eval_params(params, model):
    """Init + restore weights for eval/score modes; EMA weights win when
    enabled (main.py:508-529)."""
    state_params = model.init_fn(jax.random.PRNGKey(params.random_seed),
                                 params)
    saver = Saver(checkpoints=params.checkpoints,
                  output_dir=params.output_dir,
                  best_checkpoints=params.best_checkpoints)
    templates = {"params": state_params}
    if params.ema_decay > 0:
        templates["ema"] = state_params
    restored = saver.restore(templates)
    if params.ema_decay > 0 and restored.get("ema") is not None:
        return restored["ema"]
    return restored["params"]


def _eval_mesh(params):
    """Mesh for the offline eval/score/ensemble modes: single-process
    multi-chip runs shard eval batch rows over 'data' (and weights over
    'model' when TP is configured); multi-process offline modes stay on
    the host-local path (the reference's test mode is single-host too)."""
    if dist.process_count() > 1 or len(jax.devices()) <= 1:
        return None
    try:
        return make_mesh(params)
    except ValueError as e:   # config sized for more chips than we have
        log.warning("eval mesh unavailable (%s); decoding on one device", e)
        return None


def _place_eval_weights(weights, mesh):
    """Host weights -> mesh placement under the TP param specs (replicated
    when mesh_model == 1: every spec axis has degree 1)."""
    from zero_tpu.parallel.mesh import param_sharding
    return jax.device_put(
        weights, param_sharding(weights, mesh, warn_unsharded=False))


def evaluate(params) -> float:
    model = get_model(params.model_name)
    weights = _restore_eval_params(params, model)
    mesh = _eval_mesh(params)
    if mesh is not None:
        weights = _place_eval_weights(weights, mesh)
    decode = make_decode_fn(params, model, mesh=mesh)
    test_dataset = _make_dataset(params, params.src_test_file,
                                 params.tgt_test_file, train=False,
                                 data_par=int(mesh.shape["data"])
                                 if mesh is not None else 1)
    begin = time.time()
    translations, scores, indices = evalu.decoding(
        lambda batch: decode(weights, batch), test_dataset, params)
    bleu = evalu.eval_metric(translations, params.tgt_test_file, indices)
    log.info("Translation Performance, BLEU Score: %.4f, using %.3f s",
             bleu, time.time() - begin)
    out = params.test_output or os.path.join(params.output_dir, "trans.txt")
    evalu.dump_translation(translations, out, indices)
    return bleu


def scorer(params):
    model = get_model(params.model_name)
    weights = _restore_eval_params(params, model)
    score_step = make_score_step(model, params)
    mesh = _eval_mesh(params)
    if mesh is not None:
        weights = _place_eval_weights(weights, mesh)
        data_par = int(mesh.shape["data"])

        def score_fn(batch):
            feats, rows = _pad_rows(_batch_features(params, batch), data_par)
            out = score_step(weights, dist.put_eval_batch(feats, mesh))
            return np.asarray(out)[:rows]
    else:
        def score_fn(batch):
            feats = {k: jnp.asarray(v)
                     for k, v in _batch_features(params, batch).items()}
            return score_step(weights, feats)

    test_dataset = _make_dataset(params, params.src_test_file,
                                 params.tgt_test_file, train=False,
                                 data_par=int(mesh.shape["data"])
                                 if mesh is not None else 1)
    scores, ppl = evalu.scoring(score_fn, test_dataset, params)
    log.info("Average per-sentence score: %.4f, corpus ppl: %.4f",
             float(np.mean(scores)), ppl)
    out = params.test_output or os.path.join(params.output_dir, "scores.txt")
    evalu.dump_translation(scores, out)
    return scores, ppl


def make_ensemble_inference(inferences):
    """Compose N model inferences into one: per-step probability averaging
    (reference main.py:86-103: mean of softmaxes, then log)."""
    from zero_tpu.models.base import Inference

    def encode(all_params, source):
        return [inf.encode(p, source)
                for inf, p in zip(inferences, all_params)]

    def init_cache(all_params, states, batch, max_len):
        return [inf.init_cache(p, s, batch, max_len)
                for inf, p, s in zip(inferences, all_params, states)]

    def decode_step(all_params, prev_tok, states, caches, time):
        probs = None
        new_caches = []
        for inf, p, s, c in zip(inferences, all_params, states, caches):
            logits, new_c = inf.decode_step(p, prev_tok, s, c, time)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = prob if probs is None else probs + prob
            new_caches.append(new_c)
        probs = probs / len(inferences)
        return jnp.log(probs + 1e-20), new_caches

    def decode_prefix(all_params, buffer, states, time):
        probs = None
        for inf, p, s in zip(inferences, all_params, states):
            logits = inf.decode_prefix(p, buffer, s, time)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = prob if probs is None else probs + prob
        probs = probs / len(inferences)
        return jnp.log(probs + 1e-20)

    def reorder_cache(caches, beam_indices, batch, beam_size, time, span=1):
        from zero_tpu.ops.common import gather_beams
        out = []
        for inf, c in zip(inferences, caches):
            if inf.reorder_cache is not None:
                out.append(inf.reorder_cache(c, beam_indices, batch,
                                             beam_size, time, span=span))
            else:
                out.append(jax.tree.map(
                    lambda x: gather_beams(x, beam_indices, batch,
                                           beam_size), c))
        return out

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix,
                     reorder_cache=reorder_cache)


def ensemble(all_params) -> float:
    """Decode with an ensemble of separately-trained models
    (main.py:623-747)."""
    default = all_params[0]
    models = [get_model(p.model_name) for p in all_params]
    weights = [_restore_eval_params(p, m)
               for p, m in zip(all_params, models)]
    inferences = [m.infer_fn(p) for m, p in zip(models, all_params)]
    ens_inf = make_ensemble_inference(inferences)
    mesh = _eval_mesh(default)
    if mesh is not None:
        weights = [_place_eval_weights(w, mesh) for w in weights]
    decode = make_decode_fn(default, models[0], inference=ens_inf,
                            mesh=mesh)

    test_dataset = _make_dataset(default, default.src_test_file,
                                 default.tgt_test_file, train=False,
                                 data_par=int(mesh.shape["data"])
                                 if mesh is not None else 1)
    translations, scores, indices = evalu.decoding(
        lambda batch: decode(weights, batch), test_dataset, default)
    bleu = evalu.eval_metric(translations, default.tgt_test_file, indices)
    log.info("Ensemble Translation Performance, BLEU Score: %.4f", bleu)
    out = default.test_output or os.path.join(default.output_dir, "trans.txt")
    evalu.dump_translation(translations, out, indices)
    return bleu

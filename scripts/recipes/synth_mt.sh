#!/usr/bin/env bash
# synth-MT learning-dynamics run (docs/synth_mt.md): transformer-base on
# the deterministic hard transduction task; records a dev-BLEU trajectory.
#
# Recipe note (measured, 2026-08): post-LN transformer-base NEEDS the
# published Vaswani batching discipline on this task -- ~25k-token steps
# and warmup 4000. Small sentence-batches (160 sents ~ 5k tokens) with
# warmup 1000-2000 plateau in a degenerate unigram attractor (loss ~3.5-4,
# BLEU ~0.01) at EVERY dtype/PRNG setting, while the identical code learns
# fine at small scale and at this recipe (BLEU 0.93 by step 3000).
set -euo pipefail
WORK=${1:-/tmp/synthmt}
OUT=${2:-$WORK/out}
STEPS=${3:-6000}

python -m zero_tpu.scripts.make_synth_mt "$WORK" --train 200000 --dev 1000 \
  --test 1000

python -m zero_tpu.run --mode train --parameters "\
model_name=transformer,scope_name=transformer,\
hidden_size=512,embed_size=512,filter_size=2048,num_heads=8,\
num_encoder_layer=6,num_decoder_layer=6,\
dropout=0.1,residual_dropout=0.1,relu_dropout=0.1,attention_dropout=0.1,\
label_smooth=0.1,default_dtype=bfloat16,\
lrate_strategy=noam,lrate=1.0,warmup_steps=4000,\
batch_or_token=token,token_size=25000,max_len=48,eval_max_len=64,\
decode_max_len=64,beam_size=4,eval_batch_size=50,\
max_training_steps=$STEPS,disp_freq=250,save_freq=1000,eval_freq=1000,\
sample_freq=0,epoches=1000,pad_seq_multiple=16,pad_batch_multiple=16,\
src_vocab_file=$WORK/vocab.src,tgt_vocab_file=$WORK/vocab.tgt,\
src_train_file=$WORK/train.src,tgt_train_file=$WORK/train.tgt,\
src_dev_file=$WORK/dev.src,tgt_dev_file=$WORK/dev.tgt,\
src_test_file=$WORK/test.src,tgt_test_file=$WORK/test.tgt,\
output_dir=$OUT"

# trajectory lives in $OUT/record.json (history_scores: [step, BLEU] pairs)
python - "$OUT" <<'EOF'
import json, sys
rec = json.load(open(sys.argv[1] + "/record.json"))
traj = {"dev_bleu_by_step": rec["history_scores"]}
json.dump(traj, open("docs/synth_mt_trajectory.json", "w"), indent=1)
print(traj)
EOF

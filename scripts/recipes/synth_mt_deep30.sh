#!/usr/bin/env bash
# Deep-30L synth-MT learning-dynamics run (VERDICT r3 #7): the reference's
# deepest published config (30L encoder, DS-Init + merged attention,
# docs/depth_scale_init_and_merged_attention/README.md:70, WMT14 28.86)
# on the deterministic hard transduction task (docs/synth_mt.md).
#
# Depth recipe (measured, docs/synth_mt.md): the synthetic task converges
# before the noam ramp peaks, so deep post-LN stacks need a longer warmup
# than 6L (w=4000 collapsed the 20L run; w=8000 trained 20L cleanly but
# collapsed THIS 30L stack between steps 5500-5750 at lr~3.4e-4 after it
# had reached dev BLEU 0.9959 — the stable-LR threshold keeps dropping
# with depth). w=12000 caps the ramp at 2.0e-4 by step 6000 and trains
# 30L cleanly. scan_layers (one compiled layer body, stacked [L,...]
# params) + per-layer remat.
set -euo pipefail
WORK=${1:-/tmp/synthmt}
OUT=${2:-$WORK/out30}
STEPS=${3:-6000}

[ -f "$WORK/train.src" ] || python -m zero_tpu.scripts.make_synth_mt \
  "$WORK" --train 200000 --dev 1000 --test 1000

python -m zero_tpu.run --mode train --parameters "\
model_name=transformer_fuse,scope_name=transformer_fuse,\
hidden_size=512,embed_size=512,filter_size=2048,num_heads=8,\
num_encoder_layer=30,num_decoder_layer=6,\
deep_transformer_init=True,use_remat=True,scan_layers=True,\
initializer=uniform_unit_scaling,initializer_gain=1.0,\
dropout=0.1,residual_dropout=0.1,relu_dropout=0.1,attention_dropout=0.1,\
label_smooth=0.1,default_dtype=bfloat16,\
lrate_strategy=noam,lrate=1.0,warmup_steps=12000,\
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
json.dump(traj, open("docs/synth_mt_deep30_trajectory.json", "w"), indent=1)
print(traj)
EOF

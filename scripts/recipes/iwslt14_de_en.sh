#!/usr/bin/env bash
# IWSLT14 De-En recipe for zero_tpu: the reference's smallest published
# real-corpus number is Transformer-base 6L = BLEU 34.41 on this task
# (/root/reference/docs/depth_scale_init_and_merged_attention/README.md:59).
# This script is the turnkey parity run for an environment WITH network
# access; the build environment has zero egress and no corpora on disk, so
# the committed evidence uses the deterministic synth-MT task instead
# (zero_tpu/scripts/make_synth_mt.py, docs/synth_mt.md).
set -euo pipefail

WORK=${1:-/tmp/iwslt14}
BPE_OPS=10000
mkdir -p "$WORK" && cd "$WORK"

# 1. Data: the standard fairseq IWSLT14 prep (tokenise with Moses, clean,
#    lowercase, learn joint BPE).
if [ ! -d mosesdecoder ]; then
  git clone https://github.com/moses-smt/mosesdecoder.git
  git clone https://github.com/rsennrich/subword-nmt.git
  wget -q https://dl.fbaipublicfiles.com/fairseq/data/iwslt14/de-en.tgz
  tar xf de-en.tgz
fi
SCRIPTS=mosesdecoder/scripts
for l in de en; do
  cat de-en/train.tags.de-en.$l \
    | grep -v '<url>\|<talkid>\|<keywords>\|<speaker>\|<reviewer\|<translator\|<doc\|</doc>' \
    | sed -e 's/<title>//g;s/<\/title>//g;s/<description>//g;s/<\/description>//g' \
    | perl $SCRIPTS/tokenizer/tokenizer.perl -threads 8 -l $l \
    | perl $SCRIPTS/tokenizer/lowercase.perl > train.tags.$l
done
perl $SCRIPTS/training/clean-corpus-n.perl train.tags de en train.clean 1 175
# dev/test: concatenate the dev sets the usual fairseq way (IWSLT14.TED*)
for l in de en; do
  cat de-en/IWSLT14.TED.dev2010.de-en.$l.xml de-en/IWSLT14.TEDX.dev2012.de-en.$l.xml \
      de-en/IWSLT14.TED.tst2010.de-en.$l.xml de-en/IWSLT14.TED.tst2011.de-en.$l.xml \
      de-en/IWSLT14.TED.tst2012.de-en.$l.xml \
    | grep '<seg id' | sed -e 's/<seg id="[0-9]*">\s*//g;s/\s*<\/seg>\s*//g;s/^\s+//g;s/\s+$//g' \
    | perl $SCRIPTS/tokenizer/tokenizer.perl -threads 8 -l $l \
    | perl $SCRIPTS/tokenizer/lowercase.perl > valid_test.$l
done
head -n 7283 valid_test.de > valid.de; head -n 7283 valid_test.en > valid.en

# 2. Joint BPE
cat train.clean.de train.clean.en > train.joint
python subword-nmt/subword_nmt/learn_bpe.py -s $BPE_OPS < train.joint > bpe.codes
for f in train.clean valid; do
  for l in de en; do
    python subword-nmt/subword_nmt/apply_bpe.py -c bpe.codes < $f.$l > $f.bpe.$l
  done
done

# 3. Vocabulary (shared; zero_tpu vocab builder sorts by frequency)
cat train.clean.bpe.de train.clean.bpe.en > train.bpe.joint
python -m zero_tpu.vocab train.bpe.joint vocab.joint

# 4. Train transformer-base (reference setting: docs/usage + the published
#    base-6L row). One v5e chip; raise mesh_data on a pod slice.
cd /root/repo
python -m zero_tpu.run --mode train --parameters "\
model_name=transformer,scope_name=transformer,\
hidden_size=512,embed_size=512,filter_size=2048,num_heads=8,\
num_encoder_layer=6,num_decoder_layer=6,\
initializer=uniform_unit_scaling,initializer_gain=1.0,\
dropout=0.1,residual_dropout=0.1,relu_dropout=0.1,attention_dropout=0.1,\
label_smooth=0.1,shared_source_target_embedding=True,\
shared_target_softmax_embedding=True,default_dtype=bfloat16,\
lrate_strategy=noam,lrate=1.0,warmup_steps=4000,\
batch_or_token=token,token_size=4096,update_cycle=2,max_len=175,\
eval_max_len=256,beam_size=4,decode_alpha=1.1,eval_batch_size=32,\
max_training_steps=60000,disp_freq=100,save_freq=2000,eval_freq=2000,\
pad_seq_multiple=16,\
src_vocab_file=$WORK/vocab.joint,tgt_vocab_file=$WORK/vocab.joint,\
src_train_file=$WORK/train.clean.bpe.de,tgt_train_file=$WORK/train.clean.bpe.en,\
src_dev_file=$WORK/valid.bpe.de,tgt_dev_file=$WORK/valid.bpe.en,\
src_test_file=$WORK/valid.bpe.de,tgt_test_file=$WORK/valid.bpe.en,\
output_dir=$WORK/out"

# 5. Expectation: dev BLEU in the 34 +/- 0.5 range after ~60k steps
#    (reference published 34.41); decode the test split with --mode test.

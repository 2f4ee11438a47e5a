#!/usr/bin/env bash
# WMT14 En-De recipe for zero_tpu: the reference's headline real-corpus
# numbers live on this task -- Transformer-base 6L = 27.59 BLEU,
# Transformer-big 6L = 29.07, big+fuse 20L = 29.62
# (/root/reference/docs/depth_scale_init_and_merged_attention/README.md:65-71).
# Turnkey parity run for an environment WITH network access; the build
# environment has zero egress and no corpora on disk, so the committed
# evidence uses the deterministic synth-MT ladder instead
# (zero_tpu/scripts/make_synth_mt.py, docs/synth_mt.md).
#
# Usage: wmt14_en_de.sh [WORKDIR] [base|big|deep20]
set -euo pipefail

WORK=${1:-/tmp/wmt14}
VARIANT=${2:-base}
BPE_OPS=32000
mkdir -p "$WORK" && cd "$WORK"

# 1. Data: the Stanford-NMT preprocessed WMT14 En-De the reference's own
#    usage doc points at (/root/reference/docs/usage/README.md:22-35) --
#    already tokenised; dev = newstest2012+2013, test = newstest2014.
BASE=https://nlp.stanford.edu/projects/nmt/data/wmt14.en-de
for f in train.en train.de newstest2012.en newstest2012.de \
         newstest2013.en newstest2013.de newstest2014.en newstest2014.de; do
  [ -f "$f" ] || wget -q "$BASE/$f"
done
cat newstest2012.en newstest2013.en > dev.en
cat newstest2012.de newstest2013.de > dev.de
[ -d subword-nmt ] || git clone https://github.com/rsennrich/subword-nmt.git

# 2. Joint 32k BPE (reference usage step 3)
if [ ! -f bpe32k ]; then
  python subword-nmt/subword_nmt/learn_joint_bpe_and_vocab.py \
    --input train.en train.de -s $BPE_OPS -o bpe32k \
    --write-vocabulary bpevocab.en bpevocab.de
fi
for l in en de; do
  for f in train dev newstest2014; do
    [ -f $f.32k.$l ] || python subword-nmt/subword_nmt/apply_bpe.py \
      --vocabulary bpevocab.$l --vocabulary-threshold 50 -c bpe32k \
      < $f.$l > $f.32k.$l
  done
done

# 3. Shuffle the training corpus (same tool as the reference scripts/)
[ -f train.32k.en.shuf ] || python -m zero_tpu.scripts.shuffle_corpus \
  --corpus train.32k.en train.32k.de
# 4. Vocabulary (shared)
cat train.32k.en train.32k.de > train.32k.joint
[ -f vocab.joint ] || python -m zero_tpu.vocab train.32k.joint vocab.joint

# 5. Train. Geometry per variant; schedules follow the reference's
#    published setups (noam, 4k warmup; big uses more tokens/step).
case "$VARIANT" in
  base)   GEO="hidden_size=512,embed_size=512,filter_size=2048,num_heads=8,\
num_encoder_layer=6,num_decoder_layer=6";      TOK=4096;  CYC=4 ;;
  big)    GEO="hidden_size=1024,embed_size=1024,filter_size=4096,num_heads=16,\
num_encoder_layer=6,num_decoder_layer=6,\
residual_dropout=0.3";                          TOK=3072;  CYC=8 ;;
  deep20) GEO="hidden_size=512,embed_size=512,filter_size=2048,num_heads=8,\
num_encoder_layer=20,num_decoder_layer=20,\
model_name=transformer_fuse,scope_name=transformer_fuse,\
deep_transformer_init=True,scan_layers=True,use_remat=True";
          TOK=4096;  CYC=4 ;;
  *) echo "unknown variant $VARIANT" >&2; exit 1 ;;
esac

cd /root/repo
python -m zero_tpu.run --mode train --parameters "\
model_name=transformer,scope_name=transformer,$GEO,\
initializer=uniform_unit_scaling,initializer_gain=1.0,\
dropout=0.1,relu_dropout=0.1,attention_dropout=0.1,label_smooth=0.1,\
shared_source_target_embedding=True,shared_target_softmax_embedding=True,\
default_dtype=bfloat16,\
lrate_strategy=noam,lrate=1.0,warmup_steps=4000,\
batch_or_token=token,token_size=$TOK,update_cycle=$CYC,max_len=256,\
eval_max_len=256,beam_size=4,decode_alpha=0.6,eval_batch_size=32,\
max_training_steps=300000,disp_freq=100,save_freq=5000,eval_freq=5000,\
checkpoints=10,pad_seq_multiple=16,\
src_vocab_file=$WORK/vocab.joint,tgt_vocab_file=$WORK/vocab.joint,\
src_train_file=$WORK/train.32k.en.shuf,tgt_train_file=$WORK/train.32k.de.shuf,\
src_dev_file=$WORK/dev.32k.en,tgt_dev_file=$WORK/dev.32k.de,\
src_test_file=$WORK/newstest2014.32k.en,tgt_test_file=$WORK/newstest2014.de,\
output_dir=$WORK/out-$VARIANT"

# 6. Average the last 10 checkpoints, decode newstest2014, de-BPE, score
#    detokenized BLEU (multi-bleu-detok.perl equivalent).
python -m zero_tpu.scripts.checkpoint_averaging --checkpoints 10 \
  --path "$WORK/out-$VARIANT" --output "$WORK/avg-$VARIANT"
python -m zero_tpu.run --mode test --parameters "\
eval_batch_size=32,output_dir=$WORK/avg-$VARIANT,\
src_test_file=$WORK/newstest2014.32k.en,tgt_test_file=$WORK/newstest2014.de,\
src_vocab_file=$WORK/vocab.joint,tgt_vocab_file=$WORK/vocab.joint,\
test_output=$WORK/trans-$VARIANT.bpe"
sed -r 's/(@@ )|(@@ ?$)//g' < "$WORK/trans-$VARIANT.bpe" \
  > "$WORK/trans-$VARIANT.txt"
python -m zero_tpu.metric --detok "$WORK/trans-$VARIANT.txt" \
  "$WORK/newstest2014.de"

# Expectation vs the reference's published numbers: base ~27.6, big
# ~29.1, deep20 (fuse) ~29.6 BLEU on newstest2014.

#!/usr/bin/env bash
# Fetch the VQA 2.0 / VQA-CP v2 / Visual Genome / GloVe / bottom-up-attention
# feature data this framework trains on (~90 GB). Same public sources as the
# upstream ReGAT data release (reference download.sh:10-81); the on-disk
# layout matches what tf_vqa_regat_tpu/data expects.
set -e

mkdir -p data

# --- VQA v2 questions -------------------------------------------------------
for split in Train Val Test; do
  wget -P data "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_${split}_mscoco.zip"
  unzip "data/v2_Questions_${split}_mscoco.zip" -d data/Questions
  rm "data/v2_Questions_${split}_mscoco.zip"
done

# --- VQA v2 annotations -----------------------------------------------------
for split in Train Val; do
  wget -P data "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Annotations_${split}_mscoco.zip"
  unzip "data/v2_Annotations_${split}_mscoco.zip" -d data/Answers
  rm "data/v2_Annotations_${split}_mscoco.zip"
done

# --- VQA-CP v2 questions + annotations --------------------------------------
mkdir -p data/cp_v2_questions data/cp_v2_annotations
for split in train test; do
  wget -P data/cp_v2_questions "https://computing.ece.vt.edu/~aish/vqacp/vqacp_v2_${split}_questions.json"
  wget -P data/cp_v2_annotations "https://computing.ece.vt.edu/~aish/vqacp/vqacp_v2_${split}_annotations.json"
done

# --- Visual Genome annotations ----------------------------------------------
mkdir -p data/visualGenome
wget -P data/visualGenome https://convaisharables.blob.core.windows.net/vqa-regat/data/visualGenome/image_data.json
wget -P data/visualGenome https://convaisharables.blob.core.windows.net/vqa-regat/data/visualGenome/question_answers.json

# --- GloVe vectors + dictionary ---------------------------------------------
wget -P data https://convaisharables.blob.core.windows.net/vqa-regat/data/glove.zip
unzip data/glove.zip -d data/glove
rm data/glove.zip

# --- Bottom-up-attention region features ------------------------------------
# adaptive (10-100 boxes/image); WARNING: large
mkdir -p data/Bottom-up-features-adaptive
for f in train val test2015; do
  wget -P data/Bottom-up-features-adaptive "https://convaisharables.blob.core.windows.net/vqa-regat/data/Bottom-up-features-adaptive/${f}.hdf5"
done

# fixed 36 boxes/image; WARNING: large
mkdir -p data/Bottom-up-features-fixed
for f in train36 val36 test2015_36; do
  wget -P data/Bottom-up-features-fixed "https://convaisharables.blob.core.windows.net/vqa-regat/data/Bottom-up-features-fixed/${f}.hdf5"
done

# --- image-id -> feature-index maps -----------------------------------------
wget -P data/ https://convaisharables.blob.core.windows.net/vqa-regat/data/imgids.zip
unzip data/imgids.zip -d data/imgids
rm data/imgids.zip

# --- answer vocabulary + soft-target caches (incl. tfidf npy blobs) ---------
wget -P data https://convaisharables.blob.core.windows.net/vqa-regat/data/cache.zip
unzip data/cache.zip -d data/cache
rm data/cache.zip

# --- pretrained models (reference download.sh:77-81) -------------------------
# The upstream PyTorch ReGAT release's trained weights. With
# tf_vqa_regat_tpu/train/h5_import.py these make `--mode eval --checkpoint
# pretrained_models/...h5` the fastest route to the 63.2% accuracy gate at
# real-data bring-up (no 20-epoch train needed) — REALDATA.md §0.
wget https://convaisharables.blob.core.windows.net/vqa-regat/pretrained_models.zip
unzip pretrained_models.zip -d pretrained_models/
rm pretrained_models.zip

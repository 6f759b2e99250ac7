#!/bin/bash
# Round-9 dedicated sf10 measurement chain (VERDICT r8 #1/#5 evidence):
# run SERIALLY on a quiet machine, one fresh session per group.
set -x
cd /root/repo
SF10=/root/repo/.scale/sf10
SF1=/root/repo/.scale/sf1
# group 1: the starred/inverted decade rows from r8 + the native streaming fix
python tools/spark_sweep.py $SF10 stream_decayed_features stream_tumbling_counts mutual_information_pairs stream_cms_user_counts hybrid_search_rrf
# group 2: round-9 entries at sf1 then sf10 (decade ratios)
python tools/spark_sweep.py $SF1 training_pipeline_e2e bpe_train_batched_merges bpe_encode_large_vocab multimodal_jpeg_progressive_decode stream_decayed_features
python tools/spark_sweep.py $SF10 training_pipeline_e2e bpe_train_batched_merges bpe_encode_large_vocab multimodal_jpeg_progressive_decode
# group 3: solo ALS (the r8 co-load-polluted number)
python tools/spark_sweep.py $SF10 als_recommend
echo CHAIN_DONE

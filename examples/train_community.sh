#!/usr/bin/env bash
# End-to-end smoke run over the core models, mirroring the reference's
# example/train_youtube.sh (/root/reference/example/train_youtube.sh).
# The Youtube-links download is unavailable offline, so gen_graph.py
# synthesizes a community graph with comparable degree structure.
set -e
cd "$(dirname "$0")/.."
NET=/tmp/smore_example_net.txt
python examples/gen_graph.py "$NET"

python -m smore_tpu deepwalk -train "$NET" -save /tmp/ex_deepwalk.txt \
    -undirected 1 -dimensions 64 -walk_times 1 -walk_steps 40 \
    -window_size 5 -negative_samples 5
python -m smore_tpu walklets -train "$NET" -save /tmp/ex_walklets.txt \
    -undirected 1 -dimensions 64 -walk_times 1 -walk_steps 40 \
    -window_min 2 -window_max 5
python -m smore_tpu line -train "$NET" -save /tmp/ex_line1.txt \
    -undirected 1 -dimensions 64 -order 1 -sample_times 10
python -m smore_tpu line -train "$NET" -save /tmp/ex_line2.txt \
    -undirected 1 -dimensions 64 -order 2 -sample_times 10
python -m smore_tpu hpe -train "$NET" -save /tmp/ex_hpe.txt \
    -undirected 1 -dimensions 64 -sample_times 10 -walk_steps 5
echo "done; embeddings in /tmp/ex_*.txt"

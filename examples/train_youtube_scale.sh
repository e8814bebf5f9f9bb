#!/usr/bin/env bash
# Whole-zoo pipeline at Youtube-links scale (role of the reference's
# example/train_youtube.sh, which downloads youtube-links.txt.gz — not
# possible in a zero-egress environment, so a seeded SYNTHETIC stand-in
# with the same scale (~1.1M vertices) and a heavy-tailed degree law is
# generated instead; the reference's per-model configs are preserved).
#
# Usage: ./train_youtube_scale.sh [workdir]      (default /tmp/smore_yt)
set -ex
HERE="$(cd "$(dirname "$0")" && pwd)"
ROOT="$(dirname "$HERE")"
WORK="${1:-/tmp/smore_yt}"
mkdir -p "$WORK"
NET="$WORK/net.txt"

# generate the network (stand-in for: zcat youtube-links.txt.gz | awk ...)
if [ ! -s "$NET" ]; then
  python "$HERE/gen_graph.py" --scale youtube --out "$NET"
fi

SMORE="python -m smore_tpu"
cd "$ROOT"

# run the commands (configs mirror example/train_youtube.sh:17-21)
$SMORE deepwalk -train "$NET" -save "$WORK/rep_dw.txt"    -undirected 1 -dimensions 64 -walk_times 1 -walk_steps 40 -window_size 5 -negative_samples 5 -alpha 0.025
$SMORE walklets -train "$NET" -save "$WORK/rep_wl.txt"    -undirected 1 -dimensions 64 -walk_times 1 -walk_steps 40 -window_min 2 -window_max 5 -negative_samples 5 -alpha 0.025
$SMORE line     -train "$NET" -save "$WORK/rep_line1.txt" -undirected 1 -order 1 -dimensions 64 -sample_times 10 -negative_samples 5 -alpha 0.025
$SMORE line     -train "$NET" -save "$WORK/rep_line2.txt" -undirected 1 -order 2 -dimensions 64 -sample_times 10 -negative_samples 5 -alpha 0.025
$SMORE hpe      -train "$NET" -save "$WORK/rep_hpe.txt"   -undirected 1 -dimensions 64 -sample_times 10 -walk_steps 5 -negative_samples 5 -alpha 0.025
$SMORE bpr      -train "$NET" -save "$WORK/rep_bpr.txt"   -undirected 1 -dimensions 64 -sample_times 10 -alpha 0.025

ls -la "$WORK"/rep_*.txt
echo "train_youtube_scale: all models completed"

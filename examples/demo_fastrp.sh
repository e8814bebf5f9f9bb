#!/usr/bin/env bash
# Mirrors /root/reference/example/demo_fastrp.sh: a 10-node toy graph,
# FastRP three ways (no training -- pure projection).
set -e
cd "$(dirname "$0")/.."
NET=/tmp/fastrp_demo.txt
cat > "$NET" <<'G'
n0 n1 1
n0 n2 1
n1 n2 1
n2 n3 1
n3 n4 1
n4 n5 1
n5 n6 1
n5 n7 1
n6 n7 1
n7 n8 1
n8 n9 1
G
python -m smore_tpu fastrp -train "$NET" -save /tmp/fastrp_plain.txt -dimensions 32
python -m smore_tpu fastrp -train "$NET" -save /tmp/fastrp_norm.txt -dimensions 32 -normalization 0.5
python -m smore_tpu fastrp -train "$NET" -save /tmp/fastrp_deep.txt -dimensions 32 -iterations 5
echo "done"

#!/bin/sh
# Host-side convenience wrapper (role of the reference's smore.sh): run
# the smore-tpu container against edge lists in the current directory.
# Build the image once with:  docker build -t smore-tpu .
if [ $# -lt 1 ]; then
  printf 'Usage:\n  ./smore.sh model_name -train net.txt -save rep.txt [options]\n'
  printf 'Example:\n  ./smore.sh hpe -train net.txt -save rep.txt\n'
  exit 1
fi
IMAGE="${SMORE_IMAGE:-smore-tpu:latest}"
docker run -it --name smore-tpu --rm --user="$(id -u):$(id -g)" \
  -v "$PWD":/opt/smore-tpu/data "$IMAGE" "$@"

#!/usr/bin/env bash
# Container entrypoint (role of the reference's entrypoint.sh): rewrite
# file-path flags onto the mounted data/ volume, then exec the `smore`
# CLI subcommand. Usage (inside the container):
#   entrypoint.sh <model> -train net.txt -save rep.txt [options]
set -e
if [ $# -lt 1 ]; then
  printf 'Usage:\n  entrypoint.sh model_name -train net.txt -save rep.txt [options]\n'
  printf 'Example:\n  entrypoint.sh hpe -train net.txt -save rep.txt\n'
  exit 1
fi
args=( "$@" )
for ((i = 0; i < $#; i++)); do
  next=$((i + 1))
  case "${args[$i]}" in
    -train|-save|-train_target|-train_source|-train_ui|-train_iw|\
    -save_user|-save_item|-save_word|-save_target|-save_source|\
    -save_entity|-save_relation|-field|-walk_meta|-load_v|-load_c|-checkpoint)
      args[$next]="data/${args[$next]}"
      ;;
  esac
done
exec smore "${args[@]}"

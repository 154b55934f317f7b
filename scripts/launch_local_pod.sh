#!/usr/bin/env bash
# Launch an N-process jax.distributed training run on ONE machine — the
# same launch contract a real TPU pod runtime uses (COORDINATOR_ADDRESS +
# JAX_NUM_PROCESSES/JAX_PROCESS_ID; parallel/multihost.py maps it onto
# jax.distributed.initialize). Defaults to 2 CPU processes with 1 virtual
# device each over a data:2 mesh; every process resolves the same run dir
# (coordination-service rendezvous) and Orbax writes one coherent
# checkpoint.
#
# Usage: scripts/launch_local_pod.sh [N] [training flags...]
#   N=2 scripts/launch_local_pod.sh
#   scripts/launch_local_pod.sh 4 --model_name mtan --num_epochs 2
#
# On a real pod, replace the loop with your per-host runtime (one process
# per host, same env vars, coordinator on host 0) and drop --device cpu.
set -euo pipefail
cd "$(dirname "$0")/.."

# N comes from a leading NUMERIC argument or the N env var (documented
# above). Matching digits-only keeps a leading flag ("--model_name ...")
# from being swallowed as the process count.
if [[ "${1:-}" =~ ^[0-9]+$ ]]; then
  N="$1"; shift
else
  N="${N:-2}"
fi
PORT="${PORT:-$((20000 + RANDOM % 20000))}"

# keep user-supplied flags word-intact (--run_name "my run" must not
# re-split); the default only applies when no flags were given
if (($#)); then
  flags=("$@")
else
  flags=(--dataset_name synthetic --model_name basic --num_epochs 1
         --batch_size 8 --exp_disabled)
fi

pids=()
for i in $(seq 0 $((N - 1))); do
  JAX_PLATFORMS=cpu \
  COORDINATOR_ADDRESS="127.0.0.1:${PORT}" \
  JAX_NUM_PROCESSES="$N" \
  JAX_PROCESS_ID="$i" \
  python -m vision_mtl_tpu.training --device cpu:1 "${flags[@]}" \
    2>&1 | sed "s/^/[proc $i] /" &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
exit "$rc"

#!/usr/bin/env bash
# Production launch shape: run the checkpointed quality job on a RUNNING Ray
# cluster via `ray job submit` (the north rule's "launched via ray job submit
# on fixed-size clusters"). The job is resumable: resubmitting after a crash
# skips committed input shards (per-file manifests under OUTPUT/_manifest).
#
#   tools/submit_job.sh INPUT_DIR OUTPUT_DIR [extra process args...]
#
# Env:
#   RAY_JOB_ADDRESS   dashboard address (default http://127.0.0.1:8265)
#   SUBCOMMAND        CLI subcommand (default: process; e.g. filter, crawl)
#
# Cluster notes:
#  - start the cluster first: `ray start --head` (+ `ray start --address=...`
#    on worker nodes). The CLI inside the job attaches via RAY_ADDRESS=auto,
#    so it uses the WHOLE cluster, not a local instance.
#  - INPUT/OUTPUT must be on shared storage visible from every node.
#  - for concurrent writers over disjoint input shards pass --shared-output
#    (multi-writer checkpointing; see state/checkpoint.py).
set -euo pipefail

if [ $# -lt 2 ]; then
  echo "usage: $0 INPUT_DIR OUTPUT_DIR [extra process args...]" >&2
  exit 2
fi
INPUT=$1
OUTPUT=$2
shift 2

ADDR=${RAY_JOB_ADDRESS:-http://127.0.0.1:8265}
SUB=${SUBCOMMAND:-process}
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)

if python -c "import aiohttp, ray" >/dev/null 2>&1; then
  # --working-dir ships the package to every node; RAY_ADDRESS=auto makes
  # the driver attach to the existing cluster instead of starting a local
  # one.
  exec ray job submit \
    --address "$ADDR" \
    --working-dir "$REPO_ROOT" \
    --runtime-env-json '{"env_vars": {"RAY_ADDRESS": "auto"}}' \
    -- python -m chinese_corpus_cleaning_ray "$SUB" \
       --input "$INPUT" --output "$OUTPUT" "$@"
fi

# Jobs API needs ray[default] (aiohttp dashboard); a ray[data]-only install
# can still run the SAME driver directly against the running cluster — the
# CLI attaches via RAY_ADDRESS (never starts a private local instance), so
# the execution shape is identical minus the job-server indirection.
echo "[submit_job] Ray Jobs SDK unavailable (ray[default] not installed);" >&2
echo "[submit_job] running the driver directly against the running cluster." >&2
cd "$REPO_ROOT"
RAY_ADDRESS=${RAY_ADDRESS:-auto} exec python -m chinese_corpus_cleaning_ray \
  "$SUB" --input "$INPUT" --output "$OUTPUT" "$@"

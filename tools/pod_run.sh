#!/usr/bin/env bash
# Multi-host TPU pod launcher with auto-resume — the reference's SLURM
# script analog (slurm/script:1-37: 2-day single-GPU jobs, rsync
# results every 30 s, auto-resubmit on preemption).
#
# TPU-native shape: one process per pod host, jax.distributed brought
# up by parallel/distributed.py from HMT_COORDINATOR / HMT_NPROC /
# HMT_PID; the RL training step shards the env batch over the mesh's
# rollout axis (parallel/distributed.shard_train_step). Checkpoints are
# COMPLETE (params+opt+replay+env+rng+curriculum, rl/train.py), so a
# preempted worker resumes exactly from the newest checkpoint — the
# auto-resubmit loop below is the slurm `scontrol requeue` analog.
#
# Usage, on every worker of a pod slice (e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...):
#   HMT_COORDINATOR=<worker0-ip>:8476 HMT_NPROC=<n> HMT_PID=<i> \
#       tools/pod_run.sh experiments/runs/standup_pod [train.py args...]
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_DIR="${1:?usage: pod_run.sh RUN_DIR [train args...]}"
shift || true
mkdir -p "$RUN_DIR"

while true; do
    CKPT=""
    # newest complete checkpoint, if any (exact-resume tested in
    # tests/test_rl_env.py::test_full_state_checkpoint_resume)
    LATEST=$(ls -t "$RUN_DIR"/ckpt_*.pkl 2>/dev/null | head -1 || true)
    [ -n "$LATEST" ] && CKPT="--ckpt $LATEST"
    echo "[pod_run] starting (pid=${HMT_PID:-0}/${HMT_NPROC:-1})" \
         "resume='${LATEST:-none}'"
    if python -m humanoid_mujoco_tpu.rl.train \
            --out "$RUN_DIR" $CKPT "$@"; then
        echo "[pod_run] training finished cleanly"
        break
    fi
    echo "[pod_run] worker exited nonzero — resubmitting in 10 s" \
         "(preemption/transient failure; slurm/script:28-37 analog)"
    sleep 10
done

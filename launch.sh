#!/usr/bin/env bash
set -Eeuo pipefail

# TPU-native launcher exposing the reference's four entry points and flag
# surface (behavioral contract: /root/reference/launch.sh; parser and
# structure are this repo's own):
#   run   - standard training (scripts/run.py)
#   test  - evaluation only (scripts/test.py)
#   lr    - two-stage learning-rate + scheduler sweep (vmapped replicas)
#   sweep - W&B sweep helper (wraps wandb CLI + scripts/sweep.py)
# plus one rebuild-only mode (the reference has no serving entry point):
#   predict - batch inference over a checkpoint (scripts/predict.py)
#
# Examples:
#   ./launch.sh run -c configs/exp/att_clp/baseline.yaml --wandb 1 --save
#   ./launch.sh test --ckpt best -c my_config.yaml
#   ./launch.sh lr -c configs/config.yaml -g 0,1,2,3
#   ./launch.sh sweep -c configs/sweep.yaml -e myorg -p vit --count 5
#
# TPU notes: -g counts mesh devices (run/test) or parallel replicas
# (lr/sweep); there is no per-process GPU pinning — the lr sweep trains
# every trial in ONE launch as vmapped replicas over the device mesh.

usage() {
  cat <<'HELP'
usage: ./launch.sh [run|test|lr|sweep|predict] [options] [-- passthrough args]

modes
  run    train (+ final test) with scripts/run.py        [default]
  test   evaluate a checkpoint with scripts/test.py
  lr     two-stage LR/scheduler search:
           stage 1: 7 LRs x scheduler none
           stage 2: best LR x {plateau(0.8/10), cosine, none}
         artifacts land in opt_runs/sweep/parallel_sweep_<ts>/
         (summary.yaml, best_config.yaml); --dry-run previews the grid
  sweep  create a W&B sweep and start one agent (one TPU process/host)
  predict  batch inference with scripts/predict.py; serving flags
           (--input/--output/--perf-preset/--precision/--limit/--proba/
           --quantize int8|int8-w8a8|int8-wo/--calibrate) pass through

options
  -c, --config PATH     YAML config (run/test/lr; sweep: the sweep YAML)
      --sweep-config P  explicit sweep YAML (sweep mode alternative to -c)
  -g, --gpu VALUE       run/test: mesh device count
                        lr/sweep: comma-separated replica ids
  -w, --wandb {0,1}     W&B logging on/off                 [1]
  -d, --debug INT       debug level forwarded to scripts    [0]
      --save            save checkpoints
      --ckpt SPEC       best | last | path (test / resume)
      --dry-run         lr mode: print the sweep plan, train nothing
      --engine MODE     lr mode: vmap (default, whole grid in one compile)
                        or sequential (one full-fidelity Experiment per
                        trial — ring/pipeline configs train UNSUBSTITUTED)
  -e, --entity NAME     W&B entity (sweep mode; or $WANDB_ENTITY)
  -p, --project NAME    W&B project (sweep mode)            [vit-test]
      --count N         trials per W&B agent
  -h, --help            this text

Unrecognized options are forwarded verbatim to the underlying script
(run/test modes), e.g. extra argparse flags of scripts/run.py.
HELP
}

die() { echo "launch.sh: $*" >&2; exit 1; }

# ---- defaults + flag parsing ------------------------------------------------
mode=run
cfg_path=""
sweep_cfg=""
devices=""
wandb_on=1
debug_lvl=0
save_ckpts=0
ckpt_spec=""
dry_run=0
sweep_engine=vmap
wb_entity="${WANDB_ENTITY:-}"
wb_project="${WANDB_PROJECT:-vit-test}"
agent_trials=""
passthru=()

case "${1:-}" in run|test|lr|sweep|predict) mode=$1; shift;; esac

while (($#)); do
  opt=$1
  case "$opt" in
    -h|--help)        usage; exit 0;;
    --save)           save_ckpts=1;;
    --dry-run)        dry_run=1;;
    -c|--config)      cfg_path=${2:?$opt needs a value}; shift;;
    --sweep-config)   sweep_cfg=${2:?$opt needs a value}; shift;;
    -g|--gpu)         devices=${2:?$opt needs a value}; shift;;
    -w|--wandb)       wandb_on=${2:?$opt needs a value}; shift;;
    -d|--debug)       debug_lvl=${2:?$opt needs a value}; shift;;
    --ckpt)           ckpt_spec=${2:?$opt needs a value}; shift;;
    -e|--entity)      wb_entity=${2:?$opt needs a value}; shift;;
    -p|--project)     wb_project=${2:?$opt needs a value}; shift;;
    --count)          agent_trials=${2:?$opt needs a value}; shift;;
    --engine)         sweep_engine=${2:?$opt needs a value}; shift;;
    *)                passthru+=("$opt");;
  esac
  shift
done

# .env provides data/checkpoint dirs and W&B settings; exported so the
# python layer's ${VAR} config expansion sees them.
if [[ -f ./.env ]]; then
  set -a; source ./.env; set +a
fi

export ROOT="${ROOT:-$PWD}"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"
py="${PYTHON_BIN:-python}"

# ---- mode bodies ------------------------------------------------------------

run_or_test() {
  local script=$1 cfg
  cfg="${cfg_path:-$ROOT/configs/exp/att_clp/baseline.yaml}"
  local -a cmd=("$py" "./scripts/$script" -f "$cfg" -w "$wandb_on" --debug "$debug_lvl")
  if [[ $mode == run ]]; then
    echo "[launch] MODE=run CONFIG=$cfg WANDB=$wandb_on DEBUG=$debug_lvl SAVE=$save_ckpts"
    ((save_ckpts)) && cmd+=(--save)
  else
    echo "[launch] MODE=test CONFIG=$cfg WANDB=$wandb_on DEBUG=$debug_lvl"
  fi
  [[ -n $ckpt_spec ]] && cmd+=(--ckpt "$ckpt_spec")
  [[ -n $devices ]] && cmd+=(-g "$devices")
  ((${#passthru[@]})) && cmd+=("${passthru[@]}")
  echo "[launch] CMD=${cmd[*]}"
  exec "${cmd[@]}"
}

lr_search() {
  local cfg replicas outdir stage_dir best_lr
  cfg="${cfg_path:-$ROOT/configs/config.yaml}"
  replicas="${devices:-${GPUS:-0}}"
  outdir="$ROOT/opt_runs/sweep"
  echo "[launch] MODE=lr CONFIG=$cfg REPLICAS=$replicas DRY_RUN=$dry_run"
  mkdir -p "$outdir"

  local -a grid=(--lr 1e-5 5e-5 1e-4 5e-4 1e-3 5e-3 1e-2)
  if ((dry_run)); then
    "$py" -m vit_tpu.opt.parallel_sweep "$cfg" "${grid[@]}" \
      --schedulers plateau cosine none --gpus "$replicas" --dry-run
    return 0
  fi

  # stage 1: LR grid, no scheduler
  "$py" -m vit_tpu.opt.parallel_sweep "$cfg" "${grid[@]}" \
    --schedulers none --gpus "$replicas" --results-dir "$outdir" \
    --engine "$sweep_engine"
  stage_dir=$(ls -td "$outdir"/parallel_sweep_* 2>/dev/null | head -1)
  [[ -n $stage_dir ]] || die "stage-1 sweep produced no results directory"
  best_lr=$("$py" -c "import yaml,sys; print(yaml.safe_load(open(sys.argv[1]))['best']['config']['lr'])" \
    "$stage_dir/summary.yaml") || die "cannot read best LR from $stage_dir/summary.yaml"
  echo "[launch] Best LR from sweep: $best_lr"

  # stage 2: scheduler grid at the stage-1 winner
  "$py" -m vit_tpu.opt.parallel_sweep "$cfg" \
    --lr "$best_lr" --schedulers plateau cosine none \
    --plateau-factor 0.8 --plateau-patience 10 \
    --gpus "$replicas" --results-dir "$outdir" \
    --engine "$sweep_engine"
  stage_dir=$(ls -td "$outdir"/parallel_sweep_* 2>/dev/null | head -1)

  "$py" - "$stage_dir" <<'PY'
import sys
from pathlib import Path

import yaml

run_dir = Path(sys.argv[1])
summary = run_dir / "summary.yaml"
if not summary.exists():
    print("summary.yaml missing in latest sweep directory")
    raise SystemExit(0)
best = (yaml.safe_load(summary.read_text()) or {}).get("best", {})
cfg = best.get("config", {})
lines = [
    ("LR", cfg.get("lr")),
    ("Scheduler", cfg.get("scheduler", "none")),
]
if cfg.get("scheduler") == "plateau":
    lines += [("Factor", cfg.get("factor")), ("Patience", cfg.get("patience"))]
if best.get("metric") is not None:
    lines.append(("val_mae", f"{best['metric']:.6f}"))
lines.append(("Summary", summary))
if (run_dir / "best_config.yaml").exists():
    lines.append(("Best cfg", run_dir / "best_config.yaml"))
print("──────── Sweep Summary ────────")
for key, val in lines:
    if val is not None:
        print(f"{key:<10}: {val}")
print("────────────────────────────────")
PY
}

predict_mode() {
  local cfg
  cfg="${cfg_path:-$ROOT/configs/exp/att_clp/baseline.yaml}"
  local -a cmd=("$py" "./scripts/predict.py" -f "$cfg")
  [[ -n $ckpt_spec ]] && cmd+=(--ckpt "$ckpt_spec")
  ((${#passthru[@]})) && cmd+=("${passthru[@]}")
  echo "[launch] MODE=predict CONFIG=$cfg CKPT=${ckpt_spec:-best}"
  echo "[launch] CMD=${cmd[*]}"
  exec "${cmd[@]}"
}

wandb_sweep() {
  local sweep_file="${sweep_cfg:-$cfg_path}"
  [[ -n $sweep_file ]] || die "provide -c/--config with a sweep YAML"
  [[ -f $sweep_file ]] || die "sweep config not found: $sweep_file"
  command -v wandb >/dev/null 2>&1 \
    || die "wandb CLI not found (lr mode works without it)"
  [[ -n $wb_entity ]] || die "set --entity or WANDB_ENTITY for sweep mode"

  echo "[launch] Creating sweep: config=$sweep_file entity=$wb_entity project=$wb_project"
  local created sweep_id full_id
  created=$(wandb sweep -e "$wb_entity" -p "$wb_project" "$sweep_file" 2>&1 | tee /dev/stderr)
  sweep_id=$(grep -oE 'Creating sweep with ID: [A-Za-z0-9]+' <<<"$created" | awk '{print $NF}' | tail -n1)
  [[ -n $sweep_id ]] || die "failed to parse sweep ID from wandb output"
  full_id="$wb_entity/$wb_project/$sweep_id"
  echo "[launch] Sweep ID: $full_id"

  # ONE agent per host: a TPU admits a single process (concurrent agents
  # would crash at jax init — the reference's per-GPU pinning has no TPU
  # analogue). Extra -g ids are noted and ignored.
  IFS=',' read -r -a replica_ids <<<"${devices:-0}"
  if ((${#replica_ids[@]} > 1)); then
    echo "[launch] NOTE: ${#replica_ids[@]} replica ids given, but the TPU runs"
    echo "         one exclusive process — starting a single agent (scale out"
    echo "         by running launch.sh sweep on more hosts)"
  fi
  local agent_pid
  if [[ -n $agent_trials ]]; then
    wandb agent --count "$agent_trials" "$full_id" &
  else
    wandb agent "$full_id" &
  fi
  agent_pid=$!
  echo "  -> agent PID $agent_pid"
  trap 'echo; echo "Stopping sweep agent..."; kill "$agent_pid" 2>/dev/null || true; exit 0' INT TERM
  wait
}

case "$mode" in
  run)     run_or_test run.py;;
  test)    run_or_test test.py;;
  lr)      lr_search;;
  sweep)   wandb_sweep;;
  predict) predict_mode;;
esac

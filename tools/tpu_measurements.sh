#!/bin/sh
# Full measurement sweep for the round's new kernels, run sequentially on
# the single tunneled TPU (one holder at a time). Usage:
#   sh tools/tpu_measurements.sh [logfile]
LOG=${1:-/tmp/tpu_measure.log}
cd /root/repo || exit 1
# poll_tpu.sh just confirmed the device answers; skip bench.py's
# per-invocation subprocess probe (a redundant backend init each run)
NERF_TPU_BENCH_SKIP_PROBE=1
export NERF_TPU_BENCH_SKIP_PROBE

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 900 sh -c "$*" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

echo "measurement sweep started $(date -u)" >> "$LOG"

# 1. headline train bench (regression check: ~159k rays/s)
run "NERF_TPU_BENCH_ITERS=20 python bench.py"

# 2. full-image render bench, MLP flagship (regression check: ~350k)
run "NERF_TPU_BENCH_ITERS=5 NERF_TPU_BENCH_MODE=render python bench.py"

# 3. grid family render, three tiers: fused render kernel (interp+decode+
#    composite in one kernel, the headline number)...
run "NERF_TPU_BENCH_ITERS=5 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels python bench.py"
# ...channels-out interp kernel only (XLA decode/composite glue visible)...
run "NERF_TPU_BENCH_ITERS=5 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_NO_FUSED_GRID_RENDER=1 python bench.py"
# ...and pure gathers (the ~13k baseline, same harness)
run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_NO_GRID_KERNEL=1 python bench.py"

# 3b. fused grid render tile sweep (defaults: TILE_RAYS=64 SEG=8 SPS=2)
for tr in 32 64 128; do
  run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_GRID_TILE_RAYS=$tr python bench.py"
done
for sps in 1 2 4; do
  run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_GRID_SPS=$sps python bench.py"
done

# 4. grid kernel microbench (tile/dtype sweep inside the tool)
run "python tools/bench_grid_kernel.py"

# 5. kilonerf train bench: multi-expert step (29.9k measured round-3;
#    needs the long budget — compile alone can exceed 900s)
run2() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 sh -c "$*" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}
run2 "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_SCAN=4 NERF_TPU_BENCH_MODEL=kilonerf python bench.py"

# 5b. plenoxels TRAIN step (gather+scatter bound; no recorded baseline)
run "NERF_TPU_BENCH_ITERS=10 NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_BENCH_SAMPLES=64 python bench.py"

# 6. MLP flagship render at a REDUCED sample budget (the shape occupancy-
#    guided sampling enables at equal quality; same harness, 16+32 samples)
run "NERF_TPU_BENCH_ITERS=5 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_SAMPLES=16 NERF_TPU_BENCH_FINE=32 python bench.py"

# 7. grid family at its KERNEL-NATIVE shape (dense uniform marching, the
#    papers' own sampling mode): fused vs gather (round-3: 162k vs 51k)
run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_BENCH_SAMPLES=256 NERF_TPU_BENCH_FINE=0 python bench.py"
run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_MODEL=plenoxels NERF_TPU_BENCH_SAMPLES=256 NERF_TPU_BENCH_FINE=0 NERF_TPU_NO_GRID_KERNEL=1 python bench.py"

# 8. hierarchical eval with the single-draw fine mode (round-3: 440 ms vs
#    469 merge)
run "NERF_TPU_BENCH_ITERS=3 NERF_TPU_BENCH_MODE=render NERF_TPU_BENCH_FINE_SAMPLING=resample python bench.py"

echo "measurement sweep done $(date -u)" >> "$LOG"

#!/usr/bin/env bash
# Post-recovery measurement battery: re-measures every number the docs
# cite, in one serialized TPU session (ONE process at a time; each probe
# appends to its own JSONL as rows land). Run from the repo root.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ==="
  timeout 6000 "$@"
  echo "=== exit $? ==="
}

run python bench.py
run python benchmarks/bwd_sorted_probe.py
run python benchmarks/northstar_probe.py benchmarks/results/northstar_probe.jsonl
run python benchmarks/northstar_chunked.py benchmarks/results/northstar_probe.jsonl
run python benchmarks/stream_bwd_probe.py
run python benchmarks/df64_probe.py
run python benchmarks/packed_resident_probe.py
run python benchmarks/fused_park_probe.py
# round-3 session 2: wave sweep in the fused/stream kernels + rr backward
run python benchmarks/fused_wave_probe.py
run python benchmarks/stream_wave_probe.py
run python benchmarks/northstar_chunked.py benchmarks/results/northstar_probe.jsonl 50 100 512 2
echo "all probes done"
# round 4: full-park fused steps, BASELINE configs rows, camdist stream
run python benchmarks/northstar_chunked.py benchmarks/results/northstar_probe.jsonl 50 0 512 2
run python benchmarks/baseline_configs_probe.py
run python benchmarks/bwd_d50_probe.py
run python benchmarks/fused_headline_probe.py
run python benchmarks/roofline.py
# round 4 session 2: reverse-phase work + stream ceiling + knob ladders
run python benchmarks/bwd_rev_ablate_probe.py --cases grads_base grads_rev fused_base fused_rev
run python benchmarks/hbmpark_knobs_probe.py --spp 500 --cases park_auto park_rt1024_k3
run python benchmarks/hbmpark_knobs_probe.py --width 1280 --height 768 --depth 25 --spp 100 --cases park_auto
run python benchmarks/stream_hbm_refresh.py
run python benchmarks/configs4_tiled_probe.py --cases k3
run python benchmarks/scan_slots_probe.py
run python benchmarks/rowshape_probe.py

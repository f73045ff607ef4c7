"""Multi-host (multi-PROCESS) execution tests.

Everything else in the suite runs multi-device single-process; these run
the actual ``jax.distributed`` branch (parallel/mesh.py
maybe_initialize_distributed) end-to-end: 2 localhost processes x 2
virtual CPU devices, a global 4-device mesh spanning both, per-host part
writes, stitch, and byte-identical PPM vs the single-process render —
the executable analog of the north-star multi-host flow (SURVEY.md §5
"distributed communication backend"; the reference is single-GPU,
main.cu:81).

The probe logic lives in benchmarks/multihost_probe.py (same code path
the committed benchmarks/results/multihost.json artifact came from).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

from multihost_probe import run_probe  # noqa: E402

TINY = dict(procs=2, devices_per_proc=2, scene_id=2,
            width=64, height=48, samples=2, bounces=4, timeout_s=420)


def test_multihost_oracle_render_stitch_grads(tmp_path):
    rec = run_probe(impl="oracle", grads=True,
                    workdir=str(tmp_path / "oracle"), **TINY)
    assert rec["ppm_identical"]
    assert rec["float_maxdiff_vs_single"] == 0.0
    assert rec["parts"] == 4
    # the cross-process gradient all-reduce produced a real, finite grad
    assert rec["grads"]["scene_grad_norm"] > 0.0


def test_multihost_pallas_shard_map(tmp_path):
    """Render AND the fused Pallas train step (shard_map psum across
    both processes): cross-process bit-identity is asserted inside
    run_probe, plus closeness to a single-process fused step."""
    rec = run_probe(impl="pallas", grads=False, train=True,
                    workdir=str(tmp_path / "pallas"), **TINY)
    assert rec["ppm_identical"]
    assert rec["float_maxdiff_vs_single"] == 0.0
    assert rec["train"]["d_scene_norm"] > 0.0

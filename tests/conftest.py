"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's tiered test strategy (SURVEY.md §4): fast CPU tests are
the default; real-TPU runs happen in bench.py / driver entrypoints.

IMPORTANT: this environment ships an `axon` sitecustomize that registers a
tunneled-TPU PJRT plugin at interpreter start and force-sets jax_platforms to
"axon" (ignoring the JAX_PLATFORMS env var). For fast local tests invoke
pytest with the registration disabled:

    PALLAS_AXON_POOL_IPS= python -m pytest tests/ -x -q

Either way, the config override below pins the test process to CPU.
"""

import os
import sys

# TPU tier (TPUSNARK_TPU_TESTS=1): run ON the real chip — do NOT pin to CPU.
# Run it single-process: `TPUSNARK_TPU_TESTS=1 python -m pytest tests -m tpu -n0 -q`.
# Default tier: virtual 8-device CPU mesh, tpu-marked tests skipped.
TPU_TIER = bool(os.environ.get("TPUSNARK_TPU_TESTS"))

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402  (sitecustomize may already have imported it)

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusnark.utils.jaxcfg import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pytest  # noqa: E402

# Tiered tests, mirroring gnark's `-short` / prover_checks build-tag tiers
# (/root/reference/test/assert_checkcircuit.go:15-29): the default tier is
# the fast CI gate; heavyweight end-to-end cases opt in via the `slow`
# marker and run when TPUSNARK_SLOW_TESTS=1.


def pytest_configure(config):
    if TPU_TIER and getattr(config.option, "numprocesses", None):
        # one chip: parallel xdist workers contend for the TPU and serialize
        # anyway (while double-paying compile); force in-process execution
        config.option.numprocesses = 0
        config.option.dist = "no"


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        # chip tier: ONLY tpu-marked tests (everything else is covered by the
        # CPU tiers and would just burn chip time)
        skip_nontpu = pytest.mark.skip(reason="TPU tier runs only tpu-marked tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_nontpu)
        return
    skip_tpu = pytest.mark.skip(reason="needs the real chip (TPUSNARK_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
    if os.environ.get("TPUSNARK_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow tier (set TPUSNARK_SLOW_TESTS=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

"""Test configuration: force an 8-device CPU mesh before JAX backends initialize.

The container's sitecustomize registers the axon TPU platform and pins
JAX_PLATFORMS=axon; `jax.config.update` below overrides it so the test suite
runs on a virtual 8-device CPU topology — the standard JAX trick for exercising
GSPMD sharding without a TPU slice (SURVEY.md §4). Benchmarks (`bench.py`) still
run on the real chip.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA CPU fast-math reassociates/contracts f32 arithmetic, flipping
# round-half-even ties in the bit-exact CLAHE tests (TPU is exact by default)
if "xla_cpu_enable_fast_math" not in flags:
    flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

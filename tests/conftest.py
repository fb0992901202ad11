"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised on a fake mesh (the standard JAX pattern for
testing distributed code without a TPU slice)."""

import os

# The environment pins JAX_PLATFORMS=axon (a tunneled real TPU) and a
# sitecustomize force-registers that backend at interpreter startup, so env
# vars alone don't stick.  Unit tests must run on the virtual CPU mesh:
# override via jax.config, unless explicitly opted back in.
if os.environ.get("WHISPER_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # Hardware runs are CORRECTNESS validation: force 3-pass f32 matmuls so
    # the f32 torch-oracle tolerances hold on the MXU (default TPU f32
    # precision is bf16-pass, ~1e-2 — enough to fail the tight parity
    # suites while meaning nothing semantically).  Perf is measured by
    # bench.py/tools, never by pytest.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

import pathlib

import numpy as np
import pytest

# Golden CSVs the reference ships in-tree (test/data/), vendored into this
# repo so the suite runs with /root/reference unmounted.
REFERENCE_DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def ref_mel_filter_8x8():
    return np.loadtxt(REFERENCE_DATA / "mel-filter-8x8.csv", delimiter=",")


@pytest.fixture(scope="session")
def ref_mel_spectrogram():
    return np.loadtxt(REFERENCE_DATA / "mel-spectrogram.csv", delimiter=",")

"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment's sitecustomize may register a TPU plugin and select it at
interpreter startup, so env vars alone are not enough — we reconfigure the
already-imported jax module before any backend is initialized (SURVEY.md §4:
multi-chip tests on CPU via device-count spoofing).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compilation cache: the suite's wall time is dominated by
# repeated XLA CPU compiles (DSP buckets, train windows, search programs);
# cached executables make every run after the first start warm
from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

"""Runtime initialization: persistent XLA compilation cache.

First-compile latency on TPU is tens of seconds per program (and worse
through remote-compile tunnels); the DSP chain, train steps, and decoders
each compile per shape bucket. Enabling jax's persistent compilation cache
makes every process after the first reuse the compiled executables, which
turns CLI/bench cold starts from minutes into seconds. Call
``setup_compilation_cache()`` early (the CLI and bench do).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/emg_tpu/xla_cache")


def setup_compilation_cache(cache_dir: str = None) -> bool:
    import jax

    cache_dir = cache_dir or os.environ.get("EMG_TPU_XLA_CACHE", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # pragma: no cover
        log.warning("compilation cache unavailable: %s", e)
        return False

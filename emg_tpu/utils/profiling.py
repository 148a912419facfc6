"""Profiling hooks: jax.profiler traces + named annotations.

The reference has no profiler integration (torch-tb-profiler installed but
never imported — SURVEY.md §5). Here: ``profile_trace`` wraps a code region
in a jax.profiler trace whose perfetto dump lands in the given directory
(view with TensorBoard's profile plugin or ui.perfetto.dev), and
``annotate`` names a region so device ops attribute to it.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('train_step'): ...``"""
    return jax.profiler.TraceAnnotation(name)

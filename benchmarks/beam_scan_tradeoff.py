"""Static-trip scan vs early-exit while_loop device beam (VERDICT r4 item 5).

The r3 restructure runs every search for all S-1 steps as one lax.scan
(steps past max_len are inert) — the right trade when dispatch latency
dominates, but on a directly-attached TPU an early-exit while_loop could
win for short searches: each inert step still costs ~50 us of device work
plus the W=100 cache gathers. This script measures both strategies on the
bench's beam workload at a SHORT (10-step) and LONG (near-S) search, plus
the continuous server's chunked advance under the static scan, and prints
the table for VALIDATION.md. Outputs are asserted identical first.

Run on a TPU-attached host: python benchmarks/beam_scan_tradeoff.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emg_tpu.config import DecodeConfig, ModelConfig  # noqa: E402
from emg_tpu.decode.device_beam import DeviceBeamSearcher  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "benchmarks"))
from fused_beam_check import MAX_FRAMES, build_workload, p50  # noqa: E402


def main():
    print("devices:", jax.devices())
    compiled, dlm, batch, S = build_workload()
    cfg_model = ModelConfig(compute_dtype=DecodeConfig().compute_dtype)
    model = EMGModel(cfg_model)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        jnp.asarray(batch.targets[:, :-1]), MAX_FRAMES, False,
    )
    base = DecodeConfig(BeamWidth=100)

    searchers = {
        "static": DeviceBeamSearcher(
            model, variables, compiled, dlm, base, MAX_FRAMES,
            max_steps=S - 1,
        ),
        "early_exit": DeviceBeamSearcher(
            model, variables, compiled, dlm,
            dataclasses.replace(base, beam_scan="early_exit"),
            MAX_FRAMES, max_steps=S - 1,
        ),
    }

    # short search: 10 decode steps wanted (target_len + extra_steps = 10);
    # long search: max_len pinned at the S-1 cache capacity
    regimes = {"short_10step": 10 - base.extra_steps,
               "long_full": S - 1 - base.extra_steps}
    table = {}
    for regime, tlen in regimes.items():
        outs = {}
        row = {}
        for name, s in searchers.items():
            outs[name] = s.search(batch, tlen)
            row[name + "_p50_ms"] = round(p50(s, batch, tlen), 2)
        h1, s1, w1 = outs["static"]
        h2, s2, w2 = outs["early_exit"]
        assert list(h1) == list(h2) and w1 == w2, f"{regime}: outputs differ"
        assert abs(s1 - s2) < 1e-4, f"{regime}: scores differ {s1} vs {s2}"
        row["winner"] = ("early_exit"
                         if row["early_exit_p50_ms"] < row["static_p50_ms"]
                         else "static")
        table[regime] = row
        print(json.dumps({regime: row}))

    print(json.dumps({
        "recommendation": (
            "early_exit" if all(
                r["winner"] == "early_exit" for r in table.values()
            ) else "static" if all(
                r["winner"] == "static" for r in table.values()
            ) else "split — keep beam_scan knob, default to the long-regime winner"
        ),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()

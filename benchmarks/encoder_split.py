"""Split the encoder forward into CNN-stack vs transformer-stack time.

VALIDATION.md's round-5 window profile localized the accum-window MFU
ceiling to the encoder forward (61.0 ms eval-mode, ~82% of the forward
pass, ~32% utilization). This probe answers the promised follow-up: how
much of that is the raw-EMG ConvStack (+ w_raw_in + decollate gather) and
how much the 6-layer transformer — over the same window microbatches the
window-split probe uses — plus analytic FLOPs per stage so each stage gets
its own utilization number.

Run: python benchmarks/encoder_split.py
"""

import os
import sys
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from emg_tpu.config import ModelConfig  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402


def timed(fn, args, reps=7):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1000.0


def conv_flops(cfg, rows, chunk):
    """Analytic fwd FLOPs for the ConvStack + w_raw_in over packed rows."""
    D = cfg.model_size
    f = 0.0
    t, cin = chunk, 8
    for _ in range(3):
        t_out = t // 2
        f += 2.0 * rows * t_out * 3 * cin * D      # conv1 (k=3, stride 2)
        f += 2.0 * rows * t_out * 3 * D * D        # conv2 (k=3)
        f += 2.0 * rows * t_out * 1 * cin * D      # 1x1 residual
        t, cin = t_out, D
    f += 2.0 * rows * t * D * D                    # w_raw_in
    return f


def transformer_flops(cfg, B, T):
    D, L, F = cfg.model_size, cfg.num_layers_encoder, cfg.feed_forward_layer_size
    per = 4 * 2 * T * D * D + 2 * 2 * T * T * D + 2 * 2 * T * D * F
    return float(B * L * per)


def main():
    _, _, geo, _, _, _ = bench.build_greedy_pipeline()
    frames8 = [int(f) for f in geo["lengths"]]
    frames = frames8 * 13
    from emg_tpu.data.batching import FRAME_BUCKETS, PackedBatch, bucket_up

    groups = defaultdict(list)
    for f in frames:
        groups[bucket_up(f, FRAME_BUCKETS)].append(f)

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = EMGModel(cfg)
    rng = np.random.default_rng(0)

    batches = []
    f_conv = f_tr = 0.0
    for bucket in sorted(groups):
        g = groups[bucket]
        geo_g = bench.packed_geometry(g)
        tlens = np.full(len(g), 8, np.int32)
        targets = np.full((len(g), 48), 42, np.int64)
        b = bench.make_batch(geo_g, targets, tlens)
        b = PackedBatch(
            packed_raw=rng.normal(size=b.packed_raw.shape).astype(np.float32),
            n_rows=b.n_rows, lengths=b.lengths, offsets=b.offsets,
            targets=b.targets, target_lengths=b.target_lengths,
            n_examples=b.n_examples,
        )
        f_conv += conv_flops(cfg, rows=int(b.packed_raw.shape[0]), chunk=1600)
        f_tr += transformer_flops(cfg, B=len(g), T=bucket)
        batches.append((jax.tree.map(jnp.asarray, b), bucket))

    b0, mf0 = batches[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        b0.packed_raw, b0.n_rows, b0.offsets, b0.lengths,
        jnp.asarray(b0.targets[:, :-1]), mf0, False,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    mfs = [mf for _, mf in batches]
    bt = tuple(b for b, _ in batches)

    def consume(x):
        return jnp.sum(jnp.asarray(x, jnp.float32))

    # Full encoder (train-mode BN like the window, no dropout rng needed in
    # eval; we time train=False to match the 61.0 ms VALIDATION line, then
    # train=True for the window-relevant number).
    for train in (False, True):
        rngs = {"dropout": jax.random.PRNGKey(2), "shift": jax.random.PRNGKey(3)}

        @jax.jit
        def enc_full(params, batch_stats, bt):
            tot = 0.0
            for b, mf in zip(bt, mfs):
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    b.packed_raw, b.n_rows, b.offsets, b.lengths, mf,
                    train, method=EMGModel.encode, rngs=rngs,
                    mutable=["batch_stats"] if train else False,
                )
                res = out[0] if train else out
                memory, enc_logits, _ = res
                tot = tot + consume(memory) + consume(enc_logits)
            return tot

        # Conv stack + w_raw_in only (packed rows, no decollate)
        @jax.jit
        def conv_only(params, batch_stats, bt):
            tot = 0.0
            for b, _ in zip(bt, mfs):
                def run(mdl, x, n):
                    h = mdl.conv_blocks(x, n, use_running_average=not train)
                    return mdl.w_raw_in(h)
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    b.packed_raw, b.n_rows, method=run, rngs=rngs,
                    mutable=["batch_stats"] if train else False,
                )
                h = out[0] if train else out
                tot = tot + consume(h)
            return tot

        t_full = timed(enc_full, (params, batch_stats, bt))
        t_conv = timed(conv_only, (params, batch_stats, bt))
        t_tr = t_full - t_conv
        peak = bench.chip_peak_flops()
        print({
            "mode": "train" if train else "eval",
            "encoder_full_ms": round(t_full, 2),
            "conv_stack_ms": round(t_conv, 2),
            "transformer_rest_ms": round(t_tr, 2),
            "conv_util_pct": round(100 * f_conv / (t_conv / 1e3) / peak, 1),
            "transformer_util_pct": round(100 * f_tr / (t_tr / 1e3) / peak, 1),
            "conv_gflops": round(f_conv / 1e9, 1),
            "transformer_gflops": round(f_tr / 1e9, 1),
        }, flush=True)


if __name__ == "__main__":
    main()

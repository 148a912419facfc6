"""The training orchestrator: epochs, accumulation, eval, PER, checkpoints.

Loop structure mirrors the reference train_model (recognition_model.py:52-317):
dynamic-batch samplers with per-epoch reshuffling, per-microbatch train steps
with gradient accumulation, an evaluation pass over 10 dev batches plus a
loss report every ``report_loss`` steps, a greedy-decode PER report (15 train
batches + the full dev set) every ``report_PER`` epochs, best-dev-PER
weights retention, and early stop when the epoch's mean loss rounds to zero.
On top of the reference: full train-state checkpoints for resume, scheduled
sampling and electrode-rotation recipes, and bucketed static shapes so XLA
compiles a handful of programs.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from emg_tpu.config import Config
from emg_tpu.data.batching import (
    FRAME_BUCKETS,
    bucket_up,
    make_packed_batch,
)
from emg_tpu.data.dataset import EMGDataset
from emg_tpu.data.sampler import DynamicBatchSampler
from emg_tpu.decode.greedy import run_greedy
from emg_tpu.models import EMGModel
from emg_tpu.parallel.mesh import mesh_from_config, replicated, shard_batch, shard_params
from emg_tpu.parallel.train_step import (
    make_eval_step,
    make_train_step,
    make_train_window,
)
from emg_tpu.text.metrics import wer
from emg_tpu.train.checkpoint import CheckpointManager
from emg_tpu.train.metrics_writer import MetricsWriter
from emg_tpu.train.state import TrainState, create_train_state

log = logging.getLogger(__name__)


def merge_params(base, loaded):
    """strict=False warm start: take loaded leaves whose shapes match."""

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            return {k: merge(a[k], b[k]) if k in b else a[k] for k in a}
        if hasattr(a, "shape") and hasattr(b, "shape") and a.shape == b.shape:
            return b
        return a

    return merge(base, loaded)


class Trainer:
    def __init__(self, config: Config, trainset: EMGDataset, devset: EMGDataset,
                 writer: MetricsWriter):
        self.config = config
        self.trainset = trainset
        self.devset = devset
        # multi-host: only process 0 writes metrics/TensorBoard files (the
        # scalars are globally reduced inside jit, so they match everywhere)
        from emg_tpu.parallel.distributed import is_primary

        if is_primary():
            self.writer = writer
        else:
            from emg_tpu.train.metrics_writer import NullMetricsWriter

            self.writer = NullMetricsWriter()
        self.model = EMGModel(config.model)
        self._train_steps = {}
        self._eval_steps = {}
        self._windows = {}
        self.ckpt = CheckpointManager(config.paths.output_directory)
        # rbg keys lower to the TPU hardware RNG: ~4.5 ms/step cheaper than
        # threefry for the dropout masks at this model size (the stream
        # differs from the reference's torch RNG either way; PARITY.md)
        self.rng = jax.random.key(config.train.seed, impl="rbg")
        # first-class TPU parallelism (SURVEY.md §2.3): a (data, model) mesh
        # built from --parallel.* flags; params/batches are sharded and the
        # jitted steps compile to one SPMD program with XLA collectives
        self.mesh = mesh_from_config(config.parallel)
        self._dp = int(self.mesh.shape["data"]) if self.mesh is not None else 1
        if self.mesh is not None:
            log.info(
                "parallel mesh: %d data x %d model over %d devices",
                self.mesh.shape["data"], self.mesh.shape["model"],
                self.mesh.devices.size,
            )
            if (config.parallel.sequence_shard
                    and int(self.mesh.shape["model"]) > 1):
                # sequence-parallel encoder: the model applies bare-P
                # sharding constraints, which resolve against the ambient
                # mesh set here for the whole training run
                import dataclasses

                from jax.sharding import set_mesh

                set_mesh(self.mesh)
                self.model = EMGModel(dataclasses.replace(
                    config.model, sequence_shard=True
                ))

    # -- batch assembly ----------------------------------------------------
    def _prepare(self, dataset: EMGDataset, idxs: List[int]):
        examples = [dataset[i] for i in idxs]
        batch = EMGDataset.collate_raw(examples)
        pb = make_packed_batch(
            batch["raw_emg"], batch["lengths"], batch["phonemes_int"],
            chunk=self.config.data.packed_chunk,
            row_multiple=self._dp, batch_multiple=self._dp,
        )
        if self.mesh is not None:
            pb = shard_batch(pb, self.mesh)
        max_frames = bucket_up(max(batch["lengths"]), FRAME_BUCKETS)
        return pb, max_frames, batch

    def _train_step_for(self, max_frames: int):
        if max_frames not in self._train_steps:
            self._train_steps[max_frames] = make_train_step(
                self.model, self.config.train, max_frames
            )
        return self._train_steps[max_frames]

    def _fused_window_enabled(self) -> bool:
        """Resolve TrainConfig.fused_window's None=auto: windows amortize
        per-launch dispatch on accelerator attachments; on CPU-only
        backends dispatch is cheap and each distinct window signature
        would pay a slow XLA:CPU compile, so auto turns them off."""
        fw = self.config.train.fused_window
        if fw is None:
            return jax.default_backend() != "cpu"
        return bool(fw)

    def _window_for(self, max_frames_seq):
        """The fused-window program for this bucket sequence, or None once
        the signature cache is full (new compositions then run through the
        per-microbatch steps — same math, more launches)."""
        if max_frames_seq not in self._windows:
            if len(self._windows) >= self.config.train.window_max_compiles:
                return None
            self._windows[max_frames_seq] = make_train_window(
                self.model, self.config.train, list(max_frames_seq)
            )
        return self._windows[max_frames_seq]

    @staticmethod
    def _plan_windows(batch_lists, start_accum: int, cfg) -> List[int]:
        """Split the epoch's microbatch sequence into fused-window runs.

        The DynamicBatchSampler is deterministic per (seed, epoch), so the
        accumulation trigger (example count reaching batch_size_grad,
        recognition_model.py:92-96 semantics) is known before any step
        runs. Windows cut at each optimizer apply, at every report_loss
        boundary (so the reporting cadence is unchanged), and at a length
        cap that bounds single-program compile size."""
        MAX_WINDOW = 32
        windows: List[int] = []
        accum = start_accum
        run = 0
        for step, idxs in enumerate(batch_lists):
            accum += len(idxs)
            run += 1
            cut = run >= MAX_WINDOW or (step + 1) % cfg.report_loss == 0
            if accum >= cfg.batch_size_grad:
                accum = 0
                cut = True
            if cut:
                windows.append(run)
                run = 0
        if run:
            windows.append(run)
        return windows

    def _prefetch(self, dataset: EMGDataset, batches: List[List[int]],
                  depth: Optional[int] = None):
        """Batch assembly AND device staging on a background thread,
        ``depth`` batches ahead of the device (the reference runs its whole
        DSP front-end on the training thread — SURVEY.md §3.1
        'num_workers=0').

        The worker calls jax.device_put after assembly, so the host->device
        upload is issued while the device computes earlier windows instead
        of riding the next launch's dispatch (measured on v5e: inline-numpy
        uploads cost the accumulation window 38% -> 17% MFU; staged ahead
        they overlap). ``depth`` therefore defaults past the fused-window
        length cap — a window can only launch once ALL its microbatches are
        staged, so a shallow queue would stall the device at every window
        boundary while the host catches up."""
        if depth is None:
            depth = self.config.train.prefetch_depth
        cfg = self.config.train
        n_up = max(1, cfg.stage_threads) if self.mesh is None else 0
        # assembly -> (optional uploader pool) -> ordered consumer. Batches
        # stage as int16 raw rows (half the upload bytes; the train step
        # dequantizes on device) and several device_puts stay in flight at
        # once — per-transfer latency, not bandwidth, limits the
        # relay-attached staging path.
        aq: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        cond = threading.Condition()
        results: Dict[int, tuple] = {}
        errors: List[BaseException] = []
        n_done = [0]

        def assemble():
            try:
                for seq, idxs in enumerate(batches):
                    pb, max_frames, _ = self._prepare(dataset, idxs)
                    if cfg.stage_int16 and self.mesh is None:
                        from emg_tpu.data.batching import quantize_packed_raw

                        pb = quantize_packed_raw(pb)
                    aq.put((seq, pb, max_frames))
            except BaseException as e:  # surface worker errors to the consumer
                with cond:
                    errors.append(e)
                    cond.notify_all()
            finally:
                for _ in range(max(n_up, 1)):
                    aq.put(sentinel)

        def upload():
            try:
                while True:
                    item = aq.get()
                    if item is sentinel:
                        break
                    seq, pb, max_frames = item
                    if n_up > 0:
                        pb = jax.device_put(pb)  # async; transfer in flight
                    with cond:
                        # bound staged-but-unconsumed batches to the queue
                        # depth (each holds HBM)
                        while len(results) >= depth and not errors:
                            cond.wait(timeout=0.5)
                        results[seq] = (pb, max_frames)
                        cond.notify_all()
            except BaseException as e:
                with cond:
                    errors.append(e)
                    cond.notify_all()
            finally:
                with cond:
                    n_done[0] += 1
                    cond.notify_all()

        ta = threading.Thread(target=assemble, daemon=True)
        ta.start()
        ups = [threading.Thread(target=upload, daemon=True)
               for _ in range(max(n_up, 1))]
        for t in ups:
            t.start()

        for seq in range(len(batches)):
            with cond:
                while seq not in results:
                    if errors:
                        raise errors[0]
                    if n_done[0] == len(ups):
                        raise RuntimeError("prefetch workers exited early")
                    cond.wait(timeout=0.5)
                item = results.pop(seq)
                cond.notify_all()
            yield item
        ta.join()
        for t in ups:
            t.join()

    def _eval_step_for(self, max_frames: int):
        if max_frames not in self._eval_steps:
            self._eval_steps[max_frames] = make_eval_step(
                self.model, self.config.train, max_frames
            )
        return self._eval_steps[max_frames]

    # -- initialization ----------------------------------------------------
    def init_state(self) -> TrainState:
        pb, max_frames, _ = self._prepare(self.trainset, [0])
        variables = self.model.init(
            {"params": jax.random.PRNGKey(0)},
            pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
            pb.targets[:, :-1], max_frames, False,
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        if self.config.paths.start_training_from:
            loaded_params, loaded_bs = CheckpointManager(
                self.config.paths.start_training_from
            ).restore_params()
            params = merge_params(params, loaded_params)
            batch_stats = merge_params(batch_stats, loaded_bs)
            log.info("warm started from %s", self.config.paths.start_training_from)
        if self.mesh is not None:
            # shard params before building the optimizer so its moments
            # (zeros_like) inherit the same shardings
            params = shard_params(params, self.mesh)
            batch_stats = jax.device_put(batch_stats, replicated(self.mesh))
        return create_train_state(params, batch_stats, self.config.train)

    # -- evaluation --------------------------------------------------------
    def evaluation_loop(self, state: TrainState, sampler) -> Dict[str, float]:
        totals = {"loss": 0.0, "dec_loss": 0.0, "enc_loss": 0.0}
        steps = 0
        for step, idxs in enumerate(sampler):
            pb, max_frames, _ = self._prepare(self.devset, idxs)
            metrics = self._eval_step_for(max_frames)(
                state.params, state.batch_stats, pb
            )
            for k in totals:
                totals[k] += float(metrics[k])
            steps += 1
            if step + 1 == self.config.train.eval_batches:
                break
        return {k: v / max(steps, 1) for k, v in totals.items()}

    def report_PER(self, state: TrainState, train_sampler, dev_sampler, epoch: int,
                   batch_idx: int) -> float:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def decode_set(dataset, sampler, max_batches=None):
            preds, refs, correct, total = [], [], 0, 0
            for step, idxs in enumerate(sampler):
                pb, max_frames, raw = self._prepare(dataset, idxs)
                S_true = int(max(raw["phonemes_int_lengths"]))
                target_len = S_true - 1
                static_cap = pb.targets.shape[1] - 1
                strings, matrix = run_greedy(
                    self.model, variables, pb, max_frames, target_len, static_cap
                )
                B = len(idxs)
                y = np.full((B, S_true), 42, np.int64)
                for b, p in enumerate(raw["phonemes_int"]):
                    y[b, : len(p)] = p
                matrix = matrix[:B, :S_true]
                preds += strings[:B]
                refs += raw["phonemes"]
                total += y.shape[0] * y.shape[1]
                correct += int((matrix == y).sum())
                if max_batches and step + 1 == max_batches:
                    break
            return preds, refs, correct, total

        t_preds, t_refs, t_corr, t_total = decode_set(
            self.trainset, train_sampler, self.config.train.per_train_batches
        )
        d_preds, d_refs, d_corr, d_total = decode_set(self.devset, dev_sampler)

        train_per = wer(t_refs, t_preds)
        eval_per = wer(d_refs, d_preds)
        log.info("---- Prediction Evaluation ----")
        if d_preds:
            log.info(
                "Evaluation Prediction: %s ---> Reference: %s (PER %.4f)",
                d_preds[0], d_refs[0], wer(d_refs[0], d_preds[0]),
            )
        self.writer.add_scalar("PhonemeErrorRate/Training", train_per, batch_idx)
        self.writer.add_scalar("PhonemeErrorRate/Evaluation", eval_per, batch_idx)
        self.writer.add_scalar("PhonemeErrorRate_Epoch/Training", train_per, epoch)
        self.writer.add_scalar("PhonemeErrorRate_Epoch/Evaluation", eval_per, epoch)
        self.writer.add_scalar(
            "Accuracy_Epoch/Training", round(100 * t_corr / max(t_total, 1), 1), epoch
        )
        self.writer.add_scalar(
            "Accuracy_Epoch/Evaluation", round(100 * d_corr / max(d_total, 1), 1), epoch
        )
        self.writer.flush()
        return eval_per

    # -- the loop ----------------------------------------------------------
    def train(self, state: Optional[TrainState] = None) -> TrainState:
        cfg = self.config.train
        if state is None:
            state = self.init_state()

        train_sampler = DynamicBatchSampler(
            self.trainset, cfg.max_batch_length, cfg.n_buckets,
            shuffle=True, batch_ordering="random", seed=cfg.seed,
        )
        dev_sampler = DynamicBatchSampler(
            self.devset, cfg.max_batch_length, cfg.n_buckets,
            shuffle=True, batch_ordering="random", seed=cfg.seed,
        )

        best_eval_PER = 10.0
        curr_eval_PER = 0.0
        batch_idx = int(state.microbatches)
        run_train: Dict[str, float] = {"loss": 0.0, "dec": 0.0, "enc": 0.0, "n": 0}

        # metric scalars stay on device between report boundaries: a
        # per-microbatch float() would block the host on every step and cap
        # the prefetch/step overlap, so device metrics queue here and are
        # fetched in one drain at report_loss boundaries / epoch end
        pending: List[Dict] = []

        def drain_pending():
            for m in pending:
                loss = float(m["loss"])
                losses.append(loss)
                run_train["loss"] += loss
                run_train["dec"] += float(m["dec_loss"])
                run_train["enc"] += float(m["enc_loss"])
                run_train["n"] += 1
            pending.clear()

        for epoch_idx in range(cfg.n_epochs):
            losses: List[float] = []
            epoch_start = time.time()
            epoch_batches = list(train_sampler)
            # fused accumulation windows: the whole window launches as ONE
            # program (make_train_window) — same grads/RNG/counters as the
            # per-microbatch path (the window inlines the same step bodies
            # in order), minus the per-launch dispatch latency. Window
            # boundaries are planned ahead from the deterministic sampler.
            use_windows = self._fused_window_enabled()
            windows = (
                self._plan_windows(
                    epoch_batches, int(state.accum_examples), cfg
                )
                if use_windows
                else [1] * len(epoch_batches)
            )
            gen = self._prefetch(self.trainset, epoch_batches)
            step = 0
            for wlen in windows:
                group = [next(gen) for _ in range(wlen)]
                window_fn = (
                    self._window_for(tuple(mf for _, mf in group))
                    if use_windows and wlen > 1 else None
                )
                if window_fn is not None:
                    state, ms = window_fn(
                        state, tuple(pb for pb, _ in group), self.rng
                    )
                    pending.extend(ms)
                else:
                    for pb, max_frames in group:
                        state, metrics = self._train_step_for(max_frames)(
                            state, pb, self.rng
                        )
                        pending.append(metrics)
                batch_idx += wlen
                step += wlen

                if step % cfg.report_loss == 0:
                    drain_pending()
                    ev = self.evaluation_loop(state, dev_sampler)
                    n = max(run_train["n"], 1)
                    self.writer.add_scalar("Loss/Training", round(run_train["loss"] / n, 3), batch_idx)
                    self.writer.add_scalar("Loss_Decoder/Training", round(run_train["dec"] / n, 3), batch_idx)
                    self.writer.add_scalar("Loss_Encoder/Training", round(run_train["enc"] / n, 3), batch_idx)
                    self.writer.add_scalar("Loss/Evaluation", round(ev["loss"], 3), batch_idx)
                    self.writer.add_scalar("Loss_Decoder/Evaluation", round(ev["dec_loss"], 3), batch_idx)
                    self.writer.add_scalar("Loss_Encoder/Evaluation", round(ev["enc_loss"], 3), batch_idx)
                    self.writer.flush()
                    run_train = {"loss": 0.0, "dec": 0.0, "enc": 0.0, "n": 0}
            for _ in gen:  # defensive: plan always covers the epoch
                raise AssertionError("window plan shorter than the epoch")

            drain_pending()
            train_sampler.set_epoch(epoch_idx + 1)
            if epoch_idx % cfg.report_PER == 0:
                curr_eval_PER = self.report_PER(
                    state, train_sampler, dev_sampler, epoch_idx, batch_idx
                )
            mean_loss = float(np.mean(losses)) if losses else 0.0
            log.info(
                "-----finished epoch %d - training loss: %.4f (%.1fs)------",
                epoch_idx + 1, mean_loss, time.time() - epoch_start,
            )
            self.ckpt.save(state, "latest", extra={"epoch": epoch_idx})
            if curr_eval_PER < best_eval_PER:
                self.ckpt.save_params(state.params, state.batch_stats, "model")
                best_eval_PER = curr_eval_PER
            if round(mean_loss, 1) == 0.0:
                break
        return state

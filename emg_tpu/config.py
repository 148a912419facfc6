"""Typed configuration tree.

Preserves every flag name/default of the reference CLI (see
reference speech_recognition/recognition_model.py:25-50,
architecture.py:12-20, read_emg.py:26-30, BeamSearch.py:16-20,
data_utils.py:17) as one dataclass tree with CLI override support.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class ModelConfig:
    # reference architecture.py:12-20
    model_size: int = 768
    feed_forward_layer_size: int = 3072
    num_layers_encoder: int = 6
    num_layers_decoder: int = 6
    n_heads_encoder: int = 8
    n_heads_decoder: int = 8
    relative_distance: int = 300
    dropout_model: float = 0.2
    dropout_pos_emb: float = 0.2
    # encoder variant: "transformer" (reference best_model) or "conformer"
    # (the conformer_model recipe from the reference's logs_to_save/)
    encoder_kind: str = "transformer"
    conformer_conv_kernel_size: int = 31
    # number of raw-EMG input channels
    num_channels: int = 8
    # compute dtype for the transformer stack ("bfloat16" or "float32")
    compute_dtype: str = "float32"
    # fuse encoder self-attention into the Pallas flash kernel on BOTH
    # serving and training paths (the training twin has custom_vjp
    # backward kernels with in-kernel hash-RNG dropout). NOTE: with this
    # on, training numerics differ slightly from the XLA path — the
    # dropout mask stream is a hash of (seed, b, h, q, k) rather than the
    # XLA threefry draw, and the kernel accumulates in float32 where XLA
    # autodiff may fuse differently; set False for XLA-path training
    # numerics. Self-gating: engages only on TPU with T a multiple of 256
    # and >= 512 (the measured crossover), so CPU runs and short
    # utterances fall back to the XLA formulation automatically.
    use_flash_attention: bool = True
    # rematerialize encoder layers on backward (jax.checkpoint): trades
    # recompute FLOPs for activation memory on large batches
    remat: bool = False
    # decoder positional encoding: "per_position" (standard sinusoidal), or
    # "reference_batch" replicating the reference's batch-axis PE indexing
    # quirk (architecture.py:126-127) for converted-checkpoint bit parity
    decoder_pe: str = "per_position"
    # sequence parallelism (SURVEY.md §2.3 final row): shard the encoder
    # stream's TIME dim over the mesh "model" axis so long packed buckets
    # (1024/2048 frames) split across chips; XLA SPMD inserts the
    # attention gathers over ICI. Requires an ambient mesh with a "model"
    # axis (jax.sharding.set_mesh) — enable via --parallel.sequence_shard.
    sequence_shard: bool = False


@dataclass
class DataConfig:
    # reference read_emg.py:26-30
    remove_channels: List[int] = field(default_factory=list)
    silent_data_directories: List[str] = field(
        default_factory=lambda: ["./emg_data/silent_parallel_data"]
    )
    voiced_data_directories: List[str] = field(
        default_factory=lambda: [
            "./emg_data/voiced_parallel_data",
            "./emg_data/nonparallel_data",
        ]
    )
    testset_file: str = "testset_largedev.json"
    text_align_directory: str = "text_alignments"
    # reference data_utils.py:17
    normalizers_file: str = "normalizers.pkl"
    # raw-EMG chunk length used for fixed-length packing before the CNN
    # (reference recognition_model.py:77 uses 200*8)
    packed_chunk: int = 1600
    # host-RAM budget for the dataset's loaded-example LRU cache, in bytes
    # (the reference's lru_cache(maxsize=None), read_emg.py:422, grows
    # unboundedly — multi-GB at the 8,055-utterance corpus). 0 disables
    # caching entirely.
    cache_bytes: int = 2 << 30
    # per-utterance DSP execution path: "auto" runs the fused device
    # pipeline on accelerators and scipy on CPU-only backends (XLA:CPU
    # executes the zero-phase IIR scan in seconds per utterance — measured
    # 2.4 s at the 8192-sample bucket); "device"/"scipy" force a path. The
    # two paths agree to the tests' scipy-oracle tolerance.
    dsp_backend: str = "auto"


@dataclass
class TrainConfig:
    # reference recognition_model.py:38-50
    pad: int = 42
    report_PER: int = 1
    report_loss: int = 50
    learning_rate: float = 3e-4
    learning_rate_warmup: int = 1500
    threshold_alpha_loss: float = 0.05  # present in reference, unused there too
    batch_size_grad: int = 100
    n_epochs: int = 200
    n_buckets: int = 16
    max_batch_length: int = 80000
    alpha_loss: float = 0.2
    label_smoothing: float = 0.1  # reference LabelSmoothingLoss epsilon
    seed: int = 42
    # training recipes re-implemented fresh from the reference's named
    # TensorBoard runs (SURVEY.md §2.2 caveat: no source shipped for them)
    # -- Parallel_Schedule_Sampling: probability of replacing teacher-forced
    #    decoder inputs with first-pass model predictions, ramped linearly
    #    from 0 to this value over scheduled_sampling_ramp microbatches
    scheduled_sampling_max_prob: float = 0.0
    scheduled_sampling_ramp: int = 10000
    # -- augmentation_with_electrode_rotation: circularly rotate the 8 EMG
    #    channels by +-1 with this probability per microbatch
    electrode_rotation_prob: float = 0.0
    # -- channel/time dropout (the reference's dead DataLoader.py carried
    #    equivalents at :400-442): zero a random channel / time span
    channel_drop_prob: float = 0.0
    time_drop_prob: float = 0.0
    time_drop_max_samples: int = 160
    # number of dev batches inspected by the in-training evaluation loop
    eval_batches: int = 10
    # number of train batches inspected by report_PER
    per_train_batches: int = 15
    # run each gradient-accumulation window as ONE jitted program
    # (parallel/train_step.make_train_window) instead of one launch per
    # microbatch — identical grads/RNG/counters (the window simply inlines
    # the per-microbatch bodies), but one dispatch per optimizer update.
    # The sampler is deterministic per (seed, epoch), so window
    # composition is known ahead of time. Windows also break at
    # report_loss boundaries so the reporting cadence is unchanged.
    # None = auto: windows on for accelerator backends (they amortize the
    # per-launch dispatch latency that dominates tunnel-attached TPUs) and
    # OFF on CPU-only backends, where dispatch is cheap and every distinct
    # window signature would pay a slow XLA:CPU compile (measured: the
    # reference-scale CPU drill spent ~18 s/microbatch compiling window
    # signatures; per-microbatch steps compile one program per bucket).
    fused_window: "bool | None" = None
    # distinct window signatures (sequence of microbatch bucket shapes)
    # compiled before new compositions fall back to per-microbatch
    # launches — bounds compile time on long runs with reshuffled epochs
    window_max_compiles: int = 64
    # prefetch queue depth (batches assembled AND device_put ahead of the
    # training loop). A fused window launches only once ALL its
    # microbatches are staged, so the depth defaults past the 32-microbatch
    # window cap; each staged batch holds a few MB of HBM.
    prefetch_depth: int = 40
    # stage packed_raw as int16 (data/batching.quantize_packed_raw): halves
    # the dominant host->device upload; dequantized on device at fixed
    # scale. Training numerics move at the BN-stat 1e-5 level (pinned by
    # tests). false restores float32 staging.
    stage_int16: bool = True
    # host->device upload threads in the prefetch stage. Measured on the
    # relay-attached chip (r5 sweep): 1 thread 38.2% host-staged MFU,
    # 2 threads 34.4% — with int16 staging a single uploader keeps up and
    # extra threads only contend on the serialized relay transfer path, so
    # the default is 1; raise it on direct-attached hosts if profiling
    # shows staging gaps.
    stage_threads: int = 1


@dataclass
class DecodeConfig:
    # reference BeamSearch.py:16-20
    BeamWidth: int = 100
    Constrained: bool = True
    LMWeight: float = 0.3
    RunningLengthPenalty: float = 0.85
    FinalLengthPenalty: float = 0.95
    # device-side cap on hypotheses carried between steps (the reference grows
    # the hypo set unboundedly through word-boundary duplication; we cap+mask
    # for static shapes)
    max_hypos: int = 512
    # maximum decode length in excess of the target length (reference uses +10)
    extra_steps: int = 10
    # run beam search as one device program (decode/device_beam.py: prefix
    # tree + hash-table n-gram LM on device, ~14x faster per utterance than
    # the host stepper). Default on; requires Constrained (unconstrained
    # decodes fall back to the host searcher). --decode.device_beam=false is
    # the escape hatch to the float64 host reference implementation.
    device_beam: bool = True
    # utterances decoded per device-beam launch (vmapped search_many);
    # launches are padded to this size so each geometry compiles once
    batch_utterances: int = 8
    # device-beam trip-count strategy: "static" runs all S-1 steps as one
    # lax.scan (steps past max_len are inert), "early_exit" stops a
    # lax.while_loop the moment the search is done. Outputs are identical;
    # benchmarks/beam_scan_tradeoff.py measured early_exit winning BOTH
    # regimes on v5e through the relay (short 10-step: 77.9 vs 145.9 ms;
    # long full-length: 111.9 vs 137.9 ms p50 — 2026-08-18), so it is the
    # default; "static" remains for dispatch-bound links where inert steps
    # are cheaper than a host-visible trip count.
    beam_scan: str = "early_exit"
    # continuous-batching beam serving (decode/continuous.py): >0 runs eval
    # through a pool of this many lanes, refilled the moment a search
    # finishes instead of waiting for the slowest of a lock-step batch
    # (measured 1.45x search_many on mixed-length request streams). 0 = use
    # the lock-step batched path.
    continuous_lanes: int = 0
    # compute dtype for the SERVING paths (saved-model greedy/beam eval):
    # bfloat16 halves decode weight/cache HBM traffic on TPU. Gated by
    # tests/test_reference_parity_fullscale.py::test_fullscale_bf16_serving_parity
    # (flagship-geometry bf16-vs-f32 agreement through the converter).
    # "float32" restores reference-exact serving numerics.
    compute_dtype: str = "bfloat16"
    # NOTE (r5): the fused Pallas decoder token-step kernels were RETIRED
    # after marginal-timing measurements showed the XLA decode_step runs at
    # HBM speed of light for its ~100 MB weight stream (0.20 ms/step at
    # W=100) while the fused step measured 0.52 ms and every individual
    # fused block lost to its XLA equivalent (self 26.5 vs 7.3 us, ffn
    # 12.1 vs 4.0 us) — see VALIDATION.md round 5.
    # int8 weights for the cache-resident decode stack (utils/quantize.py):
    # per-channel int8 storage halves the decoder's per-step weight reads
    # (measured 113.4 -> 57.3 MB). Token parity pinned by
    # tests/test_quantize.py and words-identical on silicon — but beam p50
    # at W=100 is a WASH at this model size (82.1 int8 vs 84.0 bf16 ms XLA
    # step, v5e 2026-08-18, benchmarks/int8_decode_check.py): the step is
    # latency- not weight-bandwidth-bound. Off by default with the
    # measurement cited; worth revisiting only on larger decoder stacks.
    quantize_int8: bool = False


@dataclass
class ParallelConfig:
    # mesh axis sizes; -1 means "all remaining devices"
    data_axis: int = -1
    model_axis: int = 1
    # donate train-state buffers to the jitted step
    donate_state: bool = True
    # multi-host (DCN) training: setting coordinator_address (host:port)
    # runs jax.distributed.initialize before the first backend touch; the
    # mesh then spans the GLOBAL device set and each process feeds its own
    # batch shard (parallel/distributed.py). num_processes/process_id of -1
    # mean "discover from the cluster environment" (TPU pod metadata).
    coordinator_address: str = ""
    num_processes: int = -1
    process_id: int = -1
    # shard the encoder stream's time dim over the model axis (sequence
    # parallelism for the long packed buckets); see ModelConfig.sequence_shard
    sequence_shard: bool = False


@dataclass
class PathsConfig:
    # reference recognition_model.py:26-35
    debug: bool = False
    evaluate_saved_beam_search: Optional[str] = None
    evaluate_saved_greedy_search: Optional[str] = None
    start_training_from: Optional[str] = None
    # resume the full train state (params, optimizer, counters) from
    # <output_directory>/latest — capability the reference lacks
    resume: bool = False
    output_directory: str = "output"
    phonesSet: str = "descriptions/phonesSet"
    vocabulary: str = "descriptions/new_vocabulary"
    dict: str = "descriptions/new_dgaddy-lexicon.txt"
    lang_model: str = "descriptions/lm.arpa"


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    paths: PathsConfig = field(default_factory=PathsConfig)

    def override(self, dotted: str, value: Any) -> None:
        """Set e.g. config.override('train.learning_rate', 1e-4)."""
        parts = dotted.split(".")
        obj = self
        for p in parts[:-1]:
            obj = getattr(obj, p)
        name = parts[-1]
        if not hasattr(obj, name):
            raise KeyError(f"unknown config key: {dotted}")
        current = getattr(obj, name)
        if current is None or not isinstance(value, type(current)):
            value = _coerce(value, current)
        setattr(obj, name, value)

    @classmethod
    def from_args(cls, argv: List[str]) -> "Config":
        """Parse ``--section.key=value`` / ``--key value`` style overrides.

        Bare flag names (no section prefix) are resolved against all
        sections so the reference's flat flag names keep working, e.g.
        ``--learning_rate 1e-4`` maps to ``train.learning_rate``.
        """
        cfg = cls()
        flat = cfg._flat_index()
        i = 0
        args = list(argv)
        while i < len(args):
            a = args[i]
            if not a.startswith("--"):
                i += 1
                continue
            a = a[2:]
            if "=" in a:
                key, val = a.split("=", 1)
                i += 1
            else:
                key = a
                if i + 1 < len(args) and not args[i + 1].startswith("--"):
                    val = args[i + 1]
                    i += 2
                else:
                    val = "true"
                    i += 1
            if "." not in key:
                if key not in flat:
                    raise KeyError(f"unknown flag: --{key}")
                key = flat[key]
            cfg.override(key, val)
        return cfg

    def _flat_index(self):
        index = {}
        for f in dataclasses.fields(self):
            section = getattr(self, f.name)
            for sf in dataclasses.fields(section):
                if sf.name in index:
                    # ambiguous bare names must be qualified
                    index[sf.name] = None
                else:
                    index[sf.name] = f"{f.name}.{sf.name}"
        return {k: v for k, v in index.items() if v is not None}

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _coerce(value: Any, template: Any):
    if template is None and isinstance(value, str):
        # tri-state flags (e.g. train.fused_window None=auto)
        low = value.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        if low in ("none", "auto"):
            return None
        return value
    if isinstance(template, bool):
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(template, int):
        return int(value)
    if isinstance(template, float):
        return float(value)
    if isinstance(template, list):
        if isinstance(value, str):
            items = [v for v in value.split(",") if v != ""]
            wants_int = (template and isinstance(template[0], int)) or all(
                v.lstrip("-").isdigit() for v in items
            )
            if items and wants_int:
                return [int(v) for v in items]
            return items
        return list(value)
    return value

"""CLI entry point — train / greedy-eval / beam-eval dispatch.

Mirrors the reference speech_recognition/recognition_model.py __main__
(:385-420): flag-driven dispatch on evaluate_saved_{beam,greedy}_search,
logging to <output_directory>/log{,_beam_search,_greedy_search}.txt, the
train/dev split announcement, and the same evaluation protocols (batch-1
greedy PER + token accuracy; lexicon+LM beam WER with cleaned text).

  python -m emg_tpu.cli --output_directory out ...             # train
  python -m emg_tpu.cli --evaluate_saved_greedy_search CKPT ...
  python -m emg_tpu.cli --evaluate_saved_beam_search CKPT ...
"""

from __future__ import annotations

import logging
import os
import sys

import numpy as np

from emg_tpu.config import Config

log = logging.getLogger(__name__)


def _setup_logging(output_directory: str, filename: str):
    os.makedirs(output_directory, exist_ok=True)
    logging.basicConfig(
        handlers=[
            logging.FileHandler(os.path.join(output_directory, filename), "w"),
            logging.StreamHandler(),
        ],
        level=logging.INFO,
        format="%(message)s",
        force=True,
    )
    for noisy in ("orbax", "absl", "jax"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def _prepare_single(cfg: Config, testset, i: int):
    from emg_tpu.data.batching import FRAME_BUCKETS, bucket_up, make_packed_batch
    from emg_tpu.data.dataset import EMGDataset

    ex = testset[i]
    batch = EMGDataset.collate_raw([ex])
    pb = make_packed_batch(
        batch["raw_emg"], batch["lengths"], batch["phonemes_int"],
        chunk=cfg.data.packed_chunk,
    )
    max_frames = bucket_up(max(batch["lengths"]), FRAME_BUCKETS)
    return pb, max_frames, batch


def _load_model_for_eval(cfg: Config, ckpt_path: str, testset):
    import dataclasses

    import jax

    from emg_tpu.models import EMGModel
    from emg_tpu.train.checkpoint import CheckpointManager

    # serving runs at decode.compute_dtype (bf16 by default; see the gate
    # cited in DecodeConfig) — params stay float32, activations are cast
    model = EMGModel(dataclasses.replace(
        cfg.model, compute_dtype=cfg.decode.compute_dtype
    ))
    pb, max_frames, _ = _prepare_single(cfg, testset, 0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
        pb.targets[:, :-1], max_frames, False,
    )
    mgr = CheckpointManager(ckpt_path)
    params, batch_stats = mgr.restore_params()
    variables = {"params": params, "batch_stats": batch_stats}
    if cfg.decode.quantize_int8:
        # int8 storage for the decode stack's per-step weight reads
        # (utils/quantize.py). The DeviceBeamSearcher applies this itself;
        # doing it here covers the greedy path too (idempotent).
        from emg_tpu.utils.quantize import quantize_decoder_int8

        variables = quantize_decoder_int8(variables)
    return model, variables


def evaluate_saved_greedy_search(cfg: Config):
    from emg_tpu.data.dataset import EMGDataset
    from emg_tpu.decode.greedy import run_greedy
    from emg_tpu.text.metrics import wer

    testset = EMGDataset(cfg, test=True)
    model, variables = _load_model_for_eval(
        cfg, cfg.paths.evaluate_saved_greedy_search, testset
    )
    references, predictions = [], []
    running_total = running_correct = 0
    for i in range(len(testset)):
        pb, max_frames, raw = _prepare_single(cfg, testset, i)
        S_true = int(raw["phonemes_int_lengths"][0])
        target_len = S_true - 1
        strings, matrix = run_greedy(
            model, variables, pb, max_frames, target_len,
            pb.targets.shape[1] - 1,
        )
        y = np.full((1, S_true), 42, np.int64)
        y[0, : S_true] = raw["phonemes_int"][0]
        matrix = matrix[:1, :S_true]
        predictions += strings[:1]
        references += raw["phonemes"]
        running_total += y.size
        running_correct += int((matrix == y).sum())
        log.info(
            "Prediction:%s ---> Reference:%s  (PER: %s)",
            strings[0], raw["phonemes"][0], wer(raw["phonemes"][0], strings[0]),
        )
    per = wer(references, predictions)
    acc = round(100 * running_correct / max(running_total, 1), 1)
    log.info("PER: %s and accuracy: %s", per, acc)
    return per, acc


def evaluate_saved_beam_search(cfg: Config):
    from emg_tpu.data.dataset import EMGDataset
    from emg_tpu.decode.beam import BeamSearcher
    from emg_tpu.decode.ngram import load_language_model
    from emg_tpu.decode.prefix_tree import init_tree
    from emg_tpu.text.metrics import wer
    from emg_tpu.text.phonemes import TextTransform

    testset = EMGDataset(cfg, test=True)
    model, variables = _load_model_for_eval(
        cfg, cfg.paths.evaluate_saved_beam_search, testset
    )
    tree = init_tree(cfg.paths.phonesSet, cfg.paths.vocabulary, cfg.paths.dict)
    compiled = tree.compile_tables()
    lm = load_language_model(cfg.paths.lang_model)
    tt = TextTransform()

    # the device beam needs lexicon constraints; unconstrained decodes fall
    # back to the host searcher
    use_device = cfg.decode.device_beam and cfg.decode.Constrained
    from emg_tpu.decode.kenlm_binary import is_kenlm_binary

    if use_device and is_kenlm_binary(cfg.paths.lang_model):
        # KenLM *binary* LMs expose only hashed n-gram keys, so the device
        # LM tables (which need enumerable n-grams) cannot be compiled from
        # one; score through the host searcher instead — the reference's own
        # regime (PrefixTree.py:288-290 queries kenlm per hypothesis).
        log.warning(
            "lang_model %s is a KenLM binary: device-beam LM tables need an "
            "enumerable ARPA file, falling back to the host beam searcher "
            "(pass the .arpa to re-enable the device beam)",
            cfg.paths.lang_model,
        )
        use_device = False
    if use_device:
        from emg_tpu.decode.device_beam import DeviceBeamSearcher
        from emg_tpu.decode.device_lm import build_device_lm
        from emg_tpu.decode.ngram import ArpaLanguageModel

        py_lm = (lm if isinstance(lm, ArpaLanguageModel)
                 else ArpaLanguageModel(cfg.paths.lang_model))
        lex_words = [
            compiled.dictionary.lookup_word_by_index(i).name
            for i in range(compiled.dictionary.word_count())
        ]
        dlm = build_device_lm(py_lm, lex_words)

    # pass 1: prepare every utterance and group by compiled geometry
    prepared = []  # (pb, max_frames, target_len, target_text)
    for i in range(len(testset)):
        pb, max_frames, raw = _prepare_single(cfg, testset, i)
        target = raw["phonemes_int"][0][1:]
        target_len = int((target != 40).sum())
        prepared.append((pb, max_frames, target_len, tt.clean_text(raw["text"][0])))

    # pass 2: decode — batched per geometry group on the device path
    words_by_idx = {}
    if use_device:
        device_searchers = {}
        groups = {}
        for i, (pb, max_frames, target_len, _) in enumerate(prepared):
            step_cap = 16 * ((target_len + cfg.decode.extra_steps + 15) // 16)
            key = (max_frames, step_cap, pb.packed_raw.shape[0],
                   pb.targets.shape[1])
            groups.setdefault(key, []).append(i)
        CH = max(cfg.decode.batch_utterances, 1)
        for (max_frames, step_cap, _, _), idxs in groups.items():
            skey = (max_frames, step_cap)
            if skey not in device_searchers:
                device_searchers[skey] = DeviceBeamSearcher(
                    model, variables, compiled, dlm, cfg.decode, max_frames,
                    max_steps=step_cap,
                )
            searcher = device_searchers[skey]
            if cfg.decode.continuous_lanes > 0 and len(idxs) > 1:
                # continuous batching: one lane pool per geometry group,
                # finished lanes refill from the group's queue immediately
                from emg_tpu.decode.continuous import ContinuousBeamServer

                server = ContinuousBeamServer(
                    searcher,
                    lanes=min(cfg.decode.continuous_lanes, len(idxs)),
                )
                outs = server.serve(
                    [(prepared[i][0], prepared[i][2]) for i in idxs]
                )
                for i, out in zip(idxs, outs):
                    words_by_idx[i] = out[2]
                continue
            for c0 in range(0, len(idxs), CH):
                chunk = idxs[c0 : c0 + CH]
                if len(chunk) == 1:
                    pb, _, target_len, _ = prepared[chunk[0]]
                    words_by_idx[chunk[0]] = searcher.search(pb, target_len)[2]
                    continue
                # pad to the launch size so each geometry compiles once
                padded = chunk + [chunk[-1]] * (CH - len(chunk))
                outs = searcher.search_many(
                    [prepared[i][0] for i in padded],
                    [prepared[i][2] for i in padded],
                )
                for i, out in zip(chunk, outs[: len(chunk)]):
                    words_by_idx[i] = out[2]
    else:
        host_searchers = {}
        for i, (pb, max_frames, target_len, _) in enumerate(prepared):
            # cache per frame bucket so jitted decode steps compile once
            if max_frames not in host_searchers:
                host_searchers[max_frames] = BeamSearcher(
                    model, variables, compiled, lm, cfg.decode, max_frames
                )
            words_by_idx[i] = host_searchers[max_frames].search(pb, target_len)[2]

    # pass 3: score + log in dataset order (reference log format)
    references, predictions = [], []
    for i, (_, _, _, target_text) in enumerate(prepared):
        pred_text = tt.clean_text(" ".join(words_by_idx[i]))
        if len(target_text) != 0:
            references.append(target_text)
            predictions.append(pred_text)
            log.info(
                "Prediction:%s ---> Reference:%s  (WER: %s)",
                pred_text, target_text, wer(target_text, pred_text),
            )
    final = wer(references, predictions)
    log.info("Final WER: %s", final)
    return final


def train(cfg: Config):
    from emg_tpu.data.dataset import EMGDataset
    from emg_tpu.parallel.distributed import initialize_distributed
    from emg_tpu.train.metrics_writer import MetricsWriter, default_log_dir
    from emg_tpu.train.trainer import Trainer

    # multi-host: must run before anything touches the backend
    initialize_distributed(cfg.parallel)
    trainset = EMGDataset(cfg, dev=False, test=False)
    devset = EMGDataset(cfg, dev=True)
    log.info("train / dev split: %d %d", len(trainset), len(devset))
    # the reference writes logs/run/<timestamp> relative to cwd
    # (recognition_model.py:397); anchoring under output_directory keeps
    # runs self-contained
    writer = MetricsWriter(
        default_log_dir(os.path.join(cfg.paths.output_directory, "logs", "run"))
    )
    trainer = Trainer(cfg, trainset, devset, writer)
    state = None
    if cfg.paths.resume and trainer.ckpt.exists("latest"):
        state, extra = trainer.ckpt.restore(trainer.init_state(), "latest")
        log.info("resumed from %s (epoch %s, %d microbatches)",
                 cfg.paths.output_directory, extra.get("epoch"), int(state.microbatches))
    return trainer.train(state)


def _print_help():
    import dataclasses

    print(__doc__)
    print("Flags (bare names accepted when unambiguous, or --section.key):\n")
    cfg = Config()
    for f in dataclasses.fields(cfg):
        section = getattr(cfg, f.name)
        for sf in dataclasses.fields(section):
            print(f"  --{f.name}.{sf.name}  (default: {getattr(section, sf.name)!r})")
    from emg_tpu.train.recipes import RECIPES

    print(f"\n  --recipe {{{','.join(sorted(RECIPES))}}}")


def main(argv=None):
    from emg_tpu.runtime import setup_compilation_cache

    setup_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--help" in argv or "-h" in argv:
        _print_help()
        return
    recipe = None
    if "--recipe" in argv:
        i = argv.index("--recipe")
        recipe = argv[i + 1]
        del argv[i : i + 2]
    cfg = Config.from_args(argv)
    if cfg.paths.debug:
        # reference parity: --debug forces CPU execution
        # (recognition_model.py:25,321,353,396 maps it to device='cpu').
        # The backend is not initialized yet at this point (importing jax
        # does not touch it), so the platform override still takes effect.
        import jax

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    if recipe:
        from emg_tpu.train.recipes import apply_recipe

        apply_recipe(cfg, recipe)
    if cfg.paths.evaluate_saved_beam_search:
        _setup_logging(cfg.paths.output_directory, "log_beam_search.txt")
        evaluate_saved_beam_search(cfg)
    elif cfg.paths.evaluate_saved_greedy_search:
        _setup_logging(cfg.paths.output_directory, "log_greedy_search.txt")
        evaluate_saved_greedy_search(cfg)
    else:
        _setup_logging(cfg.paths.output_directory, "log.txt")
        train(cfg)


if __name__ == "__main__":
    main()

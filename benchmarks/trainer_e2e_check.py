"""End-to-end Trainer throughput on silicon (VERDICT r4 item 2 'done' gate).

bench.py's train_accum_* rows measure the fused accumulation window in
isolation (pre-built batches, no CLI plumbing). This script measures what
``emg_tpu train`` actually delivers: the REAL Trainer — dataset scan, DSP,
DynamicBatchSampler, device-staged prefetch (trainer._prefetch), fused
windows, checkpointing — on a synthetic corpus at flagship model geometry,
reporting steady-state epoch utterances/sec beside the bench's window
number. The 'done' criterion is agreement within ~15% once the bench row
is corrected for the eval/PER work the Trainer also does (disabled here).

Run on a TPU-attached host: python benchmarks/trainer_e2e_check.py
"""

from __future__ import annotations

import json
import logging
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402

from emg_tpu.config import Config  # noqa: E402
from emg_tpu.data.dataset import EMGDataset, make_normalizers  # noqa: E402
from emg_tpu.data.fixtures import make_synthetic_corpus  # noqa: E402
from emg_tpu.train.metrics_writer import MetricsWriter  # noqa: E402
from emg_tpu.train.trainer import Trainer  # noqa: E402

N_SENTENCES = 48
N_EPOCHS = 3  # epoch 1 pays compiles; epochs 2..N are steady state


def main():
    print("devices:", jax.devices())
    root = tempfile.mkdtemp(prefix="trainer_e2e_")
    paths = make_synthetic_corpus(
        os.path.join(root, "corpus"), n_sentences=N_SENTENCES, seed=7
    )

    cfg = Config()  # FLAGSHIP model geometry (reference defaults)
    cfg.data.silent_data_directories = [paths["silent_data_directories"]]
    cfg.data.voiced_data_directories = paths["voiced_data_directories"].split(",")
    cfg.data.testset_file = paths["testset_file"]
    cfg.paths.dict = paths["dict"]
    cfg.paths.phonesSet = paths["phonesSet"]
    cfg.paths.vocabulary = paths["vocabulary"]
    cfg.data.normalizers_file = os.path.join(root, "normalizers.pkl")
    cfg.paths.output_directory = os.path.join(root, "out")
    cfg.train.n_epochs = N_EPOCHS
    # pure-training throughput: no mid-epoch eval or PER decodes (the bench
    # window rows exclude them too)
    cfg.train.report_loss = 10**9
    cfg.train.report_PER = 10**9
    make_normalizers(cfg, cfg.data.normalizers_file)

    trainset = EMGDataset(cfg, dev=False, test=False)
    devset = EMGDataset(cfg, dev=True, test=False)
    n_utts = len(trainset)
    print(f"train utterances: {n_utts}")

    epoch_secs = []
    epoch_re = re.compile(r"finished epoch \d+ .*\((\d+\.\d)s\)")

    class Capture(logging.Handler):
        def emit(self, record):
            m = epoch_re.search(record.getMessage())
            if m:
                epoch_secs.append(float(m.group(1)))

    logging.getLogger("emg_tpu.train.trainer").addHandler(Capture())
    logging.getLogger("emg_tpu.train.trainer").setLevel(logging.INFO)

    writer = MetricsWriter(cfg.paths.output_directory)
    trainer = Trainer(cfg, trainset, devset, writer)
    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    steady = epoch_secs[1:] or epoch_secs
    ups = [n_utts / s for s in steady]
    print(json.dumps({
        "trainer_e2e": {
            "epoch_secs": epoch_secs,
            "steady_utt_per_sec": round(max(ups), 2),
            "total_wall_s": round(wall, 1),
            "device": jax.devices()[0].device_kind,
        }
    }))


if __name__ == "__main__":
    main()

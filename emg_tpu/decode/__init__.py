from emg_tpu.decode.greedy import greedy_decode, run_greedy  # noqa: F401

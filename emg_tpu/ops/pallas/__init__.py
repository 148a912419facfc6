from emg_tpu.ops.pallas.flash_attention import flash_attention_relpos, flash_available  # noqa: F401

from paths_tpu.kernels.flash_attention import masked_flash_attention  # noqa: F401

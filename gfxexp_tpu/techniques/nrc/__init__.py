from gfxexp_tpu.techniques.nrc.network import (  # noqa: F401
    NRCConfig,
    NRCState,
    infer,
    init_nrc,
    train_on_frame,
    train_step,
)

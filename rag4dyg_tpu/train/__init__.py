from rag4dyg_tpu.train.losses import (  # noqa: F401
    cltime_loss,
    info_nce_loss,
    shift_ce_loss,
)

from speechflow_tpu.models.ssl.cpc import (
    CPCModel,
    CPCParams,
    cpc_infonce_loss,
    train_cpc,
)

__all__ = ["CPCModel", "CPCParams", "cpc_infonce_loss", "train_cpc"]

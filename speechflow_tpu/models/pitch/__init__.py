from speechflow_tpu.models.pitch.crepe import (  # noqa: F401
    CrepeF0,
    CrepeParams,
    crepe_f0,
    load_crepe,
    save_crepe,
    train_crepe,
)

__all__ = ["CrepeF0", "CrepeParams", "crepe_f0", "load_crepe", "save_crepe",
           "train_crepe"]

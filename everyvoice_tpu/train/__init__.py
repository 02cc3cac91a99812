from everyvoice_tpu.train.checkpoint import (  # noqa: F401
    inspect_checkpoint,
    load_checkpoint,
    load_checkpoint_header,
    rename_speaker,
    save_checkpoint,
    summarize_statedict,
)
from everyvoice_tpu.train.loop import (  # noqa: F401
    FastSpeech2Trainer,
    HiFiGANTrainer,
)
from everyvoice_tpu.train.optim import build_optimizer, noam_schedule  # noqa: F401

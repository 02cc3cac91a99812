from everyvoice_tpu.preprocessor.helpers import Counters, Scaler  # noqa: F401
from everyvoice_tpu.preprocessor.preprocessor import (  # noqa: F401
    FILENAME_SEP,
    PROCESSING_ORDER,
    Preprocessor,
)

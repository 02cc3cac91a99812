"""Shared enum definitions (parity: everyvoice/config/type_definitions.py)."""

from enum import Enum


class TargetTrainingTextRepresentationLevel(str, Enum):
    """Which text representation a model trains on
    (reference everyvoice/config/type_definitions.py:16-19)."""

    characters = "characters"
    ipa_phones = "phones"
    phonological_features = "phonological_features"


class DatasetTextRepresentation(str, Enum):
    """What representation a dataset's filelist text column holds."""

    characters = "characters"
    ipa_phones = "phones"
    arpabet = "arpabet"  # always converted to IPA during preprocessing

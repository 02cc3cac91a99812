"""Framework-wide exception types (parity: everyvoice/exceptions.py:1-19)."""


class EveryVoiceTPUError(Exception):
    """Base class for all framework errors."""


class InvalidConfiguration(EveryVoiceTPUError):
    """A configuration combination is invalid."""


class ConfigError(EveryVoiceTPUError):
    """A configuration file could not be loaded or validated."""


class OutOfVocabularySymbolError(EveryVoiceTPUError):
    """A token was encountered that is not in the declared symbol set."""


class BadDataError(EveryVoiceTPUError):
    """A data file is malformed or violates preprocessing constraints."""

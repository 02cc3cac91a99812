"""Generic host-side utilities: filelist IO, text cleaners, config helpers
(parity: everyvoice/utils/__init__.py)."""

from __future__ import annotations

import csv
import json
import os
import re
from datetime import datetime
from functools import partial
from itertools import islice
from pathlib import Path
from typing import Any, Iterable
from unicodedata import normalize

# ---------------------------------------------------------------------------
# config file IO


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    TPU compiles of the batched DSP/training programs cost seconds to tens of
    seconds; with the cache, every CLI invocation after the first reuses
    them (preprocess → train → synthesize all hit the same shapes run to
    run). Idempotent and cheap; a user-set JAX_COMPILATION_CACHE_DIR or
    jax_compilation_cache_dir wins. Override the location with
    EVERYVOICE_TPU_CACHE_DIR; set it empty to disable.

    Safe to call before jax is imported (it then only sets the env vars
    jax reads at import time, keeping the CLI's lazy-import discipline).
    """
    import sys

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured the cache
    cache_dir = os.environ.get("EVERYVOICE_TPU_CACHE_DIR")
    if cache_dir == "":
        return
    if cache_dir is None:
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.join(os.path.expanduser("~"), ".cache"),
            "everyvoice_tpu", "xla",
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return
    if "jax" not in sys.modules:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
        return
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return  # already configured by a caller
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # very old jax
        pass


def load_config_file(path: Path | str) -> Any:
    """Load a YAML or JSON config file into plain Python objects."""
    import yaml

    path = Path(path)
    with open(path, encoding="utf8") as f:
        if path.suffix == ".json":
            return json.load(f)
        return yaml.safe_load(f)


def write_config_file(path: Path | str, data: dict) -> None:
    import yaml

    path = Path(path)
    with open(path, "w", encoding="utf8") as f:
        if path.suffix == ".json":
            json.dump(data, f, indent=2, ensure_ascii=False)
        else:
            yaml.safe_dump(data, f, allow_unicode=True, sort_keys=False)


def get_current_time() -> str:
    """Timestamp used for logger sub-directories."""
    return str(int(datetime.now().timestamp()))


# ---------------------------------------------------------------------------
# CLI `-c key.path=value` deep overrides (reference utils/__init__.py:150-175)


def update_config_from_cli_args(args: list[str], config):
    """Apply ``key.path=value`` overrides to a config object in place."""
    if not args:
        return config
    for arg in args:
        if "=" not in arg:
            raise ValueError(
                f"Invalid config override '{arg}'; expected key.path=value"
            )
        key, _, value = arg.partition("=")
        nested: dict = {}
        cursor = nested
        parts = key.split(".")
        for part in parts[:-1]:
            cursor[part] = {}
            cursor = cursor[part]
        cursor[parts[-1]] = _coerce_cli_value(value)
        config.update_config(nested)
    return config


def _coerce_cli_value(value: str):
    lowered = value.strip()
    if lowered.lower() in ("true", "false"):
        return lowered.lower() == "true"
    if lowered.lower() in ("null", "none", ""):
        return None
    try:
        return int(lowered)
    except ValueError:
        pass
    try:
        return float(lowered)
    except ValueError:
        pass
    if lowered.startswith(("[", "{")):
        try:
            return json.loads(lowered)
        except json.JSONDecodeError:
            pass
    return value


# ---------------------------------------------------------------------------
# misc string helpers


def slugify(text: str, repl: str = "-", limit_to_n_characters: int | None = None) -> str:
    """Filesystem-safe version of a string (reference utils/__init__.py:23)."""
    slug = re.sub(r"[\\/:*?\"<>|\s]", repl, text)
    slug = re.sub(re.escape(repl) + r"{2,}", repl, slug)
    if limit_to_n_characters is not None:
        slug = slug[:limit_to_n_characters]
    return slug


def lower(text: str) -> str:
    """
    >>> lower("MiXeD ÇÀSÉ")
    'mixed çàsé'
    """
    return text.lower()


def nfc_normalize(text: str) -> str:
    """
    >>> nfc_normalize("é")
    'é'
    """
    return normalize("NFC", text)


def collapse_whitespace(text: str) -> str:
    """
    >>> collapse_whitespace("  asdf  	   qwer   ")
    ' asdf qwer '
    """
    return re.sub(r"\s+", " ", text)


def strip_text(text: str) -> str:
    """
    >>> strip_text(" asdf ")
    'asdf'
    """
    return text.strip()


def original_hifigan_leaky_relu(x):
    """Leaky ReLU with the HiFi-GAN paper's slope of 0.1, as a jax op
    (reference utils/__init__.py:178-181 wraps torch's)."""
    import jax

    return jax.nn.leaky_relu(x, negative_slope=0.1)


# ---------------------------------------------------------------------------
# filelist IO (psv/csv/festival) — column contract matches the reference


FILELIST_BASE_FIELDS = [
    "basename",
    "language",
    "speaker",
    "characters",
    "character_tokens",
    "phones",
    "phone_tokens",
]


def write_filelist(files: list[dict], path: Path | str) -> None:
    """Write a psv filelist with the canonical column ordering
    (reference utils/__init__.py:197-229)."""
    with open(path, "w", encoding="utf8", newline="") as f:
        if not files:
            print("", file=f)
            return
        # Union over ALL rows (not just the first): multi-dataset corpora
        # can have per-dataset columns (e.g. one source with 'characters',
        # another with 'phones'), and DictWriter raises on unexpected keys.
        found = sorted({key for row in files for key in row})
        fieldnames = [x for x in FILELIST_BASE_FIELDS if x in found] + [
            x for x in found if x not in FILELIST_BASE_FIELDS
        ]
        writer = csv.DictWriter(
            f,
            fieldnames=fieldnames,
            delimiter="|",
            quoting=csv.QUOTE_NONE,
            escapechar="\\",
            lineterminator="\n",
            restval="",
        )
        writer.writeheader()
        for row in files:
            writer.writerow(row)


def generic_xsv_filelist_reader(
    path: Path | str,
    delimiter: str = "|",
    quoting: int = csv.QUOTE_NONE,
    escapechar: str = "\\",
    fieldnames: list[str] | None = None,
    file_has_header_line: bool = True,
    record_limit: int = 0,
) -> list[dict]:
    """Parse an *sv filelist to a list of row dicts
    (reference utils/__init__.py:303-356)."""
    assert fieldnames is not None or file_has_header_line
    with open(path, "r", newline="", encoding="utf8") as f:
        lines: Iterable[str] = islice(f, record_limit) if record_limit else f
        reader = csv.DictReader(
            lines,
            fieldnames=fieldnames,
            delimiter=delimiter,
            quoting=quoting,
            escapechar=escapechar,
        )
        if fieldnames and file_has_header_line:
            next(reader, None)
        rows = []
        for row in reader:
            if "basename" in row and row["basename"] is not None:
                row["basename"] = os.path.splitext(row["basename"])[0]
            rows.append(row)
    return rows


generic_dict_loader = generic_xsv_filelist_reader


def generic_psv_filelist_reader(path, **kwargs) -> list:
    """Pipe-separated filelist reader (the default loader name that appears in
    configs and checkpoints, so it must stay a named function)."""
    return generic_xsv_filelist_reader(path, delimiter="|", **kwargs)


def generic_csv_filelist_reader(path, **kwargs) -> list:
    return generic_xsv_filelist_reader(path, delimiter=",", **kwargs)


def read_festival(
    path: Path | str, record_limit: int = 0, text_field_name: str = "text"
) -> list[dict]:
    """Read a festival-format filelist: ``( basename "text" )`` per line
    (reference utils/__init__.py:249-283)."""
    pattern = re.compile(r"\(\s*(?P<basename>[\w\d\-_.]*)\s*\"(?P<text>[^\"]*)\"\s*\)")
    rows = []
    with open(path, encoding="utf-8") as f:
        lines: Iterable[str] = islice(f, record_limit) if record_limit else f
        for line in lines:
            m = pattern.search(line.strip())
            if m is None:
                raise ValueError(f'File {path} is not in the "festival" format.')
            rows.append(
                {"basename": m["basename"].strip(), text_field_name: m["text"].strip()}
            )
    return rows


def sniff_and_return_filelist_data(path: Path | str):
    """Detect festival vs delimited format and parse accordingly
    (reference utils/__init__.py:286-301)."""
    festival_pattern = re.compile(r'\( [\w\d_]* "[^"]*" \)')
    with open(path, newline="", encoding="utf8") as f:
        head = f.read(1024)
        f.seek(0)
        if festival_pattern.search(head):
            return read_festival(path)
        try:
            dialect = csv.Sniffer().sniff(head, delimiters="|,\t;")
            return list(csv.DictReader(f, dialect=dialect))
        except csv.Error:
            # Sniffer gives up on some perfectly regular files; fall back to
            # the most common delimiter present in the header line.
            first_line = head.splitlines()[0] if head else ""
            for delim in ("|", "\t", ",", ";"):
                if delim in first_line:
                    return list(csv.DictReader(f, delimiter=delim))
            raise


# ---------------------------------------------------------------------------
# nested-dict flattening for batch dicts (reference utils/__init__.py:121)


def flatten(nested: dict, prefix: str = "") -> dict:
    """Flatten nested dicts joining keys with ``_``: ``{"a": {"b": 1}} -> {"a_b": 1}``.

    >>> flatten({"a": {"b": 1}, "c": 2})
    {'a_b': 1, 'c': 2}
    """
    out: dict = {}
    for key, value in nested.items():
        full = f"{prefix}_{key}" if prefix else key
        if isinstance(value, dict):
            out.update(flatten(value, full))
        else:
            out[full] = value
    return out


def truncate_basename(basename: str, limit: int = 30) -> str:
    """Shorten long basenames for output filenames, keeping them unique via a
    short hash suffix."""
    if len(basename) <= limit:
        return basename
    import hashlib

    digest = hashlib.md5(basename.encode("utf8")).hexdigest()[:8]
    return f"{basename[: limit - 9]}-{digest}"


def n_times(n: int) -> str:
    """
    >>> n_times(1)
    'once'
    >>> n_times(2)
    'twice'
    >>> n_times(3)
    '3 times'
    """
    if n == 1:
        return "once"
    if n == 2:
        return "twice"
    return f"{n} times"

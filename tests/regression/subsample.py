"""Corpus subsampler: emit just enough filelist records to cover a duration.

Standalone helper used to build small regression corpora from full datasets
(reference everyvoice/tests/regression/subsample.py — same CLI contract:
metadata + wavs dir + requested seconds, psv/tsv/csv/festival formats,
optional header, basename/speaker column indices, per-speaker filtering).

Durations are read from the WAV headers only (no sample decoding), so
subsampling a large corpus is IO-light.
"""

from __future__ import annotations

import sys
import wave
from pathlib import Path

import click

SEPARATORS = {"psv": "|", "tsv": "\t", "csv": ","}


def wav_duration_seconds(path: Path | str) -> float:
    """Duration of a wav from its header alone."""
    with wave.open(str(path), "rb") as f:
        rate = f.getframerate()
        return f.getnframes() / rate if rate else 0.0


def iter_records(lines, fmt, basename_col, speaker_col, has_header):
    """Yield (raw_line, basename, speaker) per data record."""
    if fmt == "festival":
        for line in lines:
            base = read_festival_line(line)
            if base is None:
                continue
            yield line, base, None
        return
    delimiter = SEPARATORS[fmt]
    start = 1 if has_header else 0
    for line in lines[start:]:
        if not line.strip():
            continue
        fields = line.rstrip("\r\n").split(delimiter)
        base = fields[basename_col] if basename_col < len(fields) else ""
        speaker = (
            fields[speaker_col]
            if 0 <= speaker_col < len(fields)
            else None
        )
        yield line, base, speaker


def read_festival_line(line):
    import re

    m = re.search(r"\(\s*([\w\d\-_.]*)\s*\"[^\"]*\"\s*\)", line.strip())
    return m.group(1) if m else None


@click.command(help="Subsample a corpus filelist to a minimum total duration.")
@click.argument("metadata_path", type=click.Path(exists=True, dir_okay=False))
@click.argument("wavs_path", type=click.Path(exists=True, file_okay=False))
@click.option("-d", "--duration", type=int, required=True,
              help="Minimum total duration of the subsample, in seconds.")
@click.option("-f", "--format", "fmt", required=True,
              type=click.Choice(["psv", "tsv", "csv", "festival"]),
              help="Metadata file format.")
@click.option("-b", "--basename", "basename_col", type=int, default=0,
              help="Zero-indexed column of the .wav basename.")
@click.option("--header/--no-header", "has_header", default=False,
              help="Whether the first line is a header row.")
@click.option("-s", "--speaker", "speaker_col", type=int, default=-1,
              help="Zero-indexed column of the speaker id.")
@click.option("-i", "--speakerid", default=None,
              help="Keep only records for this speaker.")
def subsample(metadata_path, wavs_path, duration, fmt, basename_col,
              has_header, speaker_col, speakerid):
    if fmt == "festival" and speakerid:
        raise click.BadParameter(
            "Festival formatted files cannot have a speaker id."
        )
    lines = Path(metadata_path).read_text(encoding="utf8").splitlines(
        keepends=True
    )
    out = sys.stdout
    if has_header and fmt != "festival" and lines:
        out.write(lines[0])
    total = 0.0
    for line, base, speaker in iter_records(
        lines, fmt, basename_col, speaker_col, has_header
    ):
        if speakerid is not None and speaker != speakerid:
            continue
        wav_name = base if str(base).endswith(".wav") else f"{base}.wav"
        wav_file = Path(wavs_path) / wav_name
        if not wav_file.exists():
            raise click.BadParameter(
                f"'{wav_file}' was not found. Check whether you need "
                "--header and that --basename is the correct column index."
            )
        total += wav_duration_seconds(wav_file)
        out.write(line)
        if total >= duration:
            break


if __name__ == "__main__":
    subsample()

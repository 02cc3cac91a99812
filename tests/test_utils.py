"""Generic-utils tests (model: reference everyvoice/tests/test_utils.py)."""

import re
from pathlib import Path

import pytest

from everyvoice_tpu.utils import (
    generic_psv_filelist_reader,
    read_festival,
    slugify,
    sniff_and_return_filelist_data,
    write_filelist,
)


class TestVersion:
    def test_version_is_pep440_compliant(self):
        from everyvoice_tpu import __version__

        # PEP 440 core grammar (reference test_utils.py:30).
        assert re.fullmatch(
            r"\d+(\.\d+)*((a|b|rc)\d+)?(\.post\d+)?(\.dev\d+)?", __version__
        )


class TestWriteFilelist:
    def test_canonical_column_order(self, tmp_path):
        rows = [
            {"characters": "hello", "basename": "f1", "language": "und",
             "speaker": "default", "custom_col": "x"},
        ]
        out = tmp_path / "out.psv"
        write_filelist(rows, out)
        header = out.read_text().splitlines()[0].split("|")
        # Standard columns first, in the canonical order; extras trail.
        assert header.index("basename") < header.index("characters")
        assert header[-1] == "custom_col"

    def test_union_of_columns_across_rows(self, tmp_path):
        rows = [
            {"basename": "a", "characters": "one"},
            {"basename": "b", "phones": "wʌn"},
        ]
        out = tmp_path / "union.psv"
        write_filelist(rows, out)
        back = generic_psv_filelist_reader(out)
        assert back[0]["characters"] == "one" and back[0]["phones"] == ""
        assert back[1]["phones"] == "wʌn" and back[1]["characters"] == ""

    def test_round_trip_with_escaped_delimiter(self, tmp_path):
        rows = [{"basename": "a", "characters": "one | two"}]
        out = tmp_path / "esc.psv"
        write_filelist(rows, out)
        back = generic_psv_filelist_reader(out)
        assert back[0]["characters"] == "one | two"

    def test_empty_filelist_writes_empty_file(self, tmp_path):
        out = tmp_path / "empty.psv"
        write_filelist([], out)
        assert out.read_text().strip() == ""


class TestFilelistSniffing:
    def test_sniffs_festival(self, tmp_path):
        f = tmp_path / "data.festival"
        f.write_text('( item1 "some text" )\n( item2 "more text" )\n')
        rows = sniff_and_return_filelist_data(f)
        assert rows[0]["basename"] == "item1"
        assert rows[0]["text"] == "some text"

    def test_sniffs_psv(self, tmp_path):
        f = tmp_path / "data.psv"
        f.write_text("basename|characters\nitem1|some text\n")
        rows = sniff_and_return_filelist_data(f)
        assert rows[0]["characters"] == "some text"

    def test_festival_rejects_malformed_line(self, tmp_path):
        f = tmp_path / "bad.festival"
        f.write_text('( item1 "ok" )\nnot festival at all\n')
        with pytest.raises(ValueError, match="festival"):
            read_festival(f)

    def test_basename_extension_stripped(self, tmp_path):
        f = tmp_path / "data.psv"
        f.write_text("basename|characters\nitem1.wav|some text\n")
        rows = generic_psv_filelist_reader(f)
        assert rows[0]["basename"] == "item1"


class TestSlugify:
    def test_filesystem_unsafe_characters_replaced(self):
        assert "/" not in slugify("a/b\\c:d")
        assert slugify("hello world") == "hello-world"
        assert slugify("a  b") == "a-b"  # runs collapse

    def test_character_limit(self):
        assert slugify("abcdefghij", limit_to_n_characters=4) == "abcd"

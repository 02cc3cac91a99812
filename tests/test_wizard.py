"""Wizard tests with scripted (non-interactive) answers
(model: reference everyvoice/tests/test_wizard.py + stubs.py)."""

from pathlib import Path

import pytest
import yaml

from everyvoice_tpu.wizard.main_tour import get_main_wizard_tour
from everyvoice_tpu.wizard.steps import NameStep, write_config_package
from everyvoice_tpu.wizard.tour import Step, StepError, Tour

LJ_DATA = Path("/root/reference/everyvoice/tests/data")


def scripted_ask(answers):
    """Returns an ask() that pops scripted answers in order."""
    queue = list(answers)

    def ask(prompt_text, default=None, step=None):
        if not queue:
            raise AssertionError(f"Wizard asked an unscripted question: {prompt_text}")
        return queue.pop(0)

    return ask


def dataset_answers(filelist, wavs_dir, name="lj", language=None):
    """Answers for one dataset subtour over a psv filelist that already has
    speaker and language columns (like metadata.psv)."""
    answers = [
        str(filelist),    # filelist
        "yes",            # permissions
        "psv",            # format
        "characters",     # representation
        "none",           # text processing
        "yes",            # has speaker column (auto-picks 'speaker')
        "yes" if language is None else "no",  # has language column
    ]
    if language is not None:
        answers.append(language)  # SelectLanguageStep
    answers += [
        "keep",           # custom g2p
        str(wavs_dir),    # wav dir (ValidateWavs passes silently)
        "22050",          # sample rate (symbols discovered automatically)
        "none",           # sox effects
        name,             # dataset name
    ]
    return answers


def closing_answers(n_languages=1):
    return ["validation"] * n_languages + ["yaml"]


def lj_answers(tmp_path, more="no"):
    return (
        [
            "Test Project",                 # name
            "Test Runner",                  # contact name
            "info@everyvoice.ca",           # contact email
            str(tmp_path),                  # output path
        ]
        + dataset_answers(LJ_DATA / "metadata.psv", LJ_DATA / "lj" / "wavs")
        + [more]                            # more datasets?
    )


class TestMainTour:
    def test_full_tour_writes_project(self, tmp_path):
        tour = get_main_wizard_tour(
            ask=scripted_ask(lj_answers(tmp_path) + closing_answers())
        )
        state = tour.run()
        project = state["project_dir"]
        config_dir = project / "config"
        for fn in (
            "everyvoice-shared-text.yaml", "everyvoice-shared-data.yaml",
            "everyvoice-text-to-spec.yaml", "everyvoice-spec-to-wav.yaml",
            "everyvoice-text-to-wav.yaml",
        ):
            assert (config_dir / fn).exists(), fn
        assert (project / "preprocessed").is_dir()
        assert (project / "logs_and_checkpoints").is_dir()
        assert (project / "lj-filelist.psv").exists()

    def test_written_configs_load(self, tmp_path):
        tour = get_main_wizard_tour(
            ask=scripted_ask(lj_answers(tmp_path) + closing_answers())
        )
        state = tour.run()
        config_dir = state["project_dir"] / "config"
        from everyvoice_tpu.models.fs2.config import FastSpeech2Config
        from everyvoice_tpu.models.hifigan.config import HiFiGANConfig
        from everyvoice_tpu.models.styletts2.config import StyleTTS2Config

        fs2 = FastSpeech2Config.load_config_from_path(
            config_dir / "everyvoice-text-to-spec.yaml"
        )
        assert fs2.contact.contact_email == "info@everyvoice.ca"
        assert "lj_characters" in fs2.text.symbols.model_dump()
        HiFiGANConfig.load_config_from_path(
            config_dir / "everyvoice-spec-to-wav.yaml"
        )
        StyleTTS2Config.load_config_from_path(
            config_dir / "everyvoice-text-to-wav.yaml"
        )

    def test_symbol_discovery(self, tmp_path):
        tour = get_main_wizard_tour(
            ask=scripted_ask(lj_answers(tmp_path) + closing_answers())
        )
        state = tour.run()
        symbols = state["datasets"][0]["symbols"]
        assert "a" in symbols["characters"] or "e" in symbols["characters"]
        assert "." not in symbols["characters"]  # punctuation excluded
        # metadata.psv also carries a phones column; both kinds discovered
        assert symbols["phones"]

    def test_permission_denied_exits(self, tmp_path):
        answers = lj_answers(tmp_path)
        answers[5] = "no"
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        with pytest.raises(SystemExit):
            tour.run()

    def test_more_datasets_loops(self, tmp_path):
        answers = lj_answers(tmp_path, more="yes")
        answers += dataset_answers(
            LJ_DATA / "metadata.psv", LJ_DATA / "lj" / "wavs",
            name="second", language="fra",
        )
        answers += ["no"] + closing_answers(n_languages=2)
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        assert len(state["datasets"]) == 2
        assert state["datasets"][1]["language"] == "fra"
        # Two languages → multilingual flag set in the written model config
        fs2 = yaml.safe_load(
            (state["project_dir"] / "config" / "everyvoice-text-to-spec.yaml")
            .read_text()
        )
        assert fs2["model"]["multilingual"] is True


class TestTourMechanics:
    def test_validation_retry_then_fail(self):
        bad = ["bad email"] * 25

        class EmailStep(Step):
            def validate(self, response):
                return "@" in str(response)

        tour = Tour("t", [EmailStep(name="email")], ask=scripted_ask(bad))
        with pytest.raises(StepError, match="20 times"):
            tour.run()

    def test_trace_and_debug_state_modes(self, capsys):
        """Hidden --trace/--debug-state CLI flags (reference
        wizard/tour.py:205-213,430-432) print each step and the state."""
        tour = Tour(
            "t", [RecordingStep("first"), RecordingStep("second")],
            ask=scripted_ask(["A", "B"]), trace=True, debug_state=True,
        )
        tour.run()
        out = capsys.readouterr().out
        assert "first: 'A'" in out
        assert "second: 'B'" in out
        assert "[wizard state before second]" in out
        assert "'first': 'A'" in out  # state snapshot is printed

    def test_save_and_resume(self, tmp_path):
        tour = Tour("t", [NameStep()], ask=scripted_ask(["My Project"]))
        tour.run()
        progress = tmp_path / "progress.yaml"
        tour.save_progress(progress)
        # Resume replays recorded answers without asking again.
        tour2 = Tour("t", [NameStep()], ask=scripted_ask([]))
        state = tour2.run(resume_from=progress)
        assert state["name"] == "My Project"


class TestConfigPackage:
    def test_write_config_package_minimal(self, tmp_path):
        state = {
            "name": "mini",
            "output_path": tmp_path,
            "contact_name": "X",
            "contact_email": "x@y.org",
            "datasets": [
                {
                    "label": "d0",
                    "language": "und",
                    "data_dir": tmp_path,
                    "filelist": tmp_path / "none.psv",
                    "rows": [{"basename": "a", "characters": "hi"}],
                    "symbols": ["h", "i"],
                    "text_representation": "characters",
                }
            ],
        }
        out = write_config_package(state)
        assert (out / "config" / "everyvoice-shared-data.yaml").exists()
        data = yaml.safe_load(
            (out / "config" / "everyvoice-shared-data.yaml").read_text()
        )
        assert data["source_data"][0]["label"] == "d0"


class TestColumnMapping:
    def test_nonstandard_column_mapped(self, tmp_path):
        # A filelist with a 'text' column instead of 'characters'.
        filelist = tmp_path / "f.psv"
        filelist.write_text("basename|text\nitem1|hello there\n")
        answers = [
            "Col Project", "Test Runner", "info@everyvoice.ca", str(tmp_path),
            str(filelist), "yes", "psv", "characters", "none",
            "no",                # know-speaker (has-speaker auto-answers no)
            "eng",               # select language (no language column)
            "keep", str(tmp_path),
            "no",                # validate wavs: continue despite missing
            "22050", "none", "cols",
            "no",                # more datasets?
            "skip", "yaml",      # OOD + config format
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert rows[0]["characters"] == "hello there"
        assert rows[0]["language"] == "eng"
        assert rows[0]["speaker"] == "speaker_0"

    def test_standard_columns_skip_mapping(self, tmp_path):
        # lj_answers contains no column-mapping answer; the step must
        # auto-skip because metadata.psv already has 'characters'.
        tour = get_main_wizard_tour(
            ask=scripted_ask(lj_answers(tmp_path) + closing_answers())
        )
        state = tour.run()
        assert state["datasets"][0]["rows"][0]["characters"]


INTERRUPT = object()  # sentinel: scripted Ctrl-C during a prompt


def interruptable_ask(answers):
    queue = list(answers)

    def ask(prompt_text, default=None, step=None):
        if not queue:
            raise AssertionError(f"Unscripted question: {prompt_text}")
        answer = queue.pop(0)
        if answer is INTERRUPT:
            raise KeyboardInterrupt
        return answer

    return ask


class RecordingStep(Step):
    """Step that writes its answer into shared state (undo must revert)."""

    def __init__(self, key, **kwargs):
        super().__init__(name=key, prompt_text=f"{key}?", **kwargs)
        self.key = key

    def effect(self):
        self.state[self.key] = self.response


class InsertingStep(RecordingStep):
    """Step whose effect inserts a follow-up step (like MoreDatasets)."""

    def effect(self):
        super().effect()
        if self.response == "yes":
            assert self.tour is not None
            self.tour.add_steps_right_after([RecordingStep("extra")], self)


class TestInterruptMenu:
    """The reference's Ctrl-C action menu (tour.py:260): back / continue /
    view / save-and-exit / exit."""

    def _tour(self, answers):
        return Tour(
            "t", [RecordingStep("first"), RecordingStep("second")],
            ask=interruptable_ask(answers),
        )

    def test_go_back_re_prompts_previous_step(self):
        tour = self._tour(["A", INTERRUPT, "go back a step", "B", "C"])
        state = tour.run()
        assert state["first"] == "B"
        assert state["second"] == "C"
        assert [name for name, _ in tour.trace] == ["first", "second"]

    def test_continue_resumes_current_step(self):
        tour = self._tour(["A", INTERRUPT, "continue", "C"])
        state = tour.run()
        assert state["first"] == "A"
        assert state["second"] == "C"

    def test_save_and_exit_then_resume(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        tour = self._tour(["A", INTERRUPT, "save and exit"])
        with pytest.raises(SystemExit):
            tour.run()
        saved = tmp_path / "t-progress.yaml"
        assert saved.exists()

        fresh = self._tour(["C2"])  # only the unanswered question remains
        state = fresh.run(resume_from=saved)
        assert state["first"] == "A"
        assert state["second"] == "C2"

    def test_exit_without_saving(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        tour = self._tour(["A", INTERRUPT, "exit"])
        with pytest.raises(SystemExit):
            tour.run()
        assert not (tmp_path / "t-progress.yaml").exists()

    def test_view_progress_then_continue(self):
        tour = self._tour(["A", INTERRUPT, "view progress", "continue", "C"])
        state = tour.run()
        assert state == {"first": "A", "second": "C"}


class TestUndoSemantics:
    def test_undo_reverts_state_and_inserted_steps(self):
        """Going back over a step that inserted a subtour removes the
        inserted steps and the state it wrote."""
        answers = [
            "yes",            # inserting step -> adds "extra"
            INTERRUPT,        # during "extra" prompt
            "go back a step",  # undo the inserting step
            "no",             # re-answer: no extra step this time
            "B",              # second
        ]
        tour = Tour(
            "t", [InsertingStep("insert"), RecordingStep("second")],
            ask=interruptable_ask(answers),
        )
        state = tour.run()
        assert state["insert"] == "no"
        assert "extra" not in state
        assert state["second"] == "B"

    def test_irreversible_step_blocks_back(self):
        class Fixed(RecordingStep):
            reversible = False

        answers = ["A", INTERRUPT, "go back a step", "C"]
        tour = Tour(
            "t", [Fixed("first"), RecordingStep("second")],
            ask=interruptable_ask(answers),
        )
        state = tour.run()
        # back was refused, so "first" keeps its original answer
        assert state["first"] == "A"
        assert state["second"] == "C"


class TestResumeVersioning:
    def test_incompatible_version_rejected(self, tmp_path):
        bad = tmp_path / "progress.yaml"
        bad.write_text(
            "tour: t\nversion: '2.0'\nresponses:\n- [first, A]\n",
            encoding="utf8",
        )
        with pytest.raises(StepError):
            Tour.load_progress(bad)

    def test_not_a_session_file_rejected(self, tmp_path):
        bad = tmp_path / "junk.yaml"
        bad.write_text("just: stuff\n", encoding="utf8")
        with pytest.raises(StepError):
            Tour.load_progress(bad)


class TestFilelistFormats:
    """Format sniffing + header mapping parity
    (reference wizard/dataset.py:189-538)."""

    def _base(self, tmp_path):
        return ["P", "Test Runner", "info@everyvoice.ca", str(tmp_path)]

    def test_festival_format(self, tmp_path):
        answers = self._base(tmp_path) + [
            str(LJ_DATA / "metadata.festival"), "yes", "festival",
            "characters", "none",
            "no",   # know speaker (has-speaker auto-no: festival has no columns)
            "eng",  # select language
            "keep", str(LJ_DATA / "lj" / "wavs"), "22050", "none", "fest",
            "no", "validation", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert rows[0]["basename"].startswith("LJ")
        assert rows[0]["language"] == "eng"
        assert rows[0]["speaker"] == "speaker_0"
        # festival's text column became the chosen representation
        assert "essential" in rows[0]["characters"]

    def test_tsv_with_language_column(self, tmp_path):
        answers = self._base(tmp_path) + [
            str(LJ_DATA / "language-col.tsv"), "yes", "tsv",
            "characters", "none",
            "yes",  # has speaker column (auto-picks 'speaker')
            "yes",  # has language column (auto-picks 'language')
            "keep", str(tmp_path),
            "no",   # validate wavs: continue despite missing
            "22050", "none", "langcol",
            "no", "validation", "validation", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        langs = sorted({r["language"] for r in rows})
        speakers = sorted({r["speaker"] for r in rows})
        assert langs == ["en", "es"]
        assert speakers == ["speaker-en", "speaker-es"]
        # the written project reflects both languages -> multilingual
        fs2 = yaml.safe_load(
            (state["project_dir"] / "config" / "everyvoice-text-to-spec.yaml")
            .read_text()
        )
        assert fs2["model"]["multilingual"] is True
        assert fs2["model"]["multispeaker"] is True

    def test_headerless_filelist_mapping(self, tmp_path):
        filelist = tmp_path / "noheader.psv"
        filelist.write_text("item1|hello world\nitem2|more text\n")
        answers = self._base(tmp_path) + [
            str(filelist), "yes", "psv",
            "no",   # is the first row a header? no -> first row is kept as a record
            "1",    # which column is the text?
            "0",    # which column is the basename?
            "characters", "none",
            "no", "eng", "keep", str(tmp_path), "no",
            "22050", "none", "nh",
            "no", "skip", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert len(rows) == 2  # first row kept as a record
        assert rows[0]["basename"] == "item1"
        assert rows[0]["characters"] == "hello world"

    def test_escaped_delimiter_round_trip(self, tmp_path):
        """A psv filelist written by this framework's own write_filelist —
        including a backslash-escaped pipe inside the text — must parse
        back through the wizard with the same dialect (no quoting,
        backslash escapes)."""
        from everyvoice_tpu.utils import write_filelist

        filelist = tmp_path / "escaped.psv"
        write_filelist(
            [
                {"basename": "item1", "characters": "hello | world"},
                {"basename": "item2", "characters": "plain text"},
            ],
            filelist,
        )
        assert "\\|" in filelist.read_text()
        answers = self._base(tmp_path) + [
            str(filelist), "yes", "psv",
            "characters", "none",
            "no", "eng", "keep", str(tmp_path), "no",
            "22050", "none", "esc",
            "no", "skip", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert len(rows) == 2
        assert rows[0]["characters"] == "hello | world"

    def test_validate_wavs_retry_path(self, tmp_path):
        good_wavs = LJ_DATA / "lj" / "wavs"
        answers = self._base(tmp_path) + [
            str(LJ_DATA / "metadata.psv"), "yes", "psv", "characters", "none",
            "yes", "yes", "keep",
            str(tmp_path),   # wrong wav dir -> validation finds missing files
            "yes",           # yes, pick a different directory
            str(good_wavs),  # retry wav dir; retry validation passes silently
            "22050", "none", "lj",
            "no", "validation", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        assert state["datasets"][0]["data_dir"] == good_wavs


class TestOODAndFormat:
    def test_ood_local_path_and_json_format(self, tmp_path):
        ood = tmp_path / "ood.txt"
        ood.write_text("A sentence.\nAnother sentence.\n")
        answers = [
            "P", "Test Runner", "info@everyvoice.ca", str(tmp_path),
        ] + dataset_answers(
            LJ_DATA / "metadata.psv", LJ_DATA / "lj" / "wavs"
        ) + [
            "no",          # more datasets
            "local", str(ood),  # OOD source for the one language
            "json",        # config format
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        config_dir = state["project_dir"] / "config"
        assert (config_dir / "everyvoice-text-to-wav.json").exists()
        assert not (config_dir / "everyvoice-text-to-wav.yaml").exists()
        import json as json_mod

        e2e = json_mod.loads(
            (config_dir / "everyvoice-text-to-wav.json").read_text()
        )
        ood_config = e2e["training"]["ood_raw_data"]
        (lang, spec), = ood_config.items()
        assert spec["local_path"] == str(ood)
        # The written config must load back through the pydantic schema
        # (OODDataSource forbids extra fields).
        from everyvoice_tpu.models.styletts2.config import StyleTTS2Config

        loaded = StyleTTS2Config.load_config_from_path(
            config_dir / "everyvoice-text-to-wav.json"
        )
        assert str(loaded.training.ood_raw_data[lang].local_path) == str(ood)

    def test_sample_rate_recorded(self, tmp_path):
        answers = [
            "P", "Test Runner", "info@everyvoice.ca", str(tmp_path),
            str(LJ_DATA / "metadata.psv"), "yes", "psv", "characters", "none",
            "yes", "yes", "keep", str(LJ_DATA / "lj" / "wavs"),
            "16000",       # non-default sample rate
            "none", "lj", "no", "validation", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        assert state["datasets"][0]["sample_rate"] == 16000
        data = yaml.safe_load(
            (state["project_dir"] / "config" / "everyvoice-shared-data.yaml")
            .read_text()
        )
        assert data["audio"]["input_sampling_rate"] == 16000


class TestWizardEdgeCases:
    def test_duplicate_dataset_name_rejected(self, tmp_path):
        answers = lj_answers(tmp_path, more="yes")
        answers += dataset_answers(
            LJ_DATA / "metadata.psv", LJ_DATA / "lj" / "wavs",
            name="lj",  # duplicate of the first dataset's name
        )
        # after rejection, a unique name lets the tour proceed
        answers.insert(len(answers), "lj2")
        answers += ["no"] + closing_answers(n_languages=1)
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        labels = [d["label"] for d in state["datasets"]]
        assert labels == ["lj", "lj2"]

    def test_path_answers_tolerate_whitespace(self, tmp_path):
        answers = [
            "P", "Test Runner", "info@everyvoice.ca", f"  {tmp_path}  ",
            f"  {LJ_DATA / 'metadata.psv'} ",
            "yes", "psv", "characters", "none", "yes", "yes", "keep",
            f" {LJ_DATA / 'lj' / 'wavs'}",
            "22050", "none", "lj", "no", "validation", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        assert state["project_dir"].exists()

    def test_no_datasets_writes_nothing(self, tmp_path):
        from everyvoice_tpu.wizard.steps import MoreDatasetsStep
        from everyvoice_tpu.wizard.tour import Tour

        tour = Tour(
            "t", [MoreDatasetsStep()], ask=scripted_ask(["no"]),
            state={"name": "empty", "output_path": tmp_path},
        )
        tour.run()
        assert not (tmp_path / "empty").exists()


# ---------------------------------------------------------------------------
# Per-step validation parity (reference test_wizard.py: test_bad_name_step,
# test_bad_contact_name_step, test_bad_contact_email_step,
# test_output_path_step, test_sample_rate_config, test_dataset_name, ...)


class TestStepValidation:
    def test_name_step(self):
        step = NameStep()
        assert step.validate("My Project-1")
        assert not step.validate("")
        assert not step.validate("foo/bar")
        assert not step.validate("a:b")

    def test_contact_name_step(self):
        from everyvoice_tpu.wizard.steps import ContactNameStep

        step = ContactNameStep()
        assert step.validate("Test Runner")
        assert not step.validate("ab")
        assert not step.validate("   ")

    def test_contact_email_step(self):
        from everyvoice_tpu.wizard.steps import ContactEmailStep

        step = ContactEmailStep()
        assert step.validate("info@everyvoice.ca")
        assert not step.validate("not-an-email")
        assert not step.validate("a@b")
        assert not step.validate("@b.com")
        assert not step.validate("a b@c.org")

    def test_output_path_step_rejects_file(self, tmp_path):
        from everyvoice_tpu.wizard.steps import OutputPathStep

        blocker = tmp_path / "occupied"
        blocker.write_text("not a directory")
        step = OutputPathStep()
        assert not step.validate(str(blocker))
        assert step.validate(str(tmp_path))
        assert step.validate(str(tmp_path / "new-subdir"))

    def test_filelist_step_rejects_missing(self, tmp_path):
        from everyvoice_tpu.wizard.steps import FilelistStep

        step = FilelistStep(0)
        assert not step.validate(str(tmp_path / "nope.psv"))
        real = tmp_path / "real.psv"
        real.write_text("basename|characters\n")
        assert step.validate(str(real))

    def test_sample_rate_step(self):
        from everyvoice_tpu.wizard.steps import SampleRateConfigStep

        step = SampleRateConfigStep(0)
        assert step.validate("44100")
        assert step.validate(22050)
        assert not step.validate("abc")
        assert not step.validate("50")

    def test_dataset_name_step(self):
        from everyvoice_tpu.wizard.steps import DatasetNameStep

        step = DatasetNameStep(0)
        assert step.validate("lj-corpus")
        assert not step.validate("my dataset")
        assert not step.validate("")

    def test_add_speaker_step(self):
        from everyvoice_tpu.wizard.steps import AddSpeakerStep

        step = AddSpeakerStep(0)
        assert step.validate("speaker-2")
        assert not step.validate("Bad Speaker")
        assert not step.validate("")

    def test_sox_effects_parsing(self):
        from everyvoice_tpu.wizard.steps import SoxEffectsStep

        step = SoxEffectsStep(0)
        assert step.validate("none")
        assert step.validate(
            "normalization (-3.0dB), remove silence at start and end"
        )
        assert not step.validate("reverb please")
        step.response = "normalization (-3.0dB)"
        step.effect()
        effects = step.dataset["sox_effects"]
        assert effects[0] == ["channels", "1"]  # mono mixdown always first
        assert ["norm", "-3.0"] in effects

    def test_ood_hf_repo_step(self):
        from everyvoice_tpu.wizard.steps import OODHFRepoStep

        step = OODHFRepoStep("eng")
        assert not step.validate("")
        assert not step.validate("norepo")
        assert step.validate("owner/repo:OOD.txt")
        step.response = "owner/repo:OOD.txt"
        step.effect()
        spec = step.state["ood_raw_data"]["eng"]
        assert spec == {
            "source_type": "hf", "repo_id": "owner/repo",
            "filename": "OOD.txt", "text_representation": "characters",
        }

    def test_ood_hf_repo_default_filename(self):
        from everyvoice_tpu.wizard.steps import OODHFRepoStep

        step = OODHFRepoStep("fra")
        step.response = "owner/repo"
        step.effect()
        assert step.state["ood_raw_data"]["fra"]["filename"] == "ood.txt"


class TestLanguagePicker:
    def test_choices_list_registered_languages(self):
        from everyvoice_tpu.wizard.steps import SelectLanguageStep

        step = SelectLanguageStep(0)
        choices = step.looks_like_choice()
        assert any(c.startswith("[eng]: English") for c in choices)
        assert choices[0].startswith("[und]")
        assert choices[1].startswith("[custom]")

    def test_menu_answer_sanitized_to_code(self):
        from everyvoice_tpu.wizard.steps import SelectLanguageStep

        step = SelectLanguageStep(0)
        assert step.sanitize_input("[eng]: English") == "eng"
        assert step.sanitize_input("fra") == "fra"
        assert not step.validate(step.sanitize_input("not a code!"))

    def test_custom_language_code_flow(self):
        from everyvoice_tpu.wizard.steps import SelectLanguageStep

        tour = Tour(
            "t", [SelectLanguageStep(0)],
            ask=scripted_ask(["custom", "gitx-dialect"]),
        )
        state = tour.run()
        assert state["datasets"][0]["language"] == "gitx-dialect"


class TestValidationBailout:
    def test_twenty_failures_abort(self):
        # Reference: tour.py gives up after 20 validation failures.
        class AlwaysBad(Step):
            def validate(self, response):
                return False

        tour = Tour(
            "t", [AlwaysBad(name="bad", prompt_text="?")],
            ask=lambda prompt_text, default=None, step=None: "x",
        )
        with pytest.raises(StepError, match="20 times"):
            tour.run()


class TestFormatSniffRecovery:
    """Reference: test_wrong_fileformat_psv / _festival / test_empty_filelist."""

    def _format_tour(self, filelist, answers):
        from everyvoice_tpu.wizard.steps import FilelistFormatStep, FilelistStep

        return Tour(
            "t",
            [FilelistStep(0), FilelistFormatStep(0)],
            ask=scripted_ask([str(filelist)] + answers),
        )

    def test_wrong_format_then_right(self):
        tour = self._format_tour(LJ_DATA / "metadata.psv", ["csv", "psv"])
        state = tour.run()
        assert state["datasets"][0]["format"] == "psv"

    def test_festival_mis_sniff_recovers(self):
        tour = self._format_tour(LJ_DATA / "metadata.psv", ["festival", "psv"])
        state = tour.run()
        assert state["datasets"][0]["format"] == "psv"

    def test_empty_filelist_exits(self, tmp_path):
        empty = tmp_path / "empty.psv"
        empty.write_text("")
        tour = self._format_tour(empty, ["psv"])
        with pytest.raises(SystemExit, match="empty"):
            tour.run()

    def test_inconsistent_field_counts_rejected(self, tmp_path):
        ragged = tmp_path / "ragged.psv"
        ragged.write_text("basename|characters\na|b\nc|d|e\n")
        tour = self._format_tour(ragged, ["psv", "tsv", "psv"])
        # psv fails (ragged), tsv fails (no separator), there is no working
        # format for this file; feeding psv again fails too, so the step
        # keeps re-asking until the scripted answers run out.
        with pytest.raises(AssertionError, match="unscripted"):
            tour.run()


class TestColumnExhaustion:
    """Reference test_running_out_of_columns: once every column is assigned,
    the speaker/language questions are skipped automatically (completing the
    tour without scripted answers for them proves the skip)."""

    def test_two_column_headerless_filelist(self, tmp_path):
        filelist = tmp_path / "two.psv"
        filelist.write_text("f1|hello world\nf2|hi there\n")
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        answers = [
            "Two Col", "Test Runner", "info@everyvoice.ca", str(tmp_path),
            str(filelist), "yes", "psv",
            "no",          # first row is not a header
            "1",           # text column
            "0",           # basename column
            "characters", "none",
            # has-speaker and has-language both auto-skip (no columns left)
            "no",          # know-speaker: keep speaker_0
            "und",         # select language
            "keep", str(wavs),
            "no",          # validate wavs: continue despite missing audio
            "22050", "none", "twocol",
            "no", "skip", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert len(rows) == 2
        assert rows[0]["characters"] == "hello world"
        assert rows[0]["basename"] == "f1"
        assert rows[0]["speaker"] == "speaker_0"
        assert rows[0]["language"] == "und"

    def test_header_row_dropped_when_confirmed(self, tmp_path):
        filelist = tmp_path / "hdr.psv"
        filelist.write_text("id|sentence\nf1|hello\n")
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        answers = [
            "Hdr", "Test Runner", "info@everyvoice.ca", str(tmp_path),
            str(filelist), "yes", "psv",
            "yes",         # first row IS a header
            "1",           # 'sentence' is the text column
            "0",           # 'id' is the basename column
            "characters", "none",
            "no", "und", "keep", str(wavs), "no",
            "22050", "none", "hdr", "no", "skip", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        rows = state["datasets"][0]["rows"]
        assert len(rows) == 1  # header row consumed, not treated as data
        assert rows[0]["basename"] == "f1"
        assert rows[0]["characters"] == "hello"


class TestDerivedModelFlags:
    """Reference test_multilingual_multispeaker_true_config /
    _false_config: the written model configs derive multilingual and
    multispeaker from the actual filelist contents."""

    def test_true_when_columns_vary(self, tmp_path):
        filelist = tmp_path / "multi.psv"
        filelist.write_text(
            "basename|characters|speaker|language\n"
            "f1|hello|spk1|eng\n"
            "f2|bonjour|spk2|fra\n"
        )
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        answers = [
            "Multi", "Test Runner", "info@everyvoice.ca", str(tmp_path),
            str(filelist), "yes", "psv", "characters", "none",
            "yes",   # has speaker column (auto-picks 'speaker')
            "yes",   # has language column (auto-picks 'language')
            "keep", str(wavs), "no",
            "22050", "none", "multi",
            "no",
            "skip", "skip",   # one OOD question per language (eng, fra)
            "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        config_dir = state["project_dir"] / "config"
        fs2 = yaml.safe_load(
            (config_dir / "everyvoice-text-to-spec.yaml").read_text()
        )
        assert fs2["model"]["multilingual"] is True
        assert fs2["model"]["multispeaker"] is True
        e2e = yaml.safe_load(
            (config_dir / "everyvoice-text-to-wav.yaml").read_text()
        )
        assert e2e["model"]["multilingual"] is True
        assert e2e["model"]["multispeaker"] is True

    def test_false_for_single_speaker_single_language(self, tmp_path):
        tour = get_main_wizard_tour(
            ask=scripted_ask(lj_answers(tmp_path) + closing_answers())
        )
        state = tour.run()
        config_dir = state["project_dir"] / "config"
        fs2 = yaml.safe_load(
            (config_dir / "everyvoice-text-to-spec.yaml").read_text()
        )
        assert fs2["model"]["multilingual"] is False
        assert fs2["model"]["multispeaker"] is False


class TestResumeEdgeCases:
    def test_replayed_invalid_answer_falls_back_to_live_prompt(self, tmp_path):
        # A saved session whose email answer no longer validates: the replay
        # consumes it, validation fails, and the user is re-asked live.
        session = tmp_path / "session.yaml"
        session.write_text(
            yaml.safe_dump({
                "tour": "everyvoice new-project",
                "version": "1.0",
                "responses": [
                    ["Name Step", "Resumed"],
                    ["Contact Name Step", "Test Runner"],
                    ["Contact Email Step", "not-an-email"],
                ],
            })
        )
        live = lj_answers(tmp_path)[2:]  # email onwards answered live
        tour = get_main_wizard_tour(
            ask=scripted_ask(live + closing_answers())
        )
        state = tour.run(resume_from=session)
        assert state["name"] == "Resumed"
        assert state["contact_email"] == "info@everyvoice.ca"

    def test_resume_with_surplus_responses_completes(self, tmp_path):
        # "Resume from the future": extra recorded answers beyond the tour's
        # questions are ignored rather than crashing.
        session = tmp_path / "session.yaml"
        responses = [["q", a] for a in lj_answers(tmp_path) + closing_answers()]
        responses += [["Phantom Step", "zzz"], ["Another", "yyy"]]
        session.write_text(
            yaml.safe_dump({
                "tour": "everyvoice new-project",
                "version": "1.0",
                "responses": responses,
            })
        )
        tour = get_main_wizard_tour(ask=scripted_ask([]))
        state = tour.run(resume_from=session)
        assert (state["project_dir"] / "config").is_dir()


class TestPortablePaths:
    """Written configs must stay valid when the project moves: paths the
    user gave relative to the wizard's cwd are rewritten relative to the
    config directory; absolute paths stay absolute (reference
    test_wizard_helpers.py:92-260)."""

    def _run(self, tmp_path, monkeypatch, wavs_answer):
        monkeypatch.chdir(tmp_path)
        (tmp_path / "wavs" / "Common-Voice").mkdir(parents=True)
        filelist = tmp_path / "fl.psv"
        filelist.write_text("basename|characters\nitem|hello\n")
        answers = [
            "Unittest", "Test Runner", "info@everyvoice.ca", ".",
            "fl.psv", "yes", "psv", "characters", "none",
            "no",            # know-speaker
            "und",           # select language
            "keep", wavs_answer,
            "no",            # validate wavs: continue despite missing audio
            "22050", "none", "cv",
            "no", "skip", "yaml",
        ]
        tour = get_main_wizard_tour(ask=scripted_ask(answers))
        state = tour.run()
        data = yaml.safe_load(
            (Path("Unittest") / "config" / "everyvoice-shared-data.yaml")
            .read_text()
        )
        return state, data

    def test_relative_wav_dir_rewritten_to_config_dir(self, tmp_path, monkeypatch):
        _, data = self._run(tmp_path, monkeypatch, "wavs/Common-Voice")
        assert data["source_data"][0]["data_dir"] == str(
            Path("../..") / "wavs" / "Common-Voice"
        )
        # Project-internal paths are always relative (relocatable project).
        assert data["save_dir"] == "../preprocessed"
        assert data["source_data"][0]["filelist"] == "../cv-filelist.psv"

    def test_absolute_wav_dir_stays_absolute(self, tmp_path, monkeypatch):
        wavs = tmp_path / "wavs" / "Common-Voice"
        _, data = self._run(tmp_path, monkeypatch, str(wavs))
        assert data["source_data"][0]["data_dir"] == str(wavs)

    def test_relocated_project_still_loads(self, tmp_path, monkeypatch):
        import shutil

        self._run(tmp_path, monkeypatch, "wavs/Common-Voice")
        moved = tmp_path / "elsewhere"
        moved.mkdir()
        shutil.move(str(tmp_path / "Unittest"), str(moved / "Unittest"))
        from everyvoice_tpu.models.fs2 import FastSpeech2Config

        config = FastSpeech2Config.load_config_from_path(
            moved / "Unittest" / "config" / "everyvoice-text-to-spec.yaml"
        )
        assert config.preprocessing.save_dir.is_absolute()
        assert str(config.preprocessing.save_dir).startswith(str(moved))
        # Every relative path field must resolve against the config file's
        # own directory, not the process cwd (a bare PossiblyRelativePath
        # once silently skipped resolution when pydantic classified its
        # validator as no-info — caught by the e2e regression harness).
        for ds in config.preprocessing.source_data:
            assert ds.filelist.is_absolute()
            assert str(ds.filelist).startswith(str(moved))
            assert ds.filelist.exists()
            assert ds.data_dir.is_absolute()
        assert config.training.training_filelist.is_absolute()
        assert str(config.training.training_filelist).startswith(str(moved))

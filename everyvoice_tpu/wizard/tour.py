"""Wizard engine: a tree of reversible question steps
(parity: everyvoice/wizard/tour.py:83-505 — Step with
prompt/sanitize/validate/effect, Tour with depth-first traversal, Ctrl-C
menu, and YAML save/resume of [name, response] pairs).

Prompting is routed through an injectable `ask` callable so tests can script
answers non-interactively (the reference uses QuestionaryStub/
SimpleTermMenuStub for the same purpose, tests/stubs.py:161-349).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, List, Optional

from everyvoice_tpu.logger import logger

MAX_VALIDATION_FAILURES = 20


class StepError(Exception):
    pass


class Step:
    """One question: prompt → sanitize → validate → effect."""

    DEFAULT_NAME = "step"

    def __init__(
        self,
        name: Optional[str] = None,
        prompt_text: str = "",
        default: Any = None,
        parent: Optional["Step"] = None,
    ):
        self.name = name or self.DEFAULT_NAME
        self.prompt_text = prompt_text
        self.default = default
        self.response: Any = None
        self.completed = False
        self.children: List[Step] = []
        self.parent = parent
        if parent is not None:
            parent.children.append(self)
        self.state: dict = {}
        self.tour: Optional["Tour"] = None

    # -- overridables -----------------------------------------------------
    def prompt(self) -> Any:
        assert self.tour is not None
        return self.tour.ask(self.prompt_text, default=self.default, step=self)

    def sanitize_input(self, response: Any) -> Any:
        return response

    def validate(self, response: Any) -> bool:
        return True

    def effect(self) -> None:
        """Runs after a valid response is recorded."""

    def looks_like_choice(self) -> Optional[list]:
        """Return a list of choices if this is a menu step."""
        return None

    # -- mechanics ----------------------------------------------------------
    def run(self) -> None:
        assert self.tour is not None
        failures = 0
        while True:
            raw = self.prompt()
            response = self.sanitize_input(raw)
            if self.validate(response):
                self.response = response
                self.completed = True
                self.tour.record(self)
                self.effect()
                return
            failures += 1
            logger.warning(f"Invalid response for {self.name}: {raw!r}")
            if failures >= MAX_VALIDATION_FAILURES:
                raise StepError(
                    f"Step {self.name} failed validation "
                    f"{MAX_VALIDATION_FAILURES} times; aborting."
                )

    def descendants(self) -> list:
        out = []
        for child in self.children:
            out.append(child)
            out.extend(child.descendants())
        return out


class RootStep(Step):
    DEFAULT_NAME = "Root"

    def run(self) -> None:
        self.completed = True


def interactive_ask(prompt_text: str, default=None, step: Optional[Step] = None):
    choices = step.looks_like_choice() if step is not None else None
    if choices:
        print(prompt_text)
        for i, choice in enumerate(choices):
            print(f"  [{i}] {choice}")
        while True:
            raw = input(f"Choose 0-{len(choices) - 1}: ").strip()
            if raw == "" and default is not None:
                return default
            try:
                return choices[int(raw)]
            except (ValueError, IndexError):
                print("Please enter a valid number.")
    suffix = f" [{default}]" if default not in (None, "") else ""
    raw = input(f"{prompt_text}{suffix}: ")
    if raw == "" and default is not None:
        return default
    return raw


class Tour:
    def __init__(
        self,
        name: str,
        steps: List[Step],
        state: Optional[dict] = None,
        ask: Callable = interactive_ask,
    ):
        self.name = name
        self.state = state if state is not None else {}
        self.ask = ask
        self.trace: list = []  # [(name, response)] for save/resume
        self.root = RootStep()
        self.root.tour = self
        self.root.state = self.state
        for step in steps:
            self.add_step(step)

    def add_step(self, step: Step, parent: Optional[Step] = None) -> None:
        parent = parent or self.root
        step.parent = parent
        if step not in parent.children:
            parent.children.append(step)
        self._adopt(step)

    def add_steps_right_after(self, steps: List[Step], after: Step) -> None:
        """Insert steps as the next siblings of `after` (used by dataset
        subtours and the 'more datasets' loop)."""
        parent = after.parent or self.root
        idx = parent.children.index(after) + 1
        for offset, step in enumerate(steps):
            step.parent = parent
            parent.children.insert(idx + offset, step)
            self._adopt(step)

    def _adopt(self, step: Step) -> None:
        step.tour = self
        step.state = self.state
        for child in step.descendants():
            child.tour = self
            child.state = self.state

    def record(self, step: Step) -> None:
        self.trace.append([step.name, step.response])

    # -- persistence --------------------------------------------------------
    def save_progress(self, path: Path | str) -> None:
        import yaml

        data = {"tour": self.name, "version": "1.0", "responses": self.trace}
        Path(path).write_text(
            yaml.safe_dump(data, allow_unicode=True), encoding="utf8"
        )

    @staticmethod
    def load_progress(path: Path | str) -> list:
        import yaml

        data = yaml.safe_load(Path(path).read_text(encoding="utf8"))
        if not isinstance(data, dict) or "responses" not in data:
            raise StepError(f"{path} is not a saved wizard session")
        return data["responses"]

    # -- traversal ------------------------------------------------------------
    def run(self, resume_from: Optional[Path] = None) -> dict:
        scripted: list = []
        if resume_from is not None:
            scripted = self.load_progress(resume_from)
        replay = {i: resp for i, (_, resp) in enumerate(scripted)}
        count = 0
        original_ask = self.ask

        def replaying_ask(prompt_text, default=None, step=None):
            nonlocal count
            if count in replay:
                response = replay[count]
                count += 1
                return response
            count += 1
            return original_ask(prompt_text, default=default, step=step)

        self.ask = replaying_ask
        try:
            self._run_subtree(self.root)
        except KeyboardInterrupt:
            save_path = Path(f"{self.name.replace(' ', '-')}-progress.yaml")
            self.save_progress(save_path)
            logger.info(f"Wizard interrupted; progress saved to {save_path}")
            raise
        finally:
            self.ask = original_ask
        return self.state

    def _run_subtree(self, node: Step) -> None:
        # Children may grow while we iterate (subtour insertion), so index
        # manually instead of iterating the list object.
        i = 0
        node.run()
        while i < len(node.children):
            child = node.children[i]
            self._run_subtree(child)
            i += 1

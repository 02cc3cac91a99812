"""The main new-project wizard tour
(parity: everyvoice/wizard/main_tour.py:13)."""

from __future__ import annotations

from everyvoice_tpu.wizard.steps import (
    ContactEmailStep,
    OODDataStep,
    ContactNameStep,
    MoreDatasetsStep,
    NameStep,
    OutputPathStep,
    get_dataset_steps,
)
from everyvoice_tpu.wizard.tour import Tour, interactive_ask


def get_main_wizard_tour(ask=interactive_ask) -> Tour:
    steps = [
        NameStep(),
        ContactNameStep(),
        ContactEmailStep(),
        OutputPathStep(),
        *get_dataset_steps(0),
        OODDataStep(),
        MoreDatasetsStep(),
    ]
    return Tour("EveryVoice TPU new-project wizard", steps, ask=ask)

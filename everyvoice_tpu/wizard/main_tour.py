"""The main new-project wizard tour
(parity: everyvoice/wizard/main_tour.py:13). The OOD and config-format
steps are inserted dynamically by MoreDatasetsStep when the user is done
adding datasets, mirroring the reference's flow
(wizard/basic.py:828-891)."""

from __future__ import annotations

from everyvoice_tpu.wizard.steps import (
    ContactEmailStep,
    ContactNameStep,
    MoreDatasetsStep,
    NameStep,
    OutputPathStep,
    get_dataset_steps,
)
from everyvoice_tpu.wizard.tour import Tour, interactive_ask


def get_main_wizard_tour(
    ask=interactive_ask, trace: bool = False, debug_state: bool = False
) -> Tour:
    steps = [
        NameStep(),
        ContactNameStep(),
        ContactEmailStep(),
        OutputPathStep(),
        *get_dataset_steps(0),
        MoreDatasetsStep(),
    ]
    return Tour(
        "EveryVoice TPU new-project wizard",
        steps,
        ask=ask,
        trace=trace,
        debug_state=debug_state,
    )

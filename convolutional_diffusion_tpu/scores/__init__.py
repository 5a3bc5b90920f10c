"""Analytic (ideal) score machines — the paper's closed-form denoisers.

Class names mirror the reference (`src/utils/idealscore.py`) so users can
switch frameworks without relearning the API; the implementations are
TPU-native (MXU matmul banks + online softmax scans, see each module)."""

from .bbels import LocalEquivBordersScoreModule
from .common import SoftmaxState, init_state, merge_states, update_state
from .els import LocalEquivScoreModule
from .ideal import IdealScoreModule
from .local import LocalScoreModule
from .machine import ScheduledScoreMachine

__all__ = [
    "IdealScoreModule",
    "LocalScoreModule",
    "LocalEquivScoreModule",
    "LocalEquivBordersScoreModule",
    "ScheduledScoreMachine",
    "SoftmaxState",
    "init_state",
    "update_state",
    "merge_states",
]

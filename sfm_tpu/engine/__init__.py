"""Engine: the jitted SLAM state machine (CSfM equivalent, SURVEY.md §2.1).

init/tracking/mapping/relocalization as pure transitions over one state
pytree, dispatched with lax.switch inside a single jitted step."""

from .state import (SfMState, StepMetrics, CameraParams, init_state,
                    make_frame, NOT_INITIALIZED, RUNNING, LOST)
from .step import build_step, SfMEngine
from .bootstrap import bootstrap_step
from .tracking import tracking_step
from .mapping import mapping_pass
from .reloc import reloc_step

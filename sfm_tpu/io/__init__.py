"""Host-side I/O: frame sources, point-cloud export (native C++ backend),
engine-state checkpointing."""

from .ply import PointCloud, read_ply
from .video import (FrameSource, ImageDirSource, NpyStackSource, Y4MSource,
                    open_source, to_gray)
from .checkpoint import save_state, load_state

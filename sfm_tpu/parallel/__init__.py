"""Parallel & distributed layer (all net-new relative to the single-threaded
reference — SURVEY.md §2.14): vmapped multi-scan data parallelism, and
landmark-sharded distributed bundle adjustment with psum-reduced Schur
systems over the device mesh."""

from .multiscan import (init_batched_state, build_batched_step,
                        build_sharded_step, shard_batched_state)
from .dist_ba import partition_observations, build_dist_ba
from .dist_large_ba import partition_tables, build_dist_large_ba
from .hosts import initialize_hosts, make_scan_map_mesh

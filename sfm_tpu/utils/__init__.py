"""Utilities: profiling/tracing hooks and metrics aggregation."""

from .profiling import (PhaseTimer, device_trace, summarize_metrics,
                        write_metrics_jsonl)

from .joins import stream_static_enrich, stream_stream_interval_join
from .lake import LakeTable, write_stream_to_lake
from .orchestrator import MetricsListener, StreamOrchestrator, observe_counters
from .rollup import RollupTable, write_stream_to_rollup
from .sinks import write_console, write_kafka, write_memory
from .stateful import debounce, sessionize, sessionize_batch_oracle

__all__ = [
    "LakeTable",
    "MetricsListener",
    "RollupTable",
    "StreamOrchestrator",
    "debounce",
    "observe_counters",
    "sessionize",
    "sessionize_batch_oracle",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "write_console",
    "write_kafka",
    "write_memory",
    "write_stream_to_lake",
    "write_stream_to_rollup",
]

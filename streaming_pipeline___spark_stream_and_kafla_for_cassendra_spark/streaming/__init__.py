from .lake import LakeTable, write_stream_to_lake
from .orchestrator import StreamOrchestrator
from .sinks import write_console, write_kafka, write_memory
from .stateful import sessionize, sessionize_batch_oracle

__all__ = [
    "LakeTable",
    "StreamOrchestrator",
    "sessionize",
    "sessionize_batch_oracle",
    "write_console",
    "write_kafka",
    "write_memory",
    "write_stream_to_lake",
]

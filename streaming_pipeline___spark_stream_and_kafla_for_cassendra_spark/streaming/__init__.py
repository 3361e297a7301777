from .sinks import write_console, write_kafka, write_memory
from .lake import LakeTable, write_stream_to_lake
from .orchestrator import StreamOrchestrator

__all__ = [
    "LakeTable",
    "StreamOrchestrator",
    "write_console",
    "write_kafka",
    "write_memory",
    "write_stream_to_lake",
]

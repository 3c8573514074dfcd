"""ray-ordered-stream: a Ray-Data-native ordered-event streaming engine.

From-scratch re-expression of GoogleCloudPlatform/dataflow-ordered-processing
(Apache Beam's OrderedEventProcessor demo) on ray.data.Dataset pipelines.
See SURVEY.md for the structural analysis and the reference citations.

Heavy modules (ordered/epochs pull in ray) are intentionally NOT imported
here; import them directly:

    from ray_ordered_stream.ordered import ordered_process, OrderedProcessor
    from ray_ordered_stream.epochs import run_stream, run_stream_continuous
    from ray_ordered_stream.book import OrderBookBuilder, BookState
"""

from .schema import ORDERED_OUTPUT_SCHEMA, STATUS_SCHEMA, TRANSCRIPT_SCHEMA
from .state import OrderedConfig, OrderedPartitionState
from .userstate import UserState

__all__ = [
    "ORDERED_OUTPUT_SCHEMA",
    "STATUS_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "OrderedConfig",
    "OrderedPartitionState",
    "UserState",
]

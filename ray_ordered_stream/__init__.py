"""ray-ordered-stream: a Ray-Data-native ordered-event streaming engine.

From-scratch re-expression of GoogleCloudPlatform/dataflow-ordered-processing
(Apache Beam's OrderedEventProcessor demo) on ray.data.Dataset pipelines.
See SURVEY.md for the structural analysis and the reference citations.
"""

from .schema import ORDERED_OUTPUT_SCHEMA, STATUS_SCHEMA, TRANSCRIPT_SCHEMA
from .state import OrderedConfig, OrderedPartitionState

__all__ = [
    "ORDERED_OUTPUT_SCHEMA",
    "STATUS_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "OrderedConfig",
    "OrderedPartitionState",
]

"""pyfads — a PySpark-native rebuild of the FADS data-stream k-anonymization
engine (reference: augustinkrause/FADS-Flink).

The reference is a Flink 1.14 DataStream job; this package re-expresses its
pipeline and the relational primitives inside its stateful Generalizer
(SURVEY.md §2) as idiomatic Spark DataFrame / Structured Streaming code,
plus the large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing).
"""

from pyfads.config import FADSConfig
from pyfads.fads_batch import fads_generalize, fads_generalize_partitioned
from pyfads.fads_core import FADSState

__all__ = [
    "FADSConfig",
    "FADSState",
    "fads_generalize",
    "fads_generalize_partitioned",
]

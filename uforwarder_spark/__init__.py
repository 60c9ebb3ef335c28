"""PySpark-native engine with uber/uForwarder's data-processing semantics.

Importing this package registers every operator into
``uforwarder_spark.registry.QUERIES`` / ``ORACLES``.
"""

from . import registry  # noqa: F401
from .functions import multimodal, text  # noqa: F401
from .operators import controller, dedup, pipeline, similarity, skew  # noqa: F401
from .plans import relational  # noqa: F401
from .sources import bucketing, readers  # noqa: F401
from .streaming import pipelines  # noqa: F401

__all__ = ["registry"]

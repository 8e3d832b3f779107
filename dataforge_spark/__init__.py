"""dataforge_spark — a PySpark-native data-cleaning & analytics engine.

Re-expresses the capabilities of the reference pipeline
(Wayn-Git/DataForge, studied read-only at /root/reference/) Spark-first:
declarative DataFrame transformations, Catalyst optimization, and
scale-oriented extensions (dedup, similarity search, text analysis,
streaming) for 100 TB-class training-data pipelines.
"""

from .pipeline import CleaningPipeline, validate_operations  # noqa: F401
from .profile import dataset_info  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"

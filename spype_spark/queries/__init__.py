"""Query-contract modules (SURVEY.md §2.B).

Importing this package imports every query module, which registers all
query contracts into :data:`spype_spark.registry.REGISTRY` via the
``@query`` decorator.
"""

from spype_spark.registry import REGISTRY

# Import order mirrors SURVEY.md §2.B section order. Each import
# registers its queries as a side effect.
from spype_spark.queries import scans  # noqa: F401
from spype_spark.queries import project_filter  # noqa: F401
from spype_spark.queries import joins  # noqa: F401
from spype_spark.queries import aggregates  # noqa: F401

for _mod in ("windows", "sorts_setops", "scalars", "llm", "streaming_batch",
             "udx", "pipe_demos"):
    try:  # modules land incrementally during the build
        __import__(f"spype_spark.queries.{_mod}")
    except ImportError:
        pass

__all__ = ["REGISTRY"]

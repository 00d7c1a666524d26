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

from spype_spark.queries import windows  # noqa: F401
from spype_spark.queries import sorts_setops  # noqa: F401
from spype_spark.queries import scalars  # noqa: F401
from spype_spark.queries import llm  # noqa: F401
from spype_spark.queries import llm_extra  # noqa: F401
from spype_spark.queries import streaming_batch  # noqa: F401
from spype_spark.queries import udx  # noqa: F401
from spype_spark.queries import pipe_demos  # noqa: F401
from spype_spark.queries import multimodal  # noqa: F401
from spype_spark.queries import sources_sinks  # noqa: F401
from spype_spark.queries import pivots  # noqa: F401
from spype_spark.queries import subqueries  # noqa: F401
from spype_spark.queries import rollup_materialized  # noqa: F401
from spype_spark.queries import skew_demo  # noqa: F401

__all__ = ["REGISTRY"]

"""Declared operator inventory (SURVEY.md §2B).

Importing this package imports every query module, which registers
each query + oracle with :mod:`sparkit_learn_spark.registry`.
"""

from . import aggregations  # noqa: F401
from . import aggregations2  # noqa: F401
from . import analytics  # noqa: F401
from . import joins  # noqa: F401
from . import llm_pipeline  # noqa: F401
from . import llm_pipeline2  # noqa: F401
from . import llm_pipeline3  # noqa: F401
from . import llm_pipeline4  # noqa: F401
from . import llm_pipeline5  # noqa: F401
from . import llm_pipeline6  # noqa: F401
from . import llm_pipeline7  # noqa: F401
from . import ml_mllib  # noqa: F401
from . import multimodal_q  # noqa: F401
from . import ml_stats  # noqa: F401
from . import ml_text  # noqa: F401
from . import projections  # noqa: F401
from . import semistructured  # noqa: F401
from . import scalar_funcs  # noqa: F401
from . import scans  # noqa: F401
from . import sorts_setops  # noqa: F401
from . import streaming_batch  # noqa: F401
from . import subqueries  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch2  # noqa: F401
from . import udfs  # noqa: F401
from . import windows  # noqa: F401

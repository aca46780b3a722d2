"""Reusable column-expression builders (JVM-side, no UDFs).

The modern equivalent of the reference's per-block numpy helpers
[ref: splearn/rdd.py ArrayRDD math · C:H]: vector math and text
normalization expressed as Catalyst higher-order functions so they
stay inside whole-stage codegen.
"""

from .text import normalized_text, shingles, tokens  # noqa: F401
from .vector import cosine_sim, dot, l2_norm  # noqa: F401

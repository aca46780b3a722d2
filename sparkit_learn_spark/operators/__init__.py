"""Composable DataFrame→DataFrame operators.

Operators the engine adds beyond single-query expressions — each is a
plain function over DataFrames so it can run on any input (registered
fixture queries AND synthetic pytest data).
"""

from .dedup import exact_dedup, minhash_candidate_pairs  # noqa: F401
from .similarity import ann_lsh_neighbors, cosine_topk  # noqa: F401

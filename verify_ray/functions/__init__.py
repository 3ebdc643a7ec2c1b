"""Function library: the per-batch vectorized functions usable outside
full pipelines (each is a plain ``pa.Table -> pa.Table`` transform
suitable for ``ds.map_batches(fn, batch_format="pyarrow")``).

Re-exported from their home modules so users have one flat namespace;
the rule-registration extension surface lives in ``verify_ray.extend``.
"""

from ..pipelines.text import (  # noqa: F401
    fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)
from ..pipelines.multimodal import to_payload_batch  # noqa: F401
from ..pipelines.dedup import simhash_batch  # noqa: F401
from ..extend import register_rule, registered_rules  # noqa: F401

__all__ = [
    "token_count_batch",
    "quality_score_batch",
    "fingerprint_batch",
    "to_payload_batch",
    "simhash_batch",
    "register_rule",
    "registered_rules",
]

"""Composite operators: dedup, similarity search, multimodal, sinks.

Each module composes stock DataFrame operations into one named operator
with an explicit scale contract (what shuffles, what broadcasts, what is
bucketed) — see the module docstrings for the 100 TB design notes.
"""

from .dedup import (  # noqa: F401
    exact_dedup,
    hamming64,
    latest_by_key,
    minhash_signatures,
    near_dup_pairs,
    simhash_table,
)
from .multimodal import extract_features, media_frame  # noqa: F401
from .similarity import (  # noqa: F401
    near_dup_within_label,
    topk_bruteforce,
    topk_lsh,
)
from .sink import (  # noqa: F401
    read_partition,
    with_partition_columns,
    write_partitioned,
)

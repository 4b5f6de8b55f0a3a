"""Column-expression libraries (pure JVM-side, no shuffles, no UDFs).

``text``: tokenization, shingles, language-ID, quality ratios,
fingerprints. ``vectors``: dot/norm/cosine/unit + hyperplane signatures
over ``array<float>`` embeddings.
"""

from .text import (  # noqa: F401
    alpha_ratio,
    fingerprint,
    lang_guess,
    rolling_hash,
    token_count,
    tokens,
    word_shingles,
)
from .vectors import cosine, dot, l2_norm, to_double, unit  # noqa: F401

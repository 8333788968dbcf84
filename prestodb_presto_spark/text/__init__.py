"""Text-pipeline operator library: dedup, fingerprinting, language-ID,
quality scoring, tokenization (north-star module; no reference
counterpart beyond word_stem — operator/scalar/WordStemFunction.java).
"""

from prestodb_presto_spark.text.minhash import (
    minhash_signatures,
    lsh_candidate_pairs,
    verified_near_dup_pairs,
)
from prestodb_presto_spark.text.analysis import (
    shingles3,
    token_array,
    with_simhash64,
)

__all__ = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "verified_near_dup_pairs",
    "shingles3",
    "token_array",
    "with_simhash64",
]

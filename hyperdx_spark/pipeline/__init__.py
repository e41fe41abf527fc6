"""Large-scale training-data pipeline operators.

Beyond the reference's own query surface: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding cosine — batch and incremental against a
persisted bucketed store), similarity search (brute-force and LSH/IVF-bucketed
ANN), text analysis (language-ID, quality scoring, token counting,
fingerprinting, the Gopher repetition family), deterministic sampling /
train-mix curation, sequence packing (concat-and-chunk and whole-doc FFD),
quality/selection (trainable classifier, CCNet perplexity, DSIR, D4),
deterministic fixed-point k-means (farthest-first and k-means‖ inits),
Unicode normalization, and multimodal column plumbing. All operators are
DataFrame-native and designed for 100 TB inputs (inverted-index joins instead
of pairwise cross joins, banding instead of all-pairs, broadcast for small
sides).
"""

from hyperdx_spark.pipeline import (  # noqa: F401
    bpe,
    clustering,
    codecs,
    dedup,
    dsir,
    incremental,
    multimodal,
    packing,
    perplexity,
    quality,
    sampling,
    similarity,
    text,
    textnorm,
    urls,
)

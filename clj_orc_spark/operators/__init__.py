"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the large-scale operations a 100 TB token pipeline
needs alongside the encode engine."""

from .dedup import (  # noqa: F401
    duplicate_clusters,
    exact_dedup,
    minhash_lsh,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    build_ivf_index,
    cosine_near_dups,
    cosine_near_dups_lsh,
    ivf_probe_scan,
    ivf_topk,
    load_ivf_index,
    lsh_bucket_topk,
    train_ivf,
)
from .textstats import (  # noqa: F401
    fingerprint,
    language_id,
    quality_score,
    repetition_stats,
    token_count,
)

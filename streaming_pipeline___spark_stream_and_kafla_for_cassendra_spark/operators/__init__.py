from .aggregates import daily_activity_aggregation, hourly_activity_aggregation
from .dedup import (
    connected_components,
    connected_components_star,
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
    winnow_fingerprints,
)
from .enrich import enrich_activities, enrich_employees
from .graph import pagerank
from .joins import asof_join, range_join
from .multimodal import (
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synthetic_media_from_documents,
)
from .quality import validate
from .sampling import (
    deterministic_sample,
    mixture_reweight,
    stratified_sample,
    train_test_split,
)
from .scale import salted_join, save_bucketed
from .similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    label_centroids,
    lsh_topk,
)

__all__ = [
    "asof_join",
    "connected_components",
    "connected_components_star",
    "brute_force_topk",
    "daily_activity_aggregation",
    "dedup_exact",
    "deterministic_sample",
    "mixture_reweight",
    "embedding_near_dup_pairs",
    "enrich_activities",
    "enrich_employees",
    "extract_audio_features",
    "extract_image_features",
    "hourly_activity_aggregation",
    "ivf_topk",
    "label_centroids",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pagerank",
    "range_join",
    "resize_images",
    "salted_join",
    "sample_video_frames",
    "save_bucketed",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "stratified_sample",
    "synthetic_media_from_documents",
    "train_test_split",
    "validate",
    "winnow_fingerprints",
]

"""Distributed spatial operators (SURVEY.md §2.4–§2.6, §2.12–§2.14).

Convenience re-exports of the stable operator surface:
"""

from .sjoin import pip_join, sjoin  # noqa: F401
from .knn import nearest_feature  # noqa: F401
from .overlay import (  # noqa: F401
    attr_area,
    difference_join,
    dissolve,
    drop_duplicate_geometries,
    intersection_join,
    overlay,
    shared_area,
    union_join,
)
from .split import (  # noqa: F401
    cut_lines_fixed_length,
    cut_lines_recursive_midpoint,
    explode_multiparts,
    fishnet,
    image_tile_assignment,
    katana_split,
    linemerge,
    split_lines_at_points,
    split_lines_at_underlying_points,
    split_polygons,
)
from .proximity import (  # noqa: F401
    dwithin_join,
    hausdorff_pairs,
    pairwise_distance,
    snap_to_lines,
)
from .topo import dissolve_touching, has_overlap, overlapping_pairs  # noqa: F401
from .partition import partition_polygons  # noqa: F401
from .sampling import add_z_from_raster, sample_points_in_polygons  # noqa: F401
from .geocoding import all_addresses  # noqa: F401
from .topography import get_horizon  # noqa: F401
from .dedup import (  # noqa: F401
    cross_dup_spans,
    dedup_exact,
    dedup_lines,
    hamming_dedup_clusters,
    minhash_lsh_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash_near_dups,
    substring_dup_spans,
)
from .simsearch import (  # noqa: F401
    brute_force_topk,
    exact_topk_blocked,
    ivf_topk,
    lsh_topk,
    semdedup,
    semdedup_pairs,
)
from .tfidf import bm25_scores, tfidf_topk  # noqa: F401
from .lmscore import perplexity_scores, train_bigram_lm  # noqa: F401
from .tokenizer import bpe_tokenize, train_bpe, wordpiece_tokenize  # noqa: F401
from .textstats import (  # noqa: F401
    c4_filter,
    fingerprint,
    gopher_filter,
    lang_scores,
    quality_scores,
    repetition_stats,
)
from .pii import pii_redact, pii_stats  # noqa: F401
from .decontam import decontaminate  # noqa: F401
from .urlfilter import parse_urls, url_filter  # noqa: F401
from .packing import chunk_documents, pack_sequences  # noqa: F401
from .mixing import (  # noqa: F401
    deterministic_sample,
    mix_corpus,
    stratified_sample,
)
from .imgtrain import (  # noqa: F401
    aspect_bucket,
    image_filter,
    pack_images,
    vit_token_count,
)
from .profile import dataset_profile  # noqa: F401
from .pyramid import tile_pyramid  # noqa: F401
from . import network  # noqa: F401

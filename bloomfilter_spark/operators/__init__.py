from .cube import sketch_cube, sketch_grouping_sets, sketch_rollup
from .decontaminate import (build_reference_ngram_bloom,
                            contamination_scores, decontaminate,
                            word_ngram_hashes)
from .file_index import (build_file_bloom_index, build_file_minmax_index,
                         prune_files, prune_files_range, pruned_read,
                         pruned_read_range)
from .dedup import (dedup_exact, dedup_lines, duplicated_span_stats,
                    keep_first_n,
                    minhash_join, minhash_lsh_candidates,
                    minhash_lsh_dedup, minhash_lsh_join_candidates,
                    minhash_signatures,
                    ngram_jaccard_pairs, simhash_near_dups,
                    simhash_signatures)
from .graph import connected_components, dedup_near_duplicates
from .interval import (interval_join, session_window_agg, sessionize,
                       suggest_bucket_width)
from .layout import (bucketed_join, equidepth_bucket, has_exchange,
                     hash_bucket, kll_cut_points, sketch_range_bucket,
                     write_bucketed, write_range_partitioned,
                     zorder_key, zorder_write)
from .multimodal import decode_and_featurize, sample_video_frames
from .quantiles import (extreme_quantiles, filter_outliers,
                        grouped_extreme_quantiles,
                        grouped_quantiles, quantiles,
                        robust_bounds)
from .reconcile import ReconcileResult, reconcile, reconcile_digests
from .sampling import (grouped_weighted_sample, hash_sample,
                       sample_to_budget, sample_uniform_col,
                       split_train_holdout, stratified_sample,
                       weighted_reservoir_sample, weighted_sample_key)
from .search import (bm25_scores, bm25_topk, build_inverted_index,
                     tfidf_top_terms, tokenize_terms)
from .semijoin import (bloom_anti_join, bloom_prefilter, bloom_semi_join,
                       build_key_bloom, sharded_bloom_semi_join)
from .sharded import (build_sharded_bloom, merge_shard_tables, shard_geometry,
                      sharded_membership)
from .skewjoin import salted_join
from .similarity import (brute_force_topk, embedding_near_dups,
                         ivf_assign, ivf_topk, ivf_train,
                         hyperplane_signatures, lsh_ann_topk)
from .topk import (cms_heavy_change, cms_heavy_hitters, exact_top_k,
                   token_vocabulary, top_k_per_group)

__all__ = [
    "build_file_bloom_index", "prune_files", "pruned_read",
    "build_file_minmax_index", "prune_files_range", "pruned_read_range",
    "dedup_exact", "dedup_lines", "duplicated_span_stats",
    "minhash_signatures", "minhash_lsh_candidates",
    "minhash_lsh_dedup", "minhash_lsh_join_candidates", "minhash_join",
    "simhash_signatures", "simhash_near_dups",
    "ngram_jaccard_pairs", "quantiles", "grouped_quantiles",
    "robust_bounds", "filter_outliers", "extreme_quantiles",
    "grouped_extreme_quantiles",
    "bloom_semi_join", "bloom_anti_join", "bloom_prefilter", "build_key_bloom",
    "sharded_bloom_semi_join",
    "brute_force_topk", "lsh_ann_topk", "hyperplane_signatures",
    "embedding_near_dups", "exact_top_k", "top_k_per_group", "cms_heavy_hitters",
    "cms_heavy_change", "token_vocabulary",
    "build_sharded_bloom", "sharded_membership", "shard_geometry",
    "merge_shard_tables",
    "salted_join",
    "sketch_cube", "sketch_rollup", "sketch_grouping_sets",
    "decode_and_featurize", "sample_video_frames",
    "ivf_train", "ivf_assign", "ivf_topk",
    "keep_first_n",
    "hash_sample", "stratified_sample", "split_train_holdout",
    "sample_to_budget", "sample_uniform_col",
    "weighted_reservoir_sample", "weighted_sample_key",
    "grouped_weighted_sample",
    "decontaminate", "contamination_scores", "build_reference_ngram_bloom",
    "word_ngram_hashes",
    "connected_components", "dedup_near_duplicates",
    "zorder_key", "zorder_write", "hash_bucket", "equidepth_bucket",
    "kll_cut_points", "sketch_range_bucket", "write_range_partitioned",
    "write_bucketed", "bucketed_join", "has_exchange",
    "interval_join", "sessionize", "session_window_agg",
    "suggest_bucket_width",
    "build_inverted_index", "bm25_scores", "bm25_topk", "tokenize_terms",
    "tfidf_top_terms",
]

from .text import (alpha_ratio, char_entropy_scores, classifier_scores,
                   digit_ratio, lang_id, mean_word_length,
                   normalized_fingerprint, punct_ratio, quality_score,
                   redact_pii, repetition_ratios, token_count,
                   unigram_logprob_scores, word_token_count)

__all__ = ["token_count", "word_token_count", "alpha_ratio", "digit_ratio",
           "punct_ratio", "mean_word_length", "quality_score",
           "normalized_fingerprint", "lang_id", "redact_pii",
           "repetition_ratios", "classifier_scores",
           "unigram_logprob_scores", "char_entropy_scores"]

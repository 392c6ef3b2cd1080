from .text import (alpha_ratio, digit_ratio, lang_id, mean_word_length,
                   normalized_fingerprint, punct_ratio, quality_score,
                   token_count, word_token_count)

__all__ = ["token_count", "word_token_count", "alpha_ratio", "digit_ratio",
           "punct_ratio", "mean_word_length", "quality_score",
           "normalized_fingerprint", "lang_id"]

from .text import md5_int32, normalize_text, word_ngrams, words  # noqa: F401

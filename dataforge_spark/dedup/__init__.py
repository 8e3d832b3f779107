from . import drop, embedding, exact, minhash, ngram_jaccard, simhash  # noqa: F401

from . import drop, embedding, exact, minhash, ngram_jaccard, semantic, simhash  # noqa: F401

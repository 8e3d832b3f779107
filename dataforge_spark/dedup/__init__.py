from . import drop, embedding, exact, index, minhash, ngram_jaccard, semantic, simhash  # noqa: F401

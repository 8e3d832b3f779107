from . import embedding, exact, minhash, ngram_jaccard, simhash  # noqa: F401

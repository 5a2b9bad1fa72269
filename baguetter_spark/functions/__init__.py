"""Scalar/vectorized text functions: preprocessing pipeline, stopwords, stemmer."""

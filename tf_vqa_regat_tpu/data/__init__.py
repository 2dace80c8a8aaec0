"""Host data pipeline: tokenizer/dictionary, entry join, HDF5 region features,
static-shape batch packing with host->device prefetch, GloVe/TF-IDF embedding
init, and synthetic fixtures for tests/benchmarks."""

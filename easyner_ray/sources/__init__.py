"""Sources: Parquet transcript reader, synthetic deterministic corpus
generator (tests/bench fixtures), free-text and PubTator-style loaders."""

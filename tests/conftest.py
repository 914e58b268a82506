"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # make oracle_ref importable


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sample_texts() -> list[str]:
    """Every content class from the synthetic generator, many instances each."""
    from chinese_corpus_cleaning_ray.sources.transcripts import synthesize_transcripts

    table = synthesize_transcripts(2000, seed=7)
    return table.column("text").to_pylist()


@pytest.fixture(scope="session")
def wordlist() -> list[str]:
    from chinese_corpus_cleaning_ray.functions.wordlists import load_words

    return load_words()
